"""Bilevel fine-tune: nudity suppression (reference scripts/aptp/bilevel_finetune_nudity.py)."""
import sys, os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from unlearn_ft_tpu.utils.config import build_config


def main(argv=None):
    config = build_config(argv)
    from unlearn_ft_tpu.training.bilevel import NudityBilevelFineTuneTrainer

    NudityBilevelFineTuneTrainer(config).train()


if __name__ == "__main__":
    main()
