"""Bilevel fine-tune: style removal (reference scripts/aptp/bilevel_finetune.py)."""
import sys, os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from unlearn_ft_tpu.utils.config import build_config


def main(argv=None):
    config = build_config(argv)
    from unlearn_ft_tpu.training.bilevel import BilevelFineTuneTrainer

    BilevelFineTuneTrainer(config).train()


if __name__ == "__main__":
    main()
