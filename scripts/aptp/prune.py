"""APTP pruning: train hypernet + quantizer (reference UnetPruner stage)."""
import sys, os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from unlearn_ft_tpu.utils.config import build_config


def main(argv=None):
    config = build_config(argv)
    from unlearn_ft_tpu.training.pruner import PruningTrainer

    PruningTrainer(config).train()


if __name__ == "__main__":
    main()
