"""Fine-tune a pruned expert U-Net (reference scripts/aptp/finetune.py)."""
import sys, os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from unlearn_ft_tpu.utils.config import build_config


def main(argv=None):
    config = build_config(argv)
    from unlearn_ft_tpu.training.finetune import FineTuneTrainer, SingleArchFineTuneTrainer

    if config.get("pruning_type") == "single-expert":
        trainer = SingleArchFineTuneTrainer(config)
    else:
        assert config.get("pruning_ckpt_dir") or config.get_path(
            "model.prediction_model.random_pruning_ratio"
        ) or config.get_path("data.data_dir") == "synthetic", (
            "pruning_ckpt_dir (and expert_id) required for expert fine-tuning"
        )
        trainer = FineTuneTrainer(config)
    trainer.train()


if __name__ == "__main__":
    main()
