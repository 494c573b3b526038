import os
import tempfile

import numpy as np

from unlearn_ft_tpu.utils.config import load_config

CFG_PATH = os.path.join(os.path.dirname(__file__), "..", "configs", "tests", "tiny_synthetic.yaml")


def test_sdxl_pruning_trainer_runs():
    from unlearn_ft_tpu.training.sdxl_pruner import SDXLPruningTrainer

    with tempfile.TemporaryDirectory() as tmp:
        cfg = load_config(CFG_PATH)
        cfg.training.logging.logging_dir = tmp
        cfg.merge({"seed": 43, "wandb_run_name": "t"})
        cfg.training.max_train_steps = 2
        cfg.training.checkpoint_steps = 0
        cfg.model.prediction_model.unet_down_blocks = [
            "DownBlock2DHalfGated", "CrossAttnDownBlock2DHalfGated",
        ]
        cfg.model.prediction_model.unet_up_blocks = [
            "CrossAttnUpBlock2DHalfGated", "UpBlock2DHalfGated",
        ]
        cfg.model.prediction_model.unet_config.merge({
            "transformer_layers_per_block": [1, 2],
            "addition_embed_type": "text_time",
            "addition_time_embed_dim": 8,
            "projection_class_embeddings_input_dim": 8 * 6 + 12,
        })
        t = SDXLPruningTrainer(cfg)
        t.train()
        import json

        with open(os.path.join(tmp, "t", "metrics.jsonl")) as f:
            rows = [json.loads(l) for l in f]
        assert rows and all(np.isfinite(r["loss"]) for r in rows)
        assert "resource_ratio" in rows[-1]
