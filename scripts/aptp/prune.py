"""APTP pruning: train hypernet + quantizer (reference UnetPruner /
SDXLPruner / FluxPruner stages, trainer.py:759-2113).

Dispatches on `model.type` (sd | sdxl | flux), inferred from the config when
absent: a `model.prediction_model.flux_config` block selects the Flux
trainer; an SDXL `addition_embed_type: text_time` U-Net (or a
`text_encoder_2_config`) selects the SDXL trainer. The reference ships no
pruning CLI at all — this single entry point covers all three model
families.
"""
import sys, os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from unlearn_ft_tpu.utils.config import build_config, resolve_model_type


def main(argv=None):
    config = build_config(argv)
    mt = resolve_model_type(config)
    if mt == "flux":
        from unlearn_ft_tpu.training.flux_pruner import FluxPruningTrainer as Trainer
    elif mt == "sdxl":
        from unlearn_ft_tpu.training.sdxl_pruner import SDXLPruningTrainer as Trainer
    elif mt == "sd":
        from unlearn_ft_tpu.training.pruner import PruningTrainer as Trainer
    else:
        raise ValueError(f"unknown model.type {mt!r} (expected sd | sdxl | flux)")
    Trainer(config).train()


if __name__ == "__main__":
    main()
