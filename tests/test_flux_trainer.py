import os
import tempfile

import numpy as np

from unlearn_ft_tpu.utils.config import Config


def _flux_config(tmp):
    return Config.wrap({
        "seed": 43,
        "wandb_run_name": "t",
        "model": {
            "prediction_model": {
                "prediction_type": "epsilon",  # unused by flux path
                "flux_config": {
                    "in_channels": 8,
                    "num_layers": 2,
                    "num_single_layers": 2,
                    "attention_head_dim": 8,
                    "num_attention_heads": 2,
                    "joint_attention_dim": 16,
                    "pooled_projection_dim": 12,
                    "guidance_embeds": True,
                    "axes_dims_rope": [2, 4, 2],
                    "ff_gate_width": 4,
                },
                "guidance_scale": 3.5,
                "flow_shift": 3.0,
            },
            "hypernet": {"input_dim": 768},
            "quantizer": {"num_arch_vq_codebook_embeddings": 4},
        },
        "data": {
            "data_dir": "synthetic",
            "max_train_samples": 32,
            "flux_image_tokens": 16,
            "flux_text_tokens": 5,
            "dataloader": {"train_batch_size": 8},
        },
        "training": {
            "max_train_steps": 2,
            "log_steps": 1,
            "checkpoint_steps": 0,
            "validation_steps": 0,
            "losses": {
                "diffusion_loss": {"snr_gamma": None, "weight": 1.0},
                "contrastive_loss": {"weight": 1.0},
                "resource_loss": {"weight": 1.0, "pruning_target": 0.7},
            },
            "optim": {"hypernet_learning_rate": 1e-3, "lr_warmup_steps": 0},
            "logging": {"logging_dir": tmp, "report_to": "jsonl"},
        },
    })


def test_flux_pruning_trainer_runs():
    from unlearn_ft_tpu.training.flux_pruner import FluxPruningTrainer

    with tempfile.TemporaryDirectory() as tmp:
        cfg = _flux_config(tmp)
        # codebook observability (was a bare `pass` through round 2): the
        # similarity heatmap lands on disk and every expert logs a hard
        # resource ratio in (0, 1]
        cfg.training.validation_steps = 2
        t = FluxPruningTrainer(cfg)
        t.train()
        import glob
        import json

        with open(os.path.join(tmp, "t", "metrics.jsonl")) as f:
            rows = [json.loads(l) for l in f]
        assert rows and all(
            np.isfinite(r["loss"]) for r in rows if "loss" in r
        )
        assert any("resource_ratio" in r for r in rows)
        # flux validation losses (reference trainer.py:1093-1147 inherited)
        val_rows = [r for r in rows if "val_diff_loss" in r]
        assert val_rows and np.isfinite(val_rows[-1]["val_loss"])
        assert glob.glob(os.path.join(tmp, "t", "codebook_sim_*"))
        ratio_rows = [r for r in rows if any(
            k.startswith("expert_") and k.endswith("_resource_ratio") for k in r
        )]
        assert ratio_rows
        ratio_keys = [k for k in ratio_rows[-1] if k.startswith("expert_") and
                      k.endswith("_resource_ratio")]
        assert len(ratio_keys) == 4  # n_e experts
        assert all(0.0 < ratio_rows[-1][k] <= 1.0 + 1e-6 for k in ratio_keys)


def test_flux_pipeline_sampling():
    import jax
    import jax.numpy as jnp

    from unlearn_ft_tpu.models.flux import FluxConfig, GatedFluxTransformer2DModel, make_image_ids
    from unlearn_ft_tpu.pipelines import FluxPipeline
    from unlearn_ft_tpu.schedulers import FlowMatchSchedule

    cfg = FluxConfig(
        in_channels=8, num_layers=1, num_single_layers=1, attention_head_dim=8,
        num_attention_heads=2, joint_attention_dim=16, pooled_projection_dim=12,
        guidance_embeds=True, axes_dims_rope=(2, 4, 2), ff_gate_width=4,
    )
    model = GatedFluxTransformer2DModel(cfg)
    b, l_txt = 1, 5
    hidden = jnp.zeros((b, 16, cfg.in_channels))
    ctx = jnp.zeros((b, l_txt, 16))
    pooled = jnp.zeros((b, 12))
    img_ids = jnp.asarray(make_image_ids(8, 8, b))
    txt_ids = jnp.zeros((b, l_txt, 3))
    params = model.init(
        jax.random.PRNGKey(0), hidden, ctx, pooled, jnp.zeros((b,)), img_ids, txt_ids,
        jnp.zeros((b,)),
    )["params"]
    pipe = FluxPipeline(model, params, FlowMatchSchedule(shift=3.0))
    latents, idx = pipe(
        ctx, pooled, height=64, width=64, num_inference_steps=2, seed=0
    )
    assert latents.shape == (1, 8, 8, 2)
    assert np.isfinite(latents).all()


def test_flux_shard_frozen_matches_replicated():
    """parallel.shard_frozen (FSDP-sharded frozen tower, parallel.shard_params)
    is numerically equivalent to the replicated placement — XLA all-gathers
    the weights at their use sites. This is the full-scale Flux-dev
    enablement path (reference trainer.py:1596-2113)."""
    import json

    from unlearn_ft_tpu.training.flux_pruner import FluxPruningTrainer

    losses = {}
    for shard in (False, True):
        with tempfile.TemporaryDirectory() as tmp:
            cfg = _flux_config(tmp)
            cfg.training.max_train_steps = 1
            cfg.merge({"parallel": {"shard_frozen": shard}})
            t = FluxPruningTrainer(cfg)
            if shard:
                # the flag must actually shard some frozen leaves over dp
                import jax

                specs = [
                    getattr(x.sharding, "spec", None)
                    for x in jax.tree.leaves(t.frozen)
                ]
                assert any(
                    s is not None and any(e == "dp" for e in s) for s in specs
                ), "shard_frozen did not shard any frozen leaf"
            t.train()
            with open(os.path.join(tmp, "t", "metrics.jsonl")) as f:
                rows = [json.loads(l) for l in f]
            losses[shard] = [r["loss"] for r in rows if "loss" in r]
    np.testing.assert_allclose(losses[True], losses[False], rtol=2e-5, atol=2e-6)


def test_flux_pruner_loads_local_hf_transformer_dir():
    """A local HF diffusers Flux layout (transformer/config.json +
    diffusion_pytorch_model.safetensors) is consumed end-to-end: config comes
    from the dir, weights flow through convert_flux instead of random init
    (reference from_pretrained contract, trainer.py:1604-1729)."""
    import json

    import jax

    from unlearn_ft_tpu.models.flux import FluxConfig
    from unlearn_ft_tpu.training.flux_pruner import FluxPruningTrainer

    from torch_mirror import synth_flux_state_dict

    cfg_dict = dict(
        patch_size=1, in_channels=8, num_layers=2, num_single_layers=2,
        attention_head_dim=8, num_attention_heads=2, joint_attention_dim=16,
        pooled_projection_dim=12, guidance_embeds=True, axes_dims_rope=[2, 4, 2],
    )
    sd = synth_flux_state_dict(
        FluxConfig(**{k: tuple(v) if isinstance(v, list) else v
                      for k, v in cfg_dict.items()}),
        seed=3,
    )
    with tempfile.TemporaryDirectory() as root, tempfile.TemporaryDirectory() as tmp:
        tdir = os.path.join(root, "transformer")
        os.makedirs(tdir)
        with open(os.path.join(tdir, "config.json"), "w") as f:
            json.dump(cfg_dict, f)
        from safetensors.numpy import save_file

        save_file({k: np.asarray(v) for k, v in sd.items()},
                  os.path.join(tdir, "diffusion_pytorch_model.safetensors"))

        cfg = _flux_config(tmp)
        # only the gate width stays a yaml override; arch comes from the dir
        cfg.model.prediction_model.flux_config = {"ff_gate_width": 4}
        cfg.merge({"pretrained_model_name_or_path": root})
        t = FluxPruningTrainer(cfg)
        assert t.flux_cfg.num_layers == 2 and t.flux_cfg.guidance_embeds
        # loaded, not random: x_embedder kernel matches the converted torch
        # weight (torch Linear [out,in] -> flax kernel [in,out])
        got = np.asarray(
            jax.tree.leaves({"k": t.frozen["flux"]["x_embedder"]["kernel"]})[0]
        )
        np.testing.assert_allclose(got, np.asarray(sd["x_embedder.weight"]).T,
                                   atol=1e-6)
