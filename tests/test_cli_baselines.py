"""Offline end-to-end drives of the baseline CLI entry points
(scripts/baselines/*), mirroring how the reference's baseline scripts are
run from a fine-tuned checkpoint + a pretrained model root
(baselines/erasing/esd_diffusers.py, unified-concept-editing/train-scripts/
train_erase.py / train_debias.py). Everything is tiny and fully offline:
the SD root comes from tiny_assets (incl. a fabricated diffusers-format
VAE), the expert checkpoint is a tiny random-init U-Net saved through
CheckpointManager, and the debias loop's zero-shot classifier is a tiny
local CLIPModel dir."""
import importlib.util
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from tiny_assets import (  # noqa: E402
    make_tiny_clip_classifier,
    make_tiny_sd_root,
    make_tiny_vae,
)

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts", "baselines")


def _load_cli(name):
    spec = importlib.util.spec_from_file_location(
        f"cli_{name}", os.path.join(SCRIPTS, f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def cli_env(tmp_path_factory):
    from unlearn_ft_tpu.models import UNet2DConditionModel, UNetConfig, build_unet_spec
    from unlearn_ft_tpu.training.checkpoint import CheckpointManager, spec_to_json

    root = tmp_path_factory.mktemp("cli")
    sd_root = str(root / "sd_root")
    make_tiny_sd_root(sd_root)
    make_tiny_vae(sd_root)

    cfg = UNetConfig(
        sample_size=8,
        block_out_channels=(16, 16),
        layers_per_block=1,
        num_attention_heads=(2, 4),
        cross_attention_dim=32,  # == tiny CLIP hidden_size
        norm_num_groups=4,
        ff_gate_width=4,
        upcast_attention=False,
        down_block_types=("CrossAttnDownBlock2DHalfGated", "DownBlock2DHalfGated"),
        up_block_types=("UpBlock2DHalfGated", "CrossAttnUpBlock2DHalfGated"),
    )
    spec = build_unet_spec(cfg)
    unet = UNet2DConditionModel(spec)
    params = unet.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 16, 32)),
    )["params"]
    ck_root = str(root / "ckpts")
    CheckpointManager(ck_root).save(
        100, {"params": jax.tree.map(np.asarray, params), "step": 100},
        spec_json=spec_to_json(spec),
    )
    return {
        "sd_root": sd_root,
        "checkpoint_dir": os.path.join(ck_root, "checkpoint-100"),
        "root": str(root),
        "spec": spec,
    }


def test_export_vae_roundtrip(tmp_path):
    """export_vae_state_dict is the exact inverse of convert_vae."""
    from unlearn_ft_tpu.loading import load_vae_tower
    from unlearn_ft_tpu.models.vae import AutoencoderKL, VAEConfig

    kw = make_tiny_vae(str(tmp_path))
    vae, vae_params = load_vae_tower(str(tmp_path))
    assert vae.cfg == VAEConfig(**kw)
    ref = AutoencoderKL(VAEConfig(**kw))
    x = jnp.zeros((1, 16, 16, 3))
    init = ref.init(jax.random.PRNGKey(11), x, jax.random.PRNGKey(12))["params"]
    flat_a = jax.tree_util.tree_leaves_with_path(init)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(vae_params))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(flat_b[path]))


def test_uce_cli(cli_env, tmp_path):
    out = str(tmp_path / "uce.npz")
    _load_cli("uce").main([
        "--checkpoint_dir", cli_env["checkpoint_dir"],
        "--pretrained_root", cli_env["sd_root"],
        "--erase_concepts", "cat,dog",
        "--guided_concepts", ",",
        "--preserve_concepts", "tree",
        "--out", out,
    ])
    overlay = np.load(out)
    assert len(overlay.files) > 0
    assert all("attn2" in k and ("to_k" in k or "to_v" in k) for k in overlay.files)
    # the overlay loads back through the shared overlay reader
    from unlearn_ft_tpu.baselines.overlay import apply_erasure_overlay
    from unlearn_ft_tpu.loading import load_unet_from_checkpoint

    spec, _, params, _ = load_unet_from_checkpoint(cli_env["checkpoint_dir"])
    edited = apply_erasure_overlay(params, spec, out)
    changed = sum(
        0 if np.array_equal(a, b) else 1
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(edited))
    )
    assert changed == len(overlay.files)


def test_esd_cli(cli_env, tmp_path):
    out = str(tmp_path / "esd.npz")
    _load_cli("esd").main([
        "--checkpoint_dir", cli_env["checkpoint_dir"],
        "--pretrained_root", cli_env["sd_root"],
        "--erase_concept", "cat",
        "--train_method", "xattn",
        "--iterations", "2",
        "--ddim_steps", "3",
        "--out", out,
    ])
    overlay = np.load(out)
    assert len(overlay.files) > 0
    assert all("attn2" in k for k in overlay.files)  # xattn subset only


def test_uce_debias_cli(cli_env, tmp_path):
    clip_dir = str(tmp_path / "clip")
    make_tiny_clip_classifier(clip_dir)
    out = str(tmp_path / "debias.npz")
    _load_cli("uce_debias").main([
        "--checkpoint_dir", cli_env["checkpoint_dir"],
        "--pretrained_root", cli_env["sd_root"],
        "--concepts", "cat",
        "--attributes", "red,blue",
        "--max_iters", "1",
        "--num_samples", "2",
        "--num_inference_steps", "2",
        "--resolution", "16",
        "--clip_model", clip_dir,
        "--out", out,
    ])
    overlay = np.load(out)
    # one edit iteration ran (tiny random weights won't be balanced)
    assert len(overlay.files) > 0
    assert all("attn2" in k for k in overlay.files)
