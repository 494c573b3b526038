"""Numeric golden parity: convert_unet / convert_vae + the Flax NHWC
forwards vs an independent torch NCHW mirror (tests/torch_mirror.py).

Closes VERDICT r3 gap #2: the FID/CLIP-parity path flows entirely through
these converters (reference loading contract:
pdm/models/unet/unet_2d_conditional.py:2185-2495), so a single transposed
kernel or wrong group slice must fail a test, not silently destroy parity.
Tiny-but-real topologies: shortcuts, both proj_in variants, multi-layer
transformers, down/up samplers, and the SDXL text_time branch.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from unlearn_ft_tpu.models import (  # noqa: E402
    UNet2DConditionModel,
    UNetConfig,
    build_unet_spec,
)
from unlearn_ft_tpu.models.convert import convert_unet, convert_vae  # noqa: E402
from unlearn_ft_tpu.models.vae import AutoencoderKL, VAEConfig  # noqa: E402

from torch_mirror import (  # noqa: E402
    synth_unet_state_dict,
    synth_vae_state_dict,
    torch_unet_forward,
    torch_vae_decode,
    torch_vae_encode_moments,
)


def _tiny_cfg(**kw):
    base = dict(
        sample_size=8,
        block_out_channels=(32, 64),
        layers_per_block=2,
        num_attention_heads=(2, 4),
        cross_attention_dim=24,
        norm_num_groups=8,
        ff_gate_width=4,
        down_block_types=("CrossAttnDownBlock2DHalfGated", "DownBlock2DHalfGated"),
        up_block_types=("UpBlock2DHalfGated", "CrossAttnUpBlock2DHalfGated"),
    )
    base.update(kw)
    return UNetConfig(**base)


def _run_both(cfg, added=None, seed=0, atol=1e-4):
    spec = build_unet_spec(cfg)
    sd = synth_unet_state_dict(spec, seed=seed)
    rng = np.random.default_rng(seed + 100)
    b, lat = 2, cfg.sample_size
    sample = rng.standard_normal((b, lat, lat, cfg.in_channels)).astype(np.float32)
    context = rng.standard_normal((b, 5, cfg.cross_attention_dim)).astype(np.float32)
    timesteps = np.array([3.0, 977.0], np.float32)

    added_j = added_t = None
    if added is not None:
        added_j = {k: jnp.asarray(v) for k, v in added.items()}
        added_t = {k: torch.from_numpy(v) for k, v in added.items()}

    want = torch_unet_forward(
        sd, spec,
        torch.from_numpy(sample.transpose(0, 3, 1, 2)),
        torch.from_numpy(timesteps),
        torch.from_numpy(context),
        added_cond=added_t,
    ).numpy().transpose(0, 2, 3, 1)

    params = convert_unet(sd, spec)
    got = UNet2DConditionModel(spec, dtype=jnp.float32).apply(
        {"params": params},
        jnp.asarray(sample),
        jnp.asarray(timesteps),
        jnp.asarray(context),
        added_cond=added_j,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=atol)


def test_unet_matches_torch_mirror():
    _run_both(_tiny_cfg())


def test_unet_matches_torch_mirror_conv_proj():
    # SD-1.x style: 1x1-conv proj_in/proj_out instead of linear
    _run_both(_tiny_cfg(use_linear_projection=False), seed=1)


def test_unet_matches_torch_mirror_multilayer_transformer():
    # SDXL-style stacked BasicTransformerBlocks inside one Transformer2DModel
    _run_both(_tiny_cfg(transformer_layers_per_block=(1, 2)), seed=2)


def test_sdxl_unet_matches_torch_mirror():
    pooled_dim, add_t_dim = 16, 8
    cfg = _tiny_cfg(
        down_block_types=("DownBlock2DHalfGated", "CrossAttnDownBlock2DHalfGated"),
        up_block_types=("CrossAttnUpBlock2DHalfGated", "UpBlock2DHalfGated"),
        addition_embed_type="text_time",
        addition_time_embed_dim=add_t_dim,
        projection_class_embeddings_input_dim=pooled_dim + 6 * add_t_dim,
    )
    rng = np.random.default_rng(7)
    added = {
        "text_embeds": rng.standard_normal((2, pooled_dim)).astype(np.float32),
        "time_ids": np.tile(
            np.array([64, 64, 0, 0, 64, 64], np.float32)[None], (2, 1)
        ),
    }
    _run_both(cfg, added=added, seed=3)


def test_unet_converter_rejects_missing_keys():
    # the converter enumerates every key it needs: a truncated state dict
    # (e.g. from a wrong spec) must raise, not silently zero-fill
    cfg = _tiny_cfg()
    spec = build_unet_spec(cfg)
    sd = synth_unet_state_dict(spec, seed=0)
    del sd["mid_block.resnets.1.conv2.weight"]
    with pytest.raises(KeyError):
        convert_unet(sd, spec)


@pytest.fixture(scope="module")
def vae_pair():
    cfg = VAEConfig(
        block_out_channels=(16, 32), layers_per_block=2, norm_num_groups=4,
        latent_channels=4,
    )
    return cfg, synth_vae_state_dict(cfg, seed=5)


def test_vae_encoder_matches_torch_mirror(vae_pair):
    cfg, sd = vae_pair
    rng = np.random.default_rng(8)
    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    want_mean, want_logvar = torch_vae_encode_moments(
        sd, cfg, torch.from_numpy(x.transpose(0, 3, 1, 2))
    )
    params = convert_vae(sd, cfg.block_out_channels, cfg.layers_per_block)
    vae = AutoencoderKL(cfg, dtype=jnp.float32)
    got_mean, got_logvar = vae.apply(
        {"params": params}, jnp.asarray(x), method=vae.encode_moments
    )
    np.testing.assert_allclose(
        np.asarray(got_mean), want_mean.numpy().transpose(0, 2, 3, 1), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_logvar), want_logvar.numpy().transpose(0, 2, 3, 1), atol=1e-4
    )


def test_vae_decoder_matches_torch_mirror(vae_pair):
    cfg, sd = vae_pair
    rng = np.random.default_rng(9)
    z = rng.standard_normal((2, 4, 4, cfg.latent_channels)).astype(np.float32)
    want = torch_vae_decode(
        sd, cfg, torch.from_numpy(z.transpose(0, 3, 1, 2)),
        scaling_factor=cfg.scaling_factor, shift_factor=cfg.shift_factor,
    ).numpy().transpose(0, 2, 3, 1)
    params = convert_vae(sd, cfg.block_out_channels, cfg.layers_per_block)
    vae = AutoencoderKL(cfg, dtype=jnp.float32)
    got = vae.apply({"params": params}, jnp.asarray(z), method=vae.decode)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


# ---------------------------------------------------------------------------
# Flux
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("guidance_embeds", [False, True])
def test_flux_matches_torch_mirror(guidance_embeds):
    """convert_flux + the Flax MMDiT forward vs the independent torch mirror
    (diffusers FluxTransformer2DModel semantics; reference loads real weights
    through this naming at pdm/training/trainer.py:1604-1729). Covers joint +
    single blocks, RoPE over (t,y,x) axes, AdaLN-Zero chunk order, RMS q/k
    norms, and the guidance embedder (Flux-dev)."""
    from unlearn_ft_tpu.models.convert import convert_flux
    from unlearn_ft_tpu.models.flux import (
        FluxConfig,
        GatedFluxTransformer2DModel,
        make_image_ids,
    )

    from torch_mirror import synth_flux_state_dict, torch_flux_forward

    cfg = FluxConfig(
        patch_size=1, in_channels=8, num_layers=2, num_single_layers=2,
        attention_head_dim=8, num_attention_heads=3, joint_attention_dim=24,
        pooled_projection_dim=12, axes_dims_rope=(2, 2, 4), ff_gate_width=4,
        guidance_embeds=guidance_embeds,
    )
    sd = synth_flux_state_dict(cfg, seed=7)
    params = convert_flux(sd, cfg)

    rng = np.random.default_rng(11)
    b, l_txt, hh, ww = 2, 5, 8, 8
    l_img = (hh // 2) * (ww // 2)
    hidden = rng.standard_normal((b, l_img, cfg.in_channels)).astype(np.float32)
    enc = rng.standard_normal((b, l_txt, cfg.joint_attention_dim)).astype(np.float32)
    pooled = rng.standard_normal((b, cfg.pooled_projection_dim)).astype(np.float32)
    t = np.array([0.25, 0.9], np.float32)
    guidance = np.array([3.5, 3.5], np.float32) if guidance_embeds else None
    img_ids = make_image_ids(hh, ww, b)
    txt_ids = np.zeros((b, l_txt, 3), np.float32)

    model = GatedFluxTransformer2DModel(cfg)
    out_j = model.apply(
        {"params": params}, jnp.asarray(hidden), jnp.asarray(enc),
        jnp.asarray(pooled), jnp.asarray(t), jnp.asarray(img_ids),
        jnp.asarray(txt_ids),
        jnp.asarray(guidance) if guidance is not None else None,
    )

    with torch.no_grad():
        out_t = torch_flux_forward(
            sd, cfg, torch.from_numpy(hidden), torch.from_numpy(enc),
            torch.from_numpy(pooled), torch.from_numpy(t),
            torch.from_numpy(img_ids), torch.from_numpy(txt_ids),
            torch.from_numpy(guidance) if guidance is not None else None,
        )
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.numpy(), atol=1e-4, rtol=1e-4
    )
