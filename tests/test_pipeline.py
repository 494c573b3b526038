import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unlearn_ft_tpu.models import UNet2DConditionModel, UNetConfig, build_unet_spec, gate_layout_for_config
from unlearn_ft_tpu.models.hypernet import HyperStructure
from unlearn_ft_tpu.models.quantizer import QuantizerConfig
from unlearn_ft_tpu.models.vae import AutoencoderKL, VAEConfig
from unlearn_ft_tpu.pipelines import PruningPipeline, SDPipeline
from unlearn_ft_tpu.schedulers import DiffusionSchedule


@pytest.fixture(scope="module")
def pipe_parts():
    cfg = UNetConfig(
        sample_size=4,
        block_out_channels=(16, 32),
        layers_per_block=2,
        num_attention_heads=(2, 4),
        cross_attention_dim=16,
        norm_num_groups=4,
        ff_gate_width=4,
        upcast_attention=False,
        down_block_types=("CrossAttnDownBlock2DHalfGated", "DownBlock2DHalfGated"),
        up_block_types=("UpBlock2DHalfGated", "CrossAttnUpBlock2DHalfGated"),
    )
    spec = build_unet_spec(cfg)
    layout = gate_layout_for_config(cfg)
    unet = UNet2DConditionModel(spec)
    key = jax.random.PRNGKey(0)
    uparams = unet.init(key, jnp.zeros((1, 4, 4, 4)), jnp.array([0]), jnp.zeros((1, 7, 16)))["params"]
    vae = AutoencoderKL(VAEConfig(block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4))
    # latent 4x4 -> image 8x8 (one downsample stage)
    vparams = vae.init(key, jnp.zeros((1, 8, 8, 3)), key)["params"]
    sched = DiffusionSchedule()
    return cfg, spec, layout, unet, uparams, vae, vparams, sched


def test_generate_samples_ddim(pipe_parts):
    cfg, spec, layout, unet, uparams, vae, vparams, sched = pipe_parts
    pipe = SDPipeline(unet, uparams, vae, vparams, sched, scheduler_type="ddim")
    pe = jnp.zeros((2, 7, 16))
    imgs = pipe.generate_samples(pe, pe, num_inference_steps=4, guidance_scale=7.5,
                                 height=32, width=32, seed=0)
    assert imgs.shape == (2, 32, 32, 3)  # f2 tiny VAE roundtrip
    assert np.isfinite(imgs).all() and imgs.min() >= 0 and imgs.max() <= 1


def test_generate_samples_pndm(pipe_parts):
    cfg, spec, layout, unet, uparams, vae, vparams, sched = pipe_parts
    pipe = SDPipeline(unet, uparams, vae, vparams, sched, scheduler_type="pndm")
    pe = jnp.zeros((1, 7, 16))
    imgs = pipe.generate_samples(pe, pe, num_inference_steps=4, height=32, width=32)
    assert np.isfinite(imgs).all()


def test_pruning_pipeline_routing(pipe_parts):
    cfg, spec, layout, unet, uparams, vae, vparams, sched = pipe_parts
    hn = HyperStructure(layout, input_dim=12)
    hparams = hn.init(jax.random.PRNGKey(1), jnp.zeros((1, 12)))["params"]
    qcfg = QuantizerConfig(layout=layout, n_e=4)
    qparams = qcfg.init_params(jax.random.PRNGKey(2))
    qstate = qcfg.init_state(qparams)
    # snapshot hard-ish gates so routing/eval works
    qstate = dict(qstate, embedding_gs=jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (4, layout.total_dim)).astype(np.float32)))

    pipe = PruningPipeline(
        unet, uparams, vae, vparams, sched,
        hypernet=hn, hypernet_params=hparams, quantizer_cfg=qcfg,
        quantizer_params=qparams, quantizer_state=qstate, layout=layout,
    )
    emb = jnp.asarray(np.random.default_rng(1).standard_normal((2, 12)), jnp.float32)
    pe = jnp.zeros((2, 7, 16))
    imgs, idx, ratios = pipe(emb, pe, pe, num_inference_steps=2, height=32, width=32)
    assert imgs.shape[0] == 2
    assert idx.shape == (2,)
    assert ratios.shape == (2,)
    assert (ratios > 0).all() and (ratios <= 1.2).all()


def test_depth_analysis_and_quantizer_samples(pipe_parts):
    cfg, spec, layout, unet, uparams, vae, vparams, sched = pipe_parts
    hn = HyperStructure(layout, input_dim=12)
    qcfg = QuantizerConfig(layout=layout, n_e=2)
    qparams = qcfg.init_params(jax.random.PRNGKey(2))
    qstate = qcfg.init_state(qparams)
    pipe = PruningPipeline(
        unet, uparams, vae, vparams, sched,
        hypernet=hn, hypernet_params=None, quantizer_cfg=qcfg,
        quantizer_params=qparams, quantizer_state=qstate, layout=layout,
    )
    pe = jnp.zeros((1, 7, 16))
    out = pipe.depth_analysis(pe, pe, num_inference_steps=1, height=32, width=32)
    assert len(out) == layout.num_depth
    qs = pipe.quantizer_samples(pe, pe, expert_ids=[0], num_inference_steps=1,
                                height=32, width=32)
    assert 0 in qs


def test_generate_samples_uint8_output(pipe_parts):
    """output_uint8 quantizes on device and matches the float path's
    round(img*255)."""
    cfg, spec, layout, unet, uparams, vae, vparams, sched = pipe_parts
    pipe = SDPipeline(unet, uparams, vae, vparams, sched, scheduler_type="ddim")
    pe = jnp.zeros((2, 7, 16))
    kw = dict(num_inference_steps=4, guidance_scale=7.5, height=32, width=32, seed=3)
    f = pipe.generate_samples(pe, pe, **kw)
    u = pipe.generate_samples(pe, pe, output_uint8=True, **kw)
    assert u.dtype == np.uint8
    np.testing.assert_array_equal(u, np.round(f * 255.0).astype(np.uint8))


def test_generate_samples_device_output(pipe_parts):
    """device_output returns the (async) device array without a host fetch —
    the double-buffered FID/eval writers dispatch batch N+1 before fetching
    batch N — and matches the fetched path bit-for-bit."""
    import jax

    cfg, spec, layout, unet, uparams, vae, vparams, sched = pipe_parts
    pipe = SDPipeline(unet, uparams, vae, vparams, sched, scheduler_type="ddim")
    pe = jnp.zeros((2, 7, 16))
    kw = dict(num_inference_steps=4, guidance_scale=7.5, height=32, width=32,
              seed=3, output_uint8=True)
    host = pipe.generate_samples(pe, pe, **kw)
    dev = pipe.generate_samples(pe, pe, device_output=True, **kw)
    assert isinstance(dev, jax.Array)
    np.testing.assert_array_equal(np.asarray(dev), host)
