"""Smoke tests for the jitted train steps on an 8-device CPU mesh — exercises
the sharded-batch + replicated-params layout the TPU runs use."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unlearn_ft_tpu.models import UNet2DConditionModel, UNetConfig, build_unet_spec, gate_layout_for_config
from unlearn_ft_tpu.models.hypernet import HyperStructure
from unlearn_ft_tpu.models.quantizer import QuantizerConfig
from unlearn_ft_tpu.models.vae import AutoencoderKL, VAEConfig
from unlearn_ft_tpu.parallel import create_mesh, replicate, shard_batch
from unlearn_ft_tpu.schedulers import DiffusionSchedule
from unlearn_ft_tpu.training.optim import make_optimizer
from unlearn_ft_tpu.training.steps import (
    LossConfig,
    make_finetune_step,
    make_pruner_step,
    make_upper_step,
)


@pytest.fixture(scope="module")
def setup():
    cfg = UNetConfig(
        sample_size=8,
        # equal widths + layers_per_block=1 halve every step program here
        # while keeping the depth gate on each down block's (only) resnet
        # channel-preserving (build_unet_spec rejects a depth gate on a
        # channel-changing resnet — there is no identity path to lerp to);
        # these tests exercise step mechanics (sharding, donation,
        # accumulation, cadence), not multi-layer gate plumbing
        # (tests/test_unet.py keeps layers_per_block=2 + distinct widths)
        block_out_channels=(16, 16),
        layers_per_block=1,
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
    vae = AutoencoderKL(VAEConfig(block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4))
    sched = DiffusionSchedule()

    key = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, 7, 16))
    uparams = unet.init(key, sample, jnp.array([0]), ctx)["params"]
    vparams = vae.init(key, jnp.zeros((1, 16, 16, 3)), key)["params"]

    mesh = create_mesh()
    batch = {
        "pixel_values": np.random.default_rng(0).standard_normal((8, 16, 16, 3), np.float32),
        "prompt_embeds": np.random.default_rng(1).standard_normal((8, 7, 16), np.float32),
        "empty_prompt_embeds": np.zeros((8, 7, 16), np.float32),
        "mpnet_embeddings": np.random.default_rng(2).standard_normal((8, 12), np.float32),
    }
    batch = shard_batch(batch, mesh)
    return cfg, spec, layout, unet, vae, sched, uparams, vparams, mesh, batch


def test_mesh_has_8_devices(setup):
    mesh = setup[8]
    assert mesh.devices.size == 8


def _fresh(tree, mesh):
    # deep-copy before replicate: the steps donate their params/opt_state,
    # and replicate() may alias the source buffer on device 0
    return replicate(jax.tree.map(jnp.copy, tree), mesh)


def test_finetune_step(setup):
    cfg, spec, layout, unet, vae, sched, uparams, vparams, mesh, batch = setup
    loss_cfg = LossConfig()
    tx = make_optimizer(1e-4, warmup_steps=2)
    step = make_finetune_step(unet, unet, vae, sched, loss_cfg, tx)
    params = _fresh(uparams, mesh)
    teacher = _fresh(uparams, mesh)
    opt_state = _fresh(tx.init(uparams), mesh)
    frozen = {"teacher": teacher, "vae": _fresh(vparams, mesh)}

    p1, o1, m1 = step(params, opt_state, frozen, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m1["loss"]))
    assert float(m1["distill_loss"]) >= 0
    # params actually changed
    d0 = jax.tree.leaves(p1)[0]
    assert d0.dtype == jnp.float32
    p2, o2, m2 = step(p1, o1, frozen, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(m2["loss"]))


def test_upper_step(setup):
    cfg, spec, layout, unet, vae, sched, uparams, vparams, mesh, batch = setup
    loss_cfg = LossConfig(upper_distillation_weight=1.0)
    tx = make_optimizer(5e-6)
    step = make_upper_step(unet, unet, vae, sched, loss_cfg, tx)
    params = _fresh(uparams, mesh)
    opt_state = _fresh(tx.init(uparams), mesh)
    frozen = {"teacher": _fresh(uparams, mesh), "vae": _fresh(vparams, mesh)}
    p1, o1, m1 = step(params, opt_state, frozen, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(m1["upper_loss"]))
    assert float(m1["upper_distill_loss"]) > 0


def test_upper_step_fusion_matches_separate_forwards(setup):
    """The 2B CFG-style fused teacher dispatch must reproduce the math of
    two separate cond/uncond forwards (reference upper_step,
    trainer.py:2949-2998) — including the block loss against the
    conditional half's activations."""
    from unlearn_ft_tpu.losses import (
        block_distillation_loss,
        esd_negative_guidance_target,
    )
    from unlearn_ft_tpu.training.steps import _forward_process, _get_latents

    cfg, spec, layout, unet, vae, sched, uparams, vparams, mesh, batch = setup
    loss_cfg = LossConfig(upper_distillation_weight=1.0, upper_block_weight=0.5)
    tx = make_optimizer(0.0)  # lr 0: params unchanged, metrics comparable
    step = make_upper_step(unet, unet, vae, sched, loss_cfg, tx)
    params = _fresh(uparams, mesh)
    opt_state = _fresh(tx.init(uparams), mesh)
    frozen = {"teacher": _fresh(uparams, mesh), "vae": _fresh(vparams, mesh)}
    rng = jax.random.PRNGKey(7)
    _, _, m = step(params, opt_state, frozen, batch, rng)

    # reference computation with two separate teacher forwards
    k_vae, k_fwd = jax.random.split(rng)
    latents = _get_latents(vae, vparams, jax.device_get(batch), k_vae)
    noisy, timesteps, _ = _forward_process(sched, loss_cfg, latents, k_fwd)
    ctx = jnp.asarray(batch["prompt_embeds"])
    empty = jnp.asarray(batch["empty_prompt_embeds"])
    cond, cond_acts = unet.apply(
        {"params": uparams}, noisy, timesteps, ctx, return_block_activations=True
    )
    uncond = unet.apply({"params": uparams}, noisy, timesteps, empty)
    target = esd_negative_guidance_target(cond, uncond)
    pred, acts = unet.apply(
        {"params": uparams}, noisy, timesteps, ctx, return_block_activations=True
    )
    want_dist = jnp.mean((pred - target) ** 2)
    want_blk = block_distillation_loss(acts, cond_acts)
    np.testing.assert_allclose(float(m["upper_distill_loss"]), float(want_dist),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(m["upper_block_loss"]), float(want_blk),
                               rtol=2e-4, atol=1e-6)


def test_finetune_step_with_sharded_moments(setup):
    """ZeRO-1 optimizer-state sharding: moments split over the dp axis, step
    result identical to the replicated layout (XLA inserts the collectives)."""
    from unlearn_ft_tpu.parallel import shard_moments

    cfg, spec, layout, unet, vae, sched, uparams, vparams, mesh, batch = setup
    loss_cfg = LossConfig()
    tx = make_optimizer(1e-4, warmup_steps=2)
    step = make_finetune_step(unet, unet, vae, sched, loss_cfg, tx)
    frozen = {"teacher": _fresh(uparams, mesh), "vae": _fresh(vparams, mesh)}

    p_rep, o_rep, _ = step(
        _fresh(uparams, mesh), _fresh(tx.init(uparams), mesh), frozen, batch,
        jax.random.PRNGKey(7),
    )
    o_sh = shard_moments(jax.tree.map(jnp.copy, tx.init(uparams)), mesh)
    # at least one big leaf actually sharded
    assert any(
        not s.is_fully_replicated
        for s in (x.sharding for x in jax.tree.leaves(o_sh) if hasattr(x, "sharding"))
    )
    p_sh, o_sh1, _ = step(
        _fresh(uparams, mesh), o_sh, frozen, batch, jax.random.PRNGKey(7)
    )
    for a, b in zip(jax.tree.leaves(p_rep), jax.tree.leaves(p_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_finetune_step_with_sharded_bf16_sr_moments(setup):
    """The low-memory optimizer (bf16 moments + stochastic rounding) under
    ZeRO-1 sharding: the rounding hash is indexed by *global* element
    position, so the sharded update must equal the replicated one exactly."""
    from unlearn_ft_tpu.parallel import shard_moments

    cfg, spec, layout, unet, vae, sched, uparams, vparams, mesh, batch = setup
    loss_cfg = LossConfig()
    tx = make_optimizer(1e-4, warmup_steps=2, mu_dtype=jnp.bfloat16,
                        nu_dtype=jnp.bfloat16)
    step = make_finetune_step(unet, unet, vae, sched, loss_cfg, tx)
    frozen = {"teacher": _fresh(uparams, mesh), "vae": _fresh(vparams, mesh)}

    p_rep, o_rep, _ = step(
        _fresh(uparams, mesh), _fresh(tx.init(uparams), mesh), frozen, batch,
        jax.random.PRNGKey(7),
    )
    o_sh = shard_moments(jax.tree.map(jnp.copy, tx.init(uparams)), mesh)
    p_sh, o_sh1, _ = step(
        _fresh(uparams, mesh), o_sh, frozen, batch, jax.random.PRNGKey(7)
    )
    for a, b in zip(jax.tree.leaves(p_rep), jax.tree.leaves(p_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # moments really stored in bf16
    leaves = [x for x in jax.tree.leaves(o_sh1) if hasattr(x, "dtype")]
    assert any(x.dtype == jnp.bfloat16 for x in leaves)


def test_pruner_step(setup):
    cfg, spec, layout, unet, vae, sched, uparams, vparams, mesh, batch = setup
    hn = HyperStructure(layout, input_dim=12)
    hparams = hn.init(jax.random.PRNGKey(4), jnp.zeros((1, 12)))["params"]
    qcfg = QuantizerConfig(layout=layout, n_e=4)
    qparams = qcfg.init_params(jax.random.PRNGKey(5))
    qstate = qcfg.init_state(qparams)
    qstate = qcfg.set_prunable_macs_template(
        qstate,
        [[1.0] * len(s.widths) for s in layout.submodules],
    )

    loss_cfg = LossConfig(resource_target=0.6, contrastive_weight=1.0, resource_weight=1.0)
    tx = make_optimizer(1e-3)
    step = make_pruner_step(unet, hn, qcfg, vae, layout, spec, sched, loss_cfg, tx, seq_kv=7)

    trainable = _fresh({"hypernet": hparams, "quantizer": qparams}, mesh)
    opt_state = _fresh(tx.init({"hypernet": hparams, "quantizer": qparams}), mesh)
    qstate = _fresh(qstate, mesh)
    frozen = {"unet": _fresh(uparams, mesh), "vae": _fresh(vparams, mesh)}

    t1, o1, qs1, m1 = step(trainable, opt_state, qstate, frozen, batch, jax.random.PRNGKey(6))
    assert np.isfinite(float(m1["loss"]))
    assert 0 < float(m1["resource_ratio"]) <= 1.5
    assert m1["expert_indices"].shape == (8,)
    # hypernet received gradients
    before = jax.tree.leaves({"h": hparams})[0]
    after = jax.tree.leaves({"h": t1["hypernet"]})[0]
    assert not np.array_equal(np.asarray(before), np.asarray(after))
    # embedding_gs snapshot updated
    assert not np.array_equal(np.asarray(qs1["embedding_gs"]), np.asarray(qstate["embedding_gs"]))


def test_fused_cadence_matches_sequential_steps(setup):
    """The fused lax.scan cadence must be numerically the same schedule as
    host-interleaved lower/upper steps with the same keys."""
    from unlearn_ft_tpu.training.steps import make_bilevel_cadence_step

    cfg, spec, layout, unet, vae, sched, uparams, vparams, mesh, batch = setup
    loss_cfg = LossConfig()
    tx = make_optimizer(1e-4)
    upper_tx = make_optimizer(5e-6)
    frozen = {"teacher": _fresh(uparams, mesh), "vae": _fresh(vparams, mesh)}
    n_lower = 3
    rng = jax.random.PRNGKey(7)
    keys = jax.random.split(rng, n_lower + 1)

    # sequential reference
    lower = make_finetune_step(unet, unet, vae, sched, loss_cfg, tx)
    upper = make_upper_step(unet, unet, vae, sched, loss_cfg, upper_tx)
    p_seq = _fresh(uparams, mesh)
    o_seq = _fresh(tx.init(uparams), mesh)
    uo_seq = _fresh(upper_tx.init(uparams), mesh)
    for i in range(n_lower):
        p_seq, o_seq, _ = lower(p_seq, o_seq, frozen, batch, keys[i])
    p_seq, uo_seq, um_seq = upper(p_seq, uo_seq, frozen, batch, keys[-1])

    # fused
    cadence = make_bilevel_cadence_step(
        unet, unet, vae, sched, loss_cfg, tx, upper_tx, lower_per_upper=n_lower
    )
    stacked = jax.tree.map(lambda x: jnp.broadcast_to(x, (n_lower,) + x.shape), batch)
    p_f, o_f, uo_f, lm, um = cadence(
        _fresh(uparams, mesh), _fresh(tx.init(uparams), mesh),
        _fresh(upper_tx.init(uparams), mesh), frozen, stacked, batch, rng,
    )
    assert lm["loss"].shape == (n_lower,)
    np.testing.assert_allclose(
        float(um["upper_loss"]), float(um_seq["upper_loss"]), rtol=1e-4, atol=1e-6
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-5
        ),
        p_f, p_seq,
    )
