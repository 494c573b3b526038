"""Gradient accumulation (reference: accelerate's gradient_accumulation_steps,
pdm/training/trainer.py:124,983): grad_accum microbatches scanned inside ONE
jitted step, one optimizer update with the mean gradient."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from unlearn_ft_tpu.models import (
    UNet2DConditionModel,
    UNetConfig,
    build_unet_spec,
    gate_layout_for_config,
)
from unlearn_ft_tpu.models.vae import AutoencoderKL, VAEConfig
from unlearn_ft_tpu.parallel import create_mesh, replicate, shard_batch
from unlearn_ft_tpu.schedulers import DiffusionSchedule
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
    vae = AutoencoderKL(
        VAEConfig(block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4)
    )
    sched = DiffusionSchedule()

    key = jax.random.PRNGKey(0)
    uparams = unet.init(
        key, jnp.zeros((1, 8, 8, 4)), jnp.array([0]), jnp.zeros((1, 7, 16))
    )["params"]
    vparams = vae.init(key, jnp.zeros((1, 16, 16, 3)), key)["params"]
    mesh = create_mesh()

    def micro_batch(seed):
        rng = np.random.default_rng(seed)
        return {
            "pixel_values": rng.standard_normal((8, 16, 16, 3)).astype(np.float32),
            "prompt_embeds": rng.standard_normal((8, 7, 16)).astype(np.float32),
            "empty_prompt_embeds": np.zeros((8, 7, 16), np.float32),
            "mpnet_embeddings": rng.standard_normal((8, 12)).astype(np.float32),
        }

    return layout, spec, unet, vae, sched, uparams, vparams, mesh, micro_batch


def _fresh(tree, mesh):
    return replicate(jax.tree.map(jnp.copy, tree), mesh)


def _stack(micros):
    return jax.tree.map(lambda *xs: np.stack(xs), *micros)


def test_finetune_accum_matches_mean_of_micro_grads(setup):
    """accum=2 with SGD(lr=1) must apply exactly the MEAN of the per-micro
    gradients the accum=1 step produces under the scan's split keys."""
    layout, spec, unet, vae, sched, uparams, vparams, mesh, micro_batch = setup
    loss_cfg = LossConfig()
    tx = optax.sgd(1.0)
    frozen = {"teacher": _fresh(uparams, mesh), "vae": _fresh(vparams, mesh)}
    m1, m2 = micro_batch(0), micro_batch(1)
    rng = jax.random.PRNGKey(5)
    k1, k2 = jax.random.split(rng, 2)  # _accumulated_grads' key schedule

    single = make_finetune_step(unet, unet, vae, sched, loss_cfg, tx)
    base = jax.device_get(uparams)

    def grads_of(micro, key):
        p, _, m = single(
            _fresh(uparams, mesh), _fresh(tx.init(uparams), mesh), frozen,
            shard_batch(micro, mesh), key,
        )
        g = jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b), base,
                         jax.device_get(p))
        return g, float(m["loss"])

    g1, l1 = grads_of(m1, k1)
    g2, l2 = grads_of(m2, k2)

    accum = make_finetune_step(unet, unet, vae, sched, loss_cfg, tx, grad_accum=2)
    p_acc, _, m_acc = accum(
        _fresh(uparams, mesh), _fresh(tx.init(uparams), mesh), frozen,
        shard_batch(_stack([m1, m2]), mesh, batch_axis=1), rng,
    )
    want = jax.tree.map(lambda p, a, b: p - 0.5 * (a + b), base, g1, g2)
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(jax.device_get(p_acc))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    np.testing.assert_allclose(float(m_acc["loss"]), 0.5 * (l1 + l2), rtol=1e-5)


def test_upper_accum_matches_mean_of_micro_grads(setup):
    layout, spec, unet, vae, sched, uparams, vparams, mesh, micro_batch = setup
    loss_cfg = LossConfig(upper_distillation_weight=1.0)
    tx = optax.sgd(1.0)
    frozen = {"teacher": _fresh(uparams, mesh), "vae": _fresh(vparams, mesh)}
    m1, m2 = micro_batch(2), micro_batch(3)
    rng = jax.random.PRNGKey(9)
    k1, k2 = jax.random.split(rng, 2)

    single = make_upper_step(unet, unet, vae, sched, loss_cfg, tx)
    base = jax.device_get(uparams)

    def grads_of(micro, key):
        p, _, _ = single(
            _fresh(uparams, mesh), _fresh(tx.init(uparams), mesh), frozen,
            shard_batch(micro, mesh), key,
        )
        return jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b), base,
                            jax.device_get(p))

    g1 = grads_of(m1, k1)
    g2 = grads_of(m2, k2)

    accum = make_upper_step(unet, unet, vae, sched, loss_cfg, tx, grad_accum=2)
    p_acc, _, m_acc = accum(
        _fresh(uparams, mesh), _fresh(tx.init(uparams), mesh), frozen,
        shard_batch(_stack([m1, m2]), mesh, batch_axis=1), rng,
    )
    want = jax.tree.map(lambda p, a, b: p - 0.5 * (a + b), base, g1, g2)
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(jax.device_get(p_acc))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert np.isfinite(float(m_acc["upper_loss"]))


def test_pruner_accum_threads_quant_state(setup):
    """Pruner accumulation: per-sample metrics concatenate back to the
    effective batch and the Sinkhorn codebook state advances."""
    from unlearn_ft_tpu.models.hypernet import HyperStructure
    from unlearn_ft_tpu.models.quantizer import QuantizerConfig
    from unlearn_ft_tpu.training.optim import make_optimizer

    layout, spec, unet, vae, sched, uparams, vparams, mesh, micro_batch = setup
    hn = HyperStructure(layout, input_dim=12)
    hparams = hn.init(jax.random.PRNGKey(4), jnp.zeros((1, 12)))["params"]
    qcfg = QuantizerConfig(layout=layout, n_e=4)
    qparams = qcfg.init_params(jax.random.PRNGKey(5))
    qstate = qcfg.init_state(qparams)
    qstate = qcfg.set_prunable_macs_template(
        qstate, [[1.0] * len(s.widths) for s in layout.submodules]
    )
    loss_cfg = LossConfig(resource_target=0.6, contrastive_weight=1.0, resource_weight=1.0)
    tx = make_optimizer(1e-3)
    step = make_pruner_step(
        unet, hn, qcfg, vae, layout, spec, sched, loss_cfg, tx, seq_kv=7, grad_accum=2
    )
    trainable = _fresh({"hypernet": hparams, "quantizer": qparams}, mesh)
    opt_state = _fresh(tx.init({"hypernet": hparams, "quantizer": qparams}), mesh)
    qstate = _fresh(qstate, mesh)
    frozen = {"unet": _fresh(uparams, mesh), "vae": _fresh(vparams, mesh)}
    batch = shard_batch(_stack([micro_batch(4), micro_batch(5)]), mesh, batch_axis=1)

    t1, o1, qs1, m1 = step(trainable, opt_state, qstate, frozen, batch,
                           jax.random.PRNGKey(6))
    assert np.isfinite(float(m1["loss"]))
    assert m1["expert_indices"].shape == (16,)  # 2 micros x batch 8
    assert m1["batch_resource_ratios"].shape == (16,)
    assert not np.array_equal(
        np.asarray(qs1["embedding_gs"]), np.asarray(jax.device_get(qstate)["embedding_gs"])
    )
    before = jax.tree.leaves({"h": hparams})[0]
    after = jax.tree.leaves({"h": t1["hypernet"]})[0]
    assert not np.array_equal(np.asarray(before), np.asarray(after))


def test_accum_with_sharded_moments_matches_replicated(setup):
    """ZeRO-1 moment sharding composes with accumulation: the sharded-state
    update equals the replicated one (XLA inserts the collectives)."""
    from unlearn_ft_tpu.parallel import shard_moments
    from unlearn_ft_tpu.training.optim import make_optimizer

    layout, spec, unet, vae, sched, uparams, vparams, mesh, micro_batch = setup
    loss_cfg = LossConfig()
    tx = make_optimizer(1e-4, warmup_steps=2)
    step = make_finetune_step(unet, unet, vae, sched, loss_cfg, tx, grad_accum=2)
    frozen = {"teacher": _fresh(uparams, mesh), "vae": _fresh(vparams, mesh)}
    batch = shard_batch(_stack([micro_batch(6), micro_batch(7)]), mesh, batch_axis=1)

    p_rep, _, _ = step(
        _fresh(uparams, mesh), _fresh(tx.init(uparams), mesh), frozen, batch,
        jax.random.PRNGKey(3),
    )
    o_sh = shard_moments(jax.tree.map(jnp.copy, tx.init(uparams)), mesh)
    p_sh, _, _ = step(_fresh(uparams, mesh), o_sh, frozen, batch, jax.random.PRNGKey(3))
    for a, b in zip(jax.tree.leaves(jax.device_get(p_rep)),
                    jax.tree.leaves(jax.device_get(p_sh))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
