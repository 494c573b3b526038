import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unlearn_ft_tpu.models import (
    UNet2DConditionModel,
    UNetConfig,
    build_unet_spec,
    gate_layout_for_config,
    materialize_pruned,
)


def tiny_config():
    return UNetConfig(
        sample_size=8,
        block_out_channels=(32, 64),
        layers_per_block=2,
        num_attention_heads=(2, 4),
        cross_attention_dim=16,
        norm_num_groups=4,
        ff_gate_width=4,
        upcast_attention=False,
        down_block_types=("CrossAttnDownBlock2DHalfGated", "DownBlock2DHalfGated"),
        up_block_types=("UpBlock2DHalfGated", "CrossAttnUpBlock2DHalfGated"),
    )


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    spec = build_unet_spec(cfg)
    layout = gate_layout_for_config(cfg)
    model = UNet2DConditionModel(spec)
    key = jax.random.PRNGKey(0)
    sample = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 16))
    t = jnp.array([10, 500])
    params = model.init(key, sample, t, ctx)["params"]
    return cfg, spec, layout, model, params, sample, ctx, t


def test_layout_matches_spec(setup):
    cfg, spec, layout, model, params, sample, ctx, t = setup
    # consuming a layout-shaped structure through the model must succeed
    flat = jnp.full((2, layout.total_dim), 0.9)
    structure = layout.split(flat)
    per_block = model.split_structure(structure)
    assert len(per_block) == len(spec.blocks)


def test_forward_shapes(setup):
    _, _, _, model, params, sample, ctx, t = setup
    out = model.apply({"params": params}, sample, t, ctx)
    assert out.shape == sample.shape
    assert jnp.isfinite(out).all()


def test_all_ones_structure_equals_ungated(setup):
    _, _, layout, model, params, sample, ctx, t = setup
    ones = layout.ones(2)
    out_gated = model.apply({"params": params}, sample, t, ctx, ones)
    out_plain = model.apply({"params": params}, sample, t, ctx)
    np.testing.assert_allclose(out_gated, out_plain, atol=1e-5)


def test_soft_gates_change_output(setup):
    _, _, layout, model, params, sample, ctx, t = setup
    flat = jnp.full((2, layout.total_dim), 0.7)
    out_soft = model.apply({"params": params}, sample, t, ctx, layout.split(flat))
    out_plain = model.apply({"params": params}, sample, t, ctx)
    assert not np.allclose(out_soft, out_plain, atol=1e-4)


def test_pruned_equals_hard_gated(setup):
    """Materialized pruning must reproduce the hard-gated forward exactly,
    once the known norm2-bias leak of dead groups is neutralized (the
    reference's gated model passes dead groups' norm2 bias through conv2;
    the pruned model removes those channels entirely)."""
    cfg, spec, layout, model, params, sample, ctx, t = setup
    arch = layout.random_arch_vector(0.6, seed=7)  # includes depth bits 0.9 (all kept)
    # force one depth gate off to exercise dropped-layer elision
    arch[0, layout.num_width + 1] = 0.1
    arch[0, layout.num_width + layout.num_depth - 1] = 0.1

    # neutralize the bias leak: zero norm2 scale/bias on dead channels
    widths, depths = _hard_masks_for_test(layout, arch)
    params = _zero_dead_norm2(spec, params, widths)

    # the gated model must see the same HARD 0/1 gates the pruner applies
    hard_flat = np.concatenate(
        [m.astype(np.float32) for m in widths] + [np.asarray(depths, np.float32)]
    )[None, :]
    structure = layout.split(jnp.asarray(np.repeat(hard_flat, 2, axis=0)))
    out_gated = model.apply({"params": params}, sample, t, ctx, structure)

    pruned_spec, pruned_params = materialize_pruned(spec, layout, params, arch)
    pruned_model = UNet2DConditionModel(pruned_spec)
    out_pruned = pruned_model.apply({"params": pruned_params}, sample, t, ctx)
    np.testing.assert_allclose(out_pruned, out_gated, atol=2e-4)


def _hard_masks_for_test(layout, arch):
    from unlearn_ft_tpu.models.unet_spec import _hard_masks

    return _hard_masks(layout, arch, True)


def _zero_dead_norm2(spec, params, widths):
    import copy

    params = copy.deepcopy(jax.tree.map(np.asarray, params))
    wi = 0

    def handle_block(block, bp):
        nonlocal wi
        for j, r in enumerate(block.resnets):
            if not r.has_width_gate:
                continue
            mask = widths[wi]
            wi += 1
            ch = np.repeat(mask, r.hidden_channels // r.gate_width)
            bp[f"resnets_{j}"]["norm2"]["scale"][~ch] = 0.0
            bp[f"resnets_{j}"]["norm2"]["bias"][~ch] = 0.0
        for tsp in block.transformers:
            if tsp.has_width_gates:
                wi += 3 if tsp.gated_ff else 2

    for i, b in enumerate(spec.down):
        handle_block(b, params[f"down_blocks_{i}"])
    handle_block(spec.mid, params["mid_block"])
    for i, b in enumerate(spec.up):
        handle_block(b, params[f"up_blocks_{i}"])
    return params


@pytest.fixture(scope="module")
def no_remat_grads(setup):
    """The un-rematted loss/grads, computed ONCE and shared by every
    remat-policy parametrization (the reference compile is the expensive
    half of each comparison)."""
    _, spec, _, model, params, sample, ctx, t = setup

    def f(p):
        out = model.apply({"params": p}, sample, t, ctx)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    return jax.jit(jax.value_and_grad(f))(params)


@pytest.mark.parametrize("policy", [None, "dots", "hires"])
def test_remat_policies_match_no_remat_gradients(setup, no_remat_grads, policy):
    """remat only changes WHAT is saved for backward, never the math: loss
    and gradients must match the un-rematted model bitwise-closely under
    every policy (full replay / dots_saveable / hires-only)."""
    _, spec, _, model, params, sample, ctx, t = setup
    rem = UNet2DConditionModel(spec, remat=True, remat_policy=policy)

    def f(p):
        out = rem.apply({"params": p}, sample, t, ctx)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    rem_l, rem_g = jax.jit(jax.value_and_grad(f))(params)
    base_l, base_g = no_remat_grads
    np.testing.assert_allclose(float(rem_l), float(base_l), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5),
        base_g, rem_g,
    )


def test_depth_gate_on_channel_changing_resnet_raises(setup):
    """layers_per_block=1 puts the HalfGated depth gate on each down block's
    only resnet; where that resnet changes channels the depth lerp has no
    identity path — build_unet_spec must reject it up front instead of
    letting the forward die on a broadcast error."""
    cfg, *_ = setup
    from dataclasses import replace as dc_replace

    bad = dc_replace(cfg, layers_per_block=1)  # 16->32 down resnet gets the gate
    with pytest.raises(ValueError, match="channel-changing"):
        build_unet_spec(bad)


def test_remat_policy_unknown_raises(setup):
    _, spec, _, _, params, sample, ctx, t = setup
    bad = UNet2DConditionModel(spec, remat=True, remat_policy="nope")
    with pytest.raises(ValueError, match="remat_policy"):
        bad.apply({"params": params}, sample, t, ctx)


def test_pruned_is_smaller(setup):
    cfg, spec, layout, model, params, sample, ctx, t = setup
    arch = layout.random_arch_vector(0.5, seed=3)
    pruned_spec, pruned_params = materialize_pruned(spec, layout, params, arch)
    n_full = sum(x.size for x in jax.tree.leaves(params))
    n_pruned = sum(np.asarray(x).size for x in jax.tree.leaves(pruned_params))
    assert n_pruned < n_full
    r0 = pruned_spec.down[0].resnets[0]
    assert r0.hidden_channels < r0.out_channels or r0.hidden_channels == r0.out_channels
    out = UNet2DConditionModel(pruned_spec).apply({"params": pruned_params}, sample, t, ctx)
    assert out.shape == sample.shape
