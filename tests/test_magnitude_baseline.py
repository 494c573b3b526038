"""Mechanism verification of the magnitude pruning baseline against the
reference's torch_pruning setup (unet_2d_conditional.py:2873-2920):
dependency-group-aggregated importance, attention-head channel groups,
FeedForward in ignored_layers, global ratio over the prunable pool.
torch_pruning itself is not in this image, so the checks plant known
magnitudes into the coupled tensors of specific groups and assert the
selection the reference mechanism would make."""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from unlearn_ft_tpu.baselines.magnitude import magnitude_arch_vector
from unlearn_ft_tpu.models import (
    UNet2DConditionModel,
    UNetConfig,
    build_unet_spec,
    gate_layout_for_config,
)

CFG = UNetConfig(
    sample_size=8,
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


def _setup():
    spec = build_unet_spec(CFG)
    layout = gate_layout_for_config(CFG)
    unet = UNet2DConditionModel(spec)
    params = unet.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 7, 16)),
    )["params"]
    params = jax.tree.map(lambda x: np.array(x, np.float32), params)  # writable
    return spec, layout, unet, params


def _gate_slices(layout):
    """[(start, width)] per width gate in canonical order."""
    out, start = [], 0
    for w in layout.width_list:
        out.append((start, w))
        start += w
    return out


def test_ff_gates_ignored_and_depth_on():
    """Reference ignored_layers: FeedForward is never pruned; depth gates
    stay on (magnitude pruning removes widths only)."""
    spec, layout, _, params = _setup()
    v = magnitude_arch_vector(params, spec, layout, ratio=0.5)[0]
    widths = v[: layout.num_width]
    depths = v[layout.num_width :]
    assert (depths > 0.5).all()

    # identify ff gates by walking the spec in canonical order
    kinds = []
    for blocks in ([*spec.down, spec.mid, *spec.up]):
        for r in blocks.resnets:
            if r.has_width_gate:
                kinds.append("resnet")
        for t in blocks.transformers:
            if t.has_width_gates:
                for _li in range(t.num_layers):
                    kinds += ["attn1", "attn2"]
                    if t.gated_ff:
                        kinds.append("ff")
    assert len(kinds) == len(layout.width_list)
    for (start, w), kind in zip(_gate_slices(layout), kinds):
        if kind == "ff":
            assert (widths[start : start + w] > 0.5).all(), "FF gate was pruned"
    # the global budget really prunes: some non-ff unit must be off at 0.5
    non_ff = np.concatenate([
        widths[s : s + w] for (s, w), k in zip(_gate_slices(layout), kinds)
        if k != "ff"
    ])
    kept = (non_ff > 0.5).mean()
    assert 0.4 <= kept <= 0.7, kept  # ~ratio, modulo never-empty forcing


def test_planted_small_group_is_dropped():
    """Zeroing EVERY coupled tensor of one resnet channel group (conv1-out,
    time_emb_proj-out, norm2-scale, conv2-in) must drop exactly that group
    under a generous budget."""
    spec, layout, _, params = _setup()
    r0 = spec.down[0].resnets[0]
    g = r0.gate_width
    group_dim = r0.hidden_channels // g
    sl = slice(0, group_dim)  # group 0
    rp = params["down_blocks_0"]["resnets_0"]
    rp["conv1"]["kernel"][..., sl] *= 1e-6
    rp["time_emb_proj"]["kernel"][:, sl] *= 1e-6
    rp["norm2"]["scale"][sl] *= 1e-6
    rp["conv2"]["kernel"][:, :, sl, :] *= 1e-6

    v = magnitude_arch_vector(params, spec, layout, ratio=0.95)[0]
    start, w = _gate_slices(layout)[0]  # first gate = down0.resnet0
    gates = v[start : start + w]
    assert gates[0] < 0.5, "planted near-zero group survived"
    assert (gates[1:] > 0.5).all(), "healthy groups were dropped instead"


def test_planted_small_head_is_dropped():
    """Zeroing one attention head across to_q/to_k/to_v/to_out (the
    reference's channel_groups + dependency coupling) drops that head."""
    spec, layout, _, params = _setup()
    t = spec.down[0].transformers[0]
    hd = t.head_dim
    tb = params["down_blocks_0"]["attentions_0"]["transformer_blocks_0"]
    for name in ("to_q", "to_k", "to_v"):
        tb["attn1"][name]["kernel"][:, :hd] *= 1e-6
    tb["attn1"]["to_out_0"]["kernel"][:hd, :] *= 1e-6

    v = magnitude_arch_vector(params, spec, layout, ratio=0.95)[0]
    # attn1 of down0 transformer0 is the gate right after its resnet(s)
    slices = _gate_slices(layout)
    idx = 0
    for r in spec.down[0].resnets:
        if r.has_width_gate:
            idx += 1
    start, w = slices[idx]  # attn1 gate
    gates = v[start : start + w]
    assert gates[0] < 0.5, "planted near-zero head survived"
    assert (gates[1:] > 0.5).all()


def test_group_aggregation_not_conv1_only():
    """A group that is near-zero in conv1 but strong in its conv2-in
    coupling must outrank a group that is near-zero in EVERY coupled tensor.
    Scoring conv1 alone (the round-2 mechanism) cannot separate them;
    tp.MagnitudeImportance's dependency-group aggregation can."""
    spec, layout, _, params = _setup()
    r0 = spec.down[0].resnets[0]
    g = r0.gate_width
    group_dim = r0.hidden_channels // g
    rp = params["down_blocks_0"]["resnets_0"]
    # group 0: tiny everywhere
    rp["conv1"]["kernel"][..., :group_dim] *= 1e-6
    rp["time_emb_proj"]["kernel"][:, :group_dim] *= 1e-6
    rp["norm2"]["scale"][:group_dim] *= 1e-6
    rp["conv2"]["kernel"][:, :, :group_dim, :] *= 1e-6
    # group 1: tiny in conv1, strong in the conv2-in coupling
    sl1 = slice(group_dim, 2 * group_dim)
    rp["conv1"]["kernel"][..., sl1] *= 1e-6
    rp["conv2"]["kernel"][:, :, sl1, :] = 1.0

    from unlearn_ft_tpu.baselines.magnitude import _group_importance, _group_norms

    per_layer = [
        _group_norms(rp["conv1"]["kernel"], g, axis=3),
        _group_norms(rp["time_emb_proj"]["kernel"], g, axis=1),
        _group_norms(rp["norm2"]["scale"], g, axis=0),
        _group_norms(rp["conv2"]["kernel"], g, axis=2),
    ]
    s = _group_importance(per_layer)
    assert s[1] > 10 * s[0], (
        "dependency-group aggregation missed the conv2-in coupling"
    )
    # and conv1 alone cannot tell them apart
    c1 = per_layer[0]
    assert abs(c1[1] - c1[0]) < 1e-3 * max(c1.max(), 1e-9)


def test_baseline_trainer_magnitude_end_to_end():
    """BaselineFineTuneTrainer(baseline_type=magnitude) materializes a
    smaller student from the ranked arch vector and trains
    (reference trainer.py:3489-3577)."""
    from unlearn_ft_tpu.training.finetune import BaselineFineTuneTrainer
    from unlearn_ft_tpu.utils.config import load_config

    cfg_path = os.path.join(
        os.path.dirname(__file__), "..", "configs", "tests", "tiny_synthetic.yaml"
    )
    with tempfile.TemporaryDirectory() as tmp:
        cfg = load_config(cfg_path)
        cfg.training.logging.logging_dir = tmp
        cfg.merge({"seed": 43, "wandb_run_name": "t", "baseline_type": "magnitude"})
        cfg.model.prediction_model.random_pruning_ratio = 0.5
        cfg.training.max_train_steps = 2
        t = BaselineFineTuneTrainer(cfg)
        assert t.arch_vector is not None
        assert os.path.exists(os.path.join(t.logging_dir, "arch_vector.npy"))
        n_student = sum(np.asarray(x).size for x in jax.tree.leaves(
            jax.device_get(t.params)))
        n_teacher = sum(np.asarray(x).size for x in jax.tree.leaves(
            jax.device_get(t.frozen)["teacher"]))
        assert n_student < n_teacher
        t.train()
