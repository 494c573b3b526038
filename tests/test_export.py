"""Export-side interop: export_unet (Flax -> diffusers torch naming) is the
exact inverse of convert_unet, exported pruned experts drive the independent
torch NCHW mirror to the same outputs as the Flax forward, and the
export_checkpoint CLI produces the reference's artifact pair
(diffusion_pytorch_model.safetensors + arch_vector.pt,
reference unet_2d_conditional.py:2185-2495, trainer.py:2159-2163)."""
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from unlearn_ft_tpu.models import (  # noqa: E402
    UNet2DConditionModel,
    UNetConfig,
    build_unet_spec,
    gate_layout_for_config,
    materialize_pruned,
)
from unlearn_ft_tpu.models.convert import convert_unet  # noqa: E402
from unlearn_ft_tpu.models.export import export_unet  # noqa: E402

from torch_mirror import synth_unet_state_dict, torch_unet_forward  # noqa: E402


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


def _assert_state_dicts_equal(sd, sd2):
    assert set(sd2) == {k for k in sd}, (
        sorted(set(sd) ^ set(sd2))[:10]
    )
    for k in sd:
        np.testing.assert_array_equal(
            np.asarray(sd[k]), sd2[k], err_msg=k
        )


@pytest.mark.fast
def test_export_roundtrip_full():
    """convert -> export reproduces the original HF state dict bit-exactly
    (lossless transposes, complete key coverage incl. samplers/shortcuts)."""
    spec = build_unet_spec(_tiny_cfg())
    sd = {k: v.numpy() if hasattr(v, "numpy") else v
          for k, v in synth_unet_state_dict(spec, seed=0).items()}
    params = convert_unet(sd, spec)
    _assert_state_dicts_equal(sd, export_unet(spec, params))


@pytest.mark.fast
def test_export_roundtrip_sdxl():
    pooled_dim, add_t_dim = 16, 8
    cfg = _tiny_cfg(
        down_block_types=("DownBlock2DHalfGated", "CrossAttnDownBlock2DHalfGated"),
        up_block_types=("CrossAttnUpBlock2DHalfGated", "UpBlock2DHalfGated"),
        addition_embed_type="text_time",
        addition_time_embed_dim=add_t_dim,
        projection_class_embeddings_input_dim=pooled_dim + 6 * add_t_dim,
    )
    spec = build_unet_spec(cfg)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v
          for k, v in synth_unet_state_dict(spec, seed=1).items()}
    params = convert_unet(sd, spec)
    sd2 = export_unet(spec, params)
    assert "add_embedding.linear_1.weight" in sd2
    _assert_state_dicts_equal(sd, sd2)


def _width_only_arch_vector(layout, seed=0):
    """Random width pruning, every depth gate kept (no dropped modules)."""
    av = np.asarray(layout.random_arch_vector(0.5, seed=seed), np.float32)
    av[:, layout.num_width:] = 1.0
    return av


def test_exported_pruned_expert_matches_torch_mirror():
    """The reference-side load of an exported width-pruned expert must
    reproduce this framework's forward: run the independent NCHW mirror
    directly on the exported state dict."""
    cfg = _tiny_cfg()
    spec = build_unet_spec(cfg)
    layout = gate_layout_for_config(cfg)
    sd_full = synth_unet_state_dict(spec, seed=2)
    params = convert_unet(sd_full, spec)
    pspec, pparams = materialize_pruned(
        spec, layout, params, _width_only_arch_vector(layout, seed=3)
    )
    sd_p = export_unet(pspec, pparams)

    rng = np.random.default_rng(11)
    b, lat = 2, cfg.sample_size
    sample = rng.standard_normal((b, lat, lat, cfg.in_channels)).astype(np.float32)
    context = rng.standard_normal((b, 5, cfg.cross_attention_dim)).astype(np.float32)
    timesteps = np.array([3.0, 977.0], np.float32)

    want = torch_unet_forward(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd_p.items()},
        pspec,
        torch.from_numpy(sample.transpose(0, 3, 1, 2)),
        torch.from_numpy(timesteps),
        torch.from_numpy(context),
    ).numpy().transpose(0, 2, 3, 1)

    got = UNet2DConditionModel(pspec, dtype=jnp.float32).apply(
        {"params": pparams}, jnp.asarray(sample), jnp.asarray(timesteps),
        jnp.asarray(context),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_exported_depth_pruned_expert_matches_torch_mirror():
    """Golden forward for a DEPTH+WIDTH pruned expert (the real APTP case):
    the exported state dict + the mirror's dropped-module semantics
    (Identity pass-through, up-block concat-skip discard — the reference's
    prune() behavior, blocks.py:502-510,651-663) reproduce the Flax
    materialized forward."""
    cfg = _tiny_cfg()
    spec = build_unet_spec(cfg)
    layout = gate_layout_for_config(cfg)
    params = convert_unet(synth_unet_state_dict(spec, seed=8), spec)
    av = np.asarray(layout.random_arch_vector(0.5, seed=9), np.float32)
    av[:, layout.num_width:] = 0.0  # drop every depth-prunable module
    pspec, pparams = materialize_pruned(spec, layout, params, av)
    assert any(m.dropped for b in pspec.blocks for m in b.resnets + b.transformers)
    sd_p = export_unet(pspec, pparams)

    rng = np.random.default_rng(13)
    b, lat = 2, cfg.sample_size
    sample = rng.standard_normal((b, lat, lat, cfg.in_channels)).astype(np.float32)
    context = rng.standard_normal((b, 5, cfg.cross_attention_dim)).astype(np.float32)
    timesteps = np.array([11.0, 503.0], np.float32)

    want = torch_unet_forward(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd_p.items()},
        pspec,
        torch.from_numpy(sample.transpose(0, 3, 1, 2)),
        torch.from_numpy(timesteps),
        torch.from_numpy(context),
    ).numpy().transpose(0, 2, 3, 1)

    got = UNet2DConditionModel(pspec, dtype=jnp.float32).apply(
        {"params": pparams}, jnp.asarray(sample), jnp.asarray(timesteps),
        jnp.asarray(context),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


@pytest.mark.fast
def test_export_dropped_modules_keep_original_indices():
    """Depth-dropped modules export no keys; survivors keep their original
    diffusers indices (the reference replaces dropped modules with
    parameterless nn.Identity in place, blocks.py:651-663)."""
    cfg = _tiny_cfg()
    spec = build_unet_spec(cfg)
    layout = gate_layout_for_config(cfg)
    params = convert_unet(synth_unet_state_dict(spec, seed=4), spec)
    av = np.asarray(layout.random_arch_vector(0.5, seed=5), np.float32)
    av[:, layout.num_width:] = 0.0  # drop everything depth-prunable
    pspec, pparams = materialize_pruned(spec, layout, params, av)
    dropped = [
        (prefix, kind, j)
        for prefix, b in (
            [(f"down_blocks.{i}", b) for i, b in enumerate(pspec.down)]
            + [("mid_block", pspec.mid)]
            + [(f"up_blocks.{i}", b) for i, b in enumerate(pspec.up)]
        )
        for kind, mods in (("resnets", b.resnets), ("attentions", b.transformers))
        for j, m in enumerate(mods)
        if m.dropped
    ]
    assert dropped, "fixture produced no dropped modules"
    sd = export_unet(pspec, pparams)
    for prefix, kind, j in dropped:
        assert not any(k.startswith(f"{prefix}.{kind}.{j}.") for k in sd), (
            prefix, kind, j,
        )
    # a surviving later-index module keeps its original position
    surviving = {
        f"{prefix}.{kind}.{j}."
        for prefix, b in (
            [(f"down_blocks.{i}", b) for i, b in enumerate(pspec.down)]
            + [("mid_block", pspec.mid)]
            + [(f"up_blocks.{i}", b) for i, b in enumerate(pspec.up)]
        )
        for kind, mods in (("resnets", b.resnets), ("attentions", b.transformers))
        for j, m in enumerate(mods)
        if not m.dropped
    }
    for pfx in surviving:
        assert any(k.startswith(pfx) for k in sd), pfx


def test_exported_sdxl_pruned_expert_matches_torch_mirror():
    """Exported SDXL pruned expert (text_time added_cond, multi-layer
    transformers with per-layer pruned heads/FF) golden vs the mirror."""
    pooled_dim, add_t_dim = 16, 8
    cfg = _tiny_cfg(
        down_block_types=("DownBlock2DHalfGated", "CrossAttnDownBlock2DHalfGated"),
        up_block_types=("CrossAttnUpBlock2DHalfGated", "UpBlock2DHalfGated"),
        addition_embed_type="text_time",
        addition_time_embed_dim=add_t_dim,
        projection_class_embeddings_input_dim=pooled_dim + 6 * add_t_dim,
    )
    spec = build_unet_spec(cfg)
    layout = gate_layout_for_config(cfg)
    params = convert_unet(synth_unet_state_dict(spec, seed=10), spec)
    pspec, pparams = materialize_pruned(
        spec, layout, params, _width_only_arch_vector(layout, seed=11)
    )
    sd_p = export_unet(pspec, pparams)
    assert "add_embedding.linear_1.weight" in sd_p

    rng = np.random.default_rng(17)
    b, lat = 2, cfg.sample_size
    sample = rng.standard_normal((b, lat, lat, cfg.in_channels)).astype(np.float32)
    context = rng.standard_normal((b, 5, cfg.cross_attention_dim)).astype(np.float32)
    timesteps = np.array([7.0, 850.0], np.float32)
    added = {
        "text_embeds": rng.standard_normal((b, pooled_dim)).astype(np.float32),
        "time_ids": np.tile(np.array([64, 64, 0, 0, 64, 64], np.float32)[None], (b, 1)),
    }

    want = torch_unet_forward(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd_p.items()},
        pspec,
        torch.from_numpy(sample.transpose(0, 3, 1, 2)),
        torch.from_numpy(timesteps),
        torch.from_numpy(context),
        added_cond={k: torch.from_numpy(v) for k, v in added.items()},
    ).numpy().transpose(0, 2, 3, 1)

    got = UNet2DConditionModel(pspec, dtype=jnp.float32).apply(
        {"params": pparams}, jnp.asarray(sample), jnp.asarray(timesteps),
        jnp.asarray(context), added_cond={k: jnp.asarray(v) for k, v in added.items()},
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


@pytest.mark.fast
def test_export_hypernet_golden_torch():
    """Exported hypernet state dict drives a plain-torch replica of the
    reference's weight-norm'd mh_fc stack (hypernet.py:25-53, torch
    parametrized naming) to the same logits as the Flax forward; and
    convert_hypernet round-trips it exactly."""
    import jax

    from unlearn_ft_tpu.models.export import export_hypernet
    from unlearn_ft_tpu.models.hypernet import HyperStructure, convert_hypernet

    cfg = _tiny_cfg()
    layout = gate_layout_for_config(cfg)
    hn = HyperStructure(layout, input_dim=12)
    params = hn.init(jax.random.PRNGKey(0), np.zeros((1, 12), np.float32))["params"]
    sd, hf_cfg = export_hypernet(params, layout)
    assert hf_cfg["structure"] == layout.nested_structure
    assert hf_cfg["input_dim"] == 12 and hf_cfg["wn_flag"] is True

    # round trip through the import converter: bit-exact
    rt = convert_hypernet(sd, layout)
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    flat_rt = dict(jax.tree_util.tree_flatten_with_path(rt)[0])
    for path, leaf in flat:
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(flat_rt[path]))

    # independent torch replica, strict load
    import torch.nn as tnn
    from torch.nn.utils.parametrizations import weight_norm

    mods = [tnn.Linear(12, w, bias=False) for w in layout.width_list]
    mods.append(tnn.Linear(12, layout.num_depth, bias=False))
    holder = tnn.Module()
    holder.mh_fc = tnn.ModuleList([weight_norm(m) for m in mods])
    holder.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True,
    )
    x = np.random.default_rng(1).standard_normal((3, 12)).astype(np.float32)
    with torch.no_grad():
        want = torch.cat([fc(torch.from_numpy(x)) for fc in holder.mh_fc], dim=1).numpy()
    got = hn.apply({"params": params}, np.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


@pytest.mark.fast
def test_export_quantizer_golden():
    import jax

    from unlearn_ft_tpu.models.export import export_quantizer
    from unlearn_ft_tpu.models.quantizer import QuantizerConfig

    layout = gate_layout_for_config(_tiny_cfg())
    qcfg = QuantizerConfig(layout=layout, n_e=4)
    qparams = qcfg.init_params(jax.random.PRNGKey(3))
    emb_gs = np.asarray(qcfg.init_state(qparams)["embedding_gs"])
    sd, hf_cfg = export_quantizer(qparams, emb_gs, layout, qcfg=qcfg)
    np.testing.assert_array_equal(sd["embedding.weight"], np.asarray(qparams["embedding"]))
    np.testing.assert_array_equal(sd["embedding_gs"], emb_gs)
    assert hf_cfg["n_e"] == 4 and hf_cfg["structure"] == layout.nested_structure
    assert sd["embedding.weight"].shape == (4, layout.total_dim)


def test_export_pruning_checkpoint_cli(tmp_path):
    """Pruning-checkpoint export: orbax tree -> hypernet/ + quantizer/ HF
    subfolders + quantizer_embeddings.pt (the reference fine-tune stage's
    inputs, trainer.py:2132-2163)."""
    import importlib.util
    import io

    import jax

    from unlearn_ft_tpu.models.hypernet import HyperStructure
    from unlearn_ft_tpu.models.quantizer import QuantizerConfig
    from unlearn_ft_tpu.training.checkpoint import CheckpointManager
    from unlearn_ft_tpu.training.trainer import unet_config_from
    from unlearn_ft_tpu.utils.config import load_config

    cfg_path = os.path.join(os.path.dirname(__file__), os.pardir, "configs",
                            "tests", "tiny_synthetic.yaml")
    config = load_config(cfg_path)
    layout = gate_layout_for_config(unet_config_from(config))
    hn = HyperStructure(layout, input_dim=12)
    hparams = hn.init(jax.random.PRNGKey(0), np.zeros((1, 12), np.float32))["params"]
    qcfg = QuantizerConfig(layout=layout, n_e=4)
    qparams = qcfg.init_params(jax.random.PRNGKey(1))
    emb_gs = np.asarray(qcfg.init_state(qparams)["embedding_gs"])

    mgr = CheckpointManager(str(tmp_path / "run"))
    buf = io.BytesIO()
    np.save(buf, emb_gs)
    mgr.save(7, {"trainable": {"hypernet": hparams, "quantizer": qparams},
                 "qstate_embedding_gs": emb_gs, "step": 7},
             extra_files={"quantizer_embeddings.npy": buf.getvalue()})
    mgr.wait()

    script = os.path.join(os.path.dirname(__file__), os.pardir, "scripts",
                          "export_checkpoint.py")
    mod_spec = importlib.util.spec_from_file_location("export_checkpoint2", script)
    mod = importlib.util.module_from_spec(mod_spec)
    mod_spec.loader.exec_module(mod)
    out = tmp_path / "exported"
    mod.main(["--checkpoint_dir", str(tmp_path / "run" / "checkpoint-7"),
              "--out_dir", str(out), "--base_config_path", cfg_path])

    import json

    from safetensors.numpy import load_file

    hsd = load_file(str(out / "hypernet" / "diffusion_pytorch_model.safetensors"))
    assert any(k.endswith("parametrizations.weight.original0") for k in hsd)
    hcfg = json.loads((out / "hypernet" / "config.json").read_text())
    assert hcfg["structure"] == layout.nested_structure
    qsd = load_file(str(out / "quantizer" / "diffusion_pytorch_model.safetensors"))
    np.testing.assert_array_equal(qsd["embedding_gs"], emb_gs)
    emb_pt = torch.load(str(out / "quantizer_embeddings.pt"), weights_only=True)
    np.testing.assert_allclose(np.asarray(emb_pt), emb_gs, atol=1e-6)


def test_export_checkpoint_cli(tmp_path):
    """CLI end-to-end: orbax checkpoint -> safetensors + arch_vector.pt."""
    import importlib.util
    import sys

    from unlearn_ft_tpu.training.checkpoint import CheckpointManager, spec_to_json

    cfg = _tiny_cfg()
    spec = build_unet_spec(cfg)
    layout = gate_layout_for_config(cfg)
    params = convert_unet(synth_unet_state_dict(spec, seed=6), spec)
    av = _width_only_arch_vector(layout, seed=7)
    pspec, pparams = materialize_pruned(spec, layout, params, av)

    mgr = CheckpointManager(str(tmp_path / "run"))
    mgr.save(3, {"params": pparams, "step": 3}, arch_vector=av,
             spec_json=spec_to_json(pspec))
    mgr.wait()

    script = os.path.join(os.path.dirname(__file__), os.pardir, "scripts",
                          "export_checkpoint.py")
    mod_spec = importlib.util.spec_from_file_location("export_checkpoint", script)
    mod = importlib.util.module_from_spec(mod_spec)
    mod_spec.loader.exec_module(mod)
    out = tmp_path / "exported"
    mod.main(["--checkpoint_dir", str(tmp_path / "run" / "checkpoint-3"),
              "--out_dir", str(out)])

    from safetensors.numpy import load_file

    sd = load_file(str(out / "diffusion_pytorch_model.safetensors"))
    ref = export_unet(pspec, pparams)
    assert set(sd) == set(ref)
    np.testing.assert_allclose(
        sd["conv_in.weight"], np.asarray(ref["conv_in.weight"]), atol=1e-6
    )
    av_pt = torch.load(str(out / "arch_vector.pt"), weights_only=True)
    np.testing.assert_array_equal(np.asarray(av_pt), av.astype(np.float32))
    assert (out / "unet_spec.json").exists()
