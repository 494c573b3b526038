"""Flax -> HF-torch (diffusers naming) state-dict export — the inverse of
``models/convert.py``, completing bidirectional checkpoint interop.

The reference consumes fine-tuned experts through
``UNet2DConditionModelPruned.from_pretrained(..., checkpoint_loading=True)``
(reference unet_2d_conditional.py:2185-2495): it rebuilds the pruned module
graph from ``arch_vector.pt`` and then ``load_state_dict``s an
already-pruned state dict in diffusers naming. ``export_unet`` emits exactly
that state dict from a ``(UNetSpec, params)`` pair:

- width-pruned tensors keep their sliced shapes (the reference's ``prune()``
  materializes the same slicing, blocks.py:434-475);
- depth-dropped modules emit NO keys while later survivors keep their
  ORIGINAL diffusers indices — matching the reference's in-place
  ``nn.Identity`` replacement (parameterless, blocks.py:651-663,1324-1336),
  which ``materialize_pruned`` mirrors by keeping ``dropped`` specs in
  position with their params removed;
- layout transposes are the exact inverses of convert.py's
  (Linear ``[in,out]->[out,in]``, Conv ``[h,w,in,out]->[out,in,h,w]``,
  Norm ``scale->weight``).

Host-side only — never part of any jitted program (excluded from bench's
exec fingerprint exactly like convert.py).
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from .unet_spec import UNetSpec


def _np(x) -> np.ndarray:
    return np.asarray(x)


def _ex_linear(dst: Dict, p: str, lp: Dict) -> None:
    dst[p + ".weight"] = _np(lp["kernel"]).T
    if "bias" in lp:
        dst[p + ".bias"] = _np(lp["bias"])


def _ex_conv(dst: Dict, p: str, cp: Dict) -> None:
    dst[p + ".weight"] = _np(cp["kernel"]).transpose(3, 2, 0, 1)
    if "bias" in cp:
        dst[p + ".bias"] = _np(cp["bias"])


def _ex_norm(dst: Dict, p: str, gp: Dict) -> None:
    dst[p + ".weight"] = _np(gp["scale"])
    dst[p + ".bias"] = _np(gp["bias"])


def _ex_resnet(dst: Dict, p: str, rp: Dict) -> None:
    _ex_norm(dst, p + ".norm1", rp["norm1"])
    _ex_conv(dst, p + ".conv1", rp["conv1"])
    _ex_linear(dst, p + ".time_emb_proj", rp["time_emb_proj"])
    _ex_norm(dst, p + ".norm2", rp["norm2"])
    _ex_conv(dst, p + ".conv2", rp["conv2"])
    if "conv_shortcut" in rp:
        _ex_conv(dst, p + ".conv_shortcut", rp["conv_shortcut"])


def _ex_attention(dst: Dict, p: str, ap: Dict) -> None:
    _ex_linear(dst, p + ".to_q", ap["to_q"])
    _ex_linear(dst, p + ".to_k", ap["to_k"])
    _ex_linear(dst, p + ".to_v", ap["to_v"])
    _ex_linear(dst, p + ".to_out.0", ap["to_out_0"])


def _ex_transformer(dst: Dict, p: str, tp: Dict, use_lp: bool, num_layers: int) -> None:
    proj = _ex_linear if use_lp else _ex_conv
    _ex_norm(dst, p + ".norm", tp["norm"])
    proj(dst, p + ".proj_in", tp["proj_in"])
    proj(dst, p + ".proj_out", tp["proj_out"])
    for li in range(num_layers):
        bp = tp[f"transformer_blocks_{li}"]
        tb = f"{p}.transformer_blocks.{li}"
        _ex_norm(dst, tb + ".norm1", bp["norm1"])
        _ex_attention(dst, tb + ".attn1", bp["attn1"])
        _ex_norm(dst, tb + ".norm2", bp["norm2"])
        _ex_attention(dst, tb + ".attn2", bp["attn2"])
        _ex_norm(dst, tb + ".norm3", bp["norm3"])
        _ex_linear(dst, tb + ".ff.net.0.proj", bp["ff"]["net_0"]["proj"])
        _ex_linear(dst, tb + ".ff.net.2", bp["ff"]["net_2"])


def export_unet(spec: UNetSpec, params: Dict) -> Dict[str, np.ndarray]:
    """``(spec, flax params)`` -> diffusers-named numpy state dict.

    ``params`` is the inner tree (no ``'params'`` wrapper), full or
    materialized-pruned. Exact inverse of ``convert.convert_unet`` on the
    keys it emits: dropped modules (absent from ``params``) emit nothing.
    """
    use_lp = any(t.use_linear_projection for b in spec.blocks for t in b.transformers)
    sd: Dict[str, np.ndarray] = {}
    _ex_conv(sd, "conv_in", params["conv_in"])
    _ex_linear(sd, "time_embedding.linear_1", params["time_embedding"]["linear_1"])
    _ex_linear(sd, "time_embedding.linear_2", params["time_embedding"]["linear_2"])
    if "add_embedding" in params:  # SDXL text_time conditioning
        _ex_linear(sd, "add_embedding.linear_1", params["add_embedding"]["linear_1"])
        _ex_linear(sd, "add_embedding.linear_2", params["add_embedding"]["linear_2"])
    _ex_norm(sd, "conv_norm_out", params["conv_norm_out"])
    _ex_conv(sd, "conv_out", params["conv_out"])

    def block(prefix: str, b, bp: Dict) -> None:
        for j, r in enumerate(b.resnets):
            rp = bp.get(f"resnets_{j}")
            if rp is not None:  # dropped resnets export no keys
                _ex_resnet(sd, f"{prefix}.resnets.{j}", rp)
        for j, t in enumerate(b.transformers):
            tp = bp.get(f"attentions_{j}")
            if tp is not None:
                _ex_transformer(sd, f"{prefix}.attentions.{j}", tp, use_lp, t.num_layers)
        if b.add_sampler:
            if b.kind == "down":
                _ex_conv(sd, f"{prefix}.downsamplers.0.conv", bp["downsamplers_0"]["conv"])
            else:
                _ex_conv(sd, f"{prefix}.upsamplers.0.conv", bp["upsamplers_0"]["conv"])

    for i, b in enumerate(spec.down):
        block(f"down_blocks.{i}", b, params[f"down_blocks_{i}"])
    block("mid_block", spec.mid, params["mid_block"])
    for i, b in enumerate(spec.up):
        block(f"up_blocks.{i}", b, params[f"up_blocks_{i}"])
    return sd


def save_state_dict(sd: Dict[str, np.ndarray], path: str) -> None:
    """Write a numpy state dict as ``.safetensors`` (torch-free, via
    safetensors.numpy) or ``.bin`` (torch.save of torch tensors) by
    extension — the two formats the reference's loaders read
    (unet_2d_conditional.py:2412-2427)."""
    arrays = {k: np.ascontiguousarray(v) for k, v in sd.items()}
    if path.endswith(".safetensors"):
        from safetensors.numpy import save_file

        save_file(arrays, path)
    elif path.endswith(".bin") or path.endswith(".pt"):
        import torch

        torch.save({k: torch.from_numpy(v) for k, v in arrays.items()}, path)
    else:
        raise ValueError(f"unsupported state-dict extension: {path}")


def export_hypernet(params: Dict, layout) -> (dict, dict):
    """Flax hypernet params -> (torch state dict, HF config dict) in the
    reference's format: ``HyperStructure`` with torch parametrized
    weight-norm naming (``mh_fc.{i}.parametrizations.weight.original0/1``,
    reference hypernet.py:25-53 — one Linear per width gate + one depth
    head, weight-norm'd) and a ``config.json`` whose ``structure`` is the
    nested width/depth dict ``HyperStructure.from_pretrained`` rebuilds
    from. Inverse of ``hypernet.convert_hypernet``."""
    sd: Dict[str, np.ndarray] = {}
    if "arch" in params:  # single_arch_param variant (hypernet.py:38-41)
        sd["arch"] = _np(params["arch"])
        cfg = {
            "_class_name": "HyperStructure",
            "structure": layout.nested_structure,
            "input_dim": 768,
            "wn_flag": True,
            "linear_bias": False,
            "single_arch_param": True,
        }
        return sd, cfg

    input_dim = None
    wn = False
    linear_bias = False
    n_layers = len(layout.width_list) + 1
    for i in range(n_layers):
        entry = params.get(f"mh_fc_{i}")
        if entry is None:  # zero-width depth head (no depth gates in layout)
            continue
        p = f"mh_fc.{i}"
        if "g" in entry:  # weight-norm: g [out], v stored transposed [in, out]
            wn = True
            v = _np(entry["v"]).T  # -> torch [out, in]
            sd[p + ".parametrizations.weight.original0"] = _np(entry["g"]).reshape(-1, 1)
            sd[p + ".parametrizations.weight.original1"] = v
            input_dim = v.shape[1]
        else:
            w = _np(entry["kernel"]).T
            sd[p + ".weight"] = w
            input_dim = w.shape[1]
        if "bias" in entry:
            linear_bias = True
            sd[p + ".bias"] = _np(entry["bias"])
    cfg = {
        "_class_name": "HyperStructure",
        "structure": layout.nested_structure,
        "input_dim": int(input_dim),
        "wn_flag": bool(wn),
        "linear_bias": bool(linear_bias),
        "single_arch_param": False,
    }
    return sd, cfg


def export_quantizer(qparams: Dict, embedding_gs: np.ndarray, layout,
                     qcfg=None) -> (dict, dict):
    """Flax quantizer params + relaxed codebook -> (torch state dict, HF
    config dict) for the reference's ``StructureVectorQuantizer``
    (quantizer.py:24-111: ``embedding.weight`` + the non-grad
    ``embedding_gs`` Parameter)."""
    emb = _np(qparams["embedding"])
    sd = {
        "embedding.weight": emb,
        "embedding_gs": _np(embedding_gs),
    }
    cfg = {
        "_class_name": "StructureVectorQuantizer",
        "n_e": int(emb.shape[0]),
        "structure": layout.nested_structure,
    }
    if qcfg is not None:
        cfg.update(
            temperature=float(qcfg.temperature),
            base=float(qcfg.base),
            non_zero_width=bool(qcfg.non_zero_width),
            optimal_transport=bool(qcfg.optimal_transport),
            resource_aware_normalization=bool(qcfg.resource_aware_normalization),
            depth_order=(list(qcfg.depth_order) if qcfg.depth_order else None),
        )
    return sd, cfg


def save_arch_vector_pt(arch_vector: np.ndarray, path: str) -> None:
    """Write the expert's arch vector as the reference's ``arch_vector.pt``
    sidecar (torch tensor, saved by UnetFineTuner.init_models
    trainer.py:2159-2163 and read back by UNet2DConditionModelPruned
    unet_2d_conditional.py:2428-2443)."""
    import torch

    torch.save(torch.from_numpy(np.asarray(arch_vector, np.float32)), path)
