"""Static architecture specs for the (gated / pruned) SD U-Net.

TPU-native replacement for the reference's three U-Net classes
(UNet2DConditionModelGated / Pruned / MagnitudePruned,
pdm/models/unet/unet_2d_conditional.py:627-2928): instead of mutating torch
modules in place (``prune()`` swaps smaller nn.Conv/nn.Linear into the tree),
the architecture is a frozen *spec* pytree of static shapes. One Flax module
tree reads the spec; pruning is a host-side transform
(spec, params, hard arch vector) -> (smaller spec, sliced params).

This keeps every XLA graph shape-static (required for MXU tiling) and makes
an "expert" a pure data artifact: (spec json, params) — directly analogous
to the reference's arch_vector.pt + safetensors contract.
"""
from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..utils.arch import GateLayout, unet_gate_layout


# ---------------------------------------------------------------------------
# Specs
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ResnetSpec:
    in_channels: int
    out_channels: int
    hidden_channels: int  # conv1 output; < out_channels after width pruning
    norm1_groups: int
    norm2_groups: int
    gate_width: int  # runtime width-gate group count
    eps: float = 1e-5
    has_width_gate: bool = False
    has_depth_gate: bool = False
    dropped: bool = False
    skip_channels: int = 0  # concat tail that a dropped resnet discards
    is_input_concatenated: bool = False

    @property
    def use_shortcut(self) -> bool:
        return self.in_channels != self.out_channels


@dataclass(frozen=True)
class TransformerSpec:
    """One Transformer2DModel: ``num_layers`` BasicTransformerBlocks (SDXL has
    up to 10); per-layer head/neuron counts since every layer is gated and
    pruned independently."""

    in_channels: int
    heads: Tuple[int, ...]  # attn1 (self) heads per layer after pruning
    heads2: Tuple[int, ...]  # attn2 (cross) heads per layer — gated independently
    head_dim: int
    cross_attention_dim: int
    ff_inner: Tuple[int, ...]  # per layer
    ff_gate_width: int = 32
    norm_groups: int = 32
    use_linear_projection: bool = True
    upcast_attention: bool = True
    gated_ff: bool = True
    has_width_gates: bool = False
    has_depth_gate: bool = False
    dropped: bool = False

    @property
    def num_layers(self) -> int:
        return len(self.heads)


@dataclass(frozen=True)
class BlockSpec:
    kind: str  # 'down' | 'mid' | 'up'
    block_type: str
    resnets: Tuple[ResnetSpec, ...]
    transformers: Tuple[TransformerSpec, ...]
    add_sampler: bool = False  # down/up-sampler at the end
    sampler_out_channels: int = 0

    @property
    def has_cross_attention(self) -> bool:
        return len(self.transformers) > 0


@dataclass(frozen=True)
class UNetSpec:
    sample_size: int
    in_channels: int
    out_channels: int
    block_out_channels: Tuple[int, ...]
    time_embed_dim: int
    cross_attention_dim: int
    norm_num_groups: int
    norm_eps: float
    flip_sin_to_cos: bool
    freq_shift: float
    down: Tuple[BlockSpec, ...]
    mid: BlockSpec
    up: Tuple[BlockSpec, ...]
    addition_embed_type: Optional[str] = None
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: int = 2816

    @property
    def blocks(self) -> Tuple[BlockSpec, ...]:
        return self.down + (self.mid,) + self.up


# ---------------------------------------------------------------------------
# Config -> spec
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class UNetConfig:
    """Diffusers-compatible config surface (defaults = SD-2.1 with the
    reference's HalfGated block types, configs/baselines/*.yaml)."""

    sample_size: int = 64
    in_channels: int = 4
    out_channels: int = 4
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock2DHalfGated",
        "CrossAttnDownBlock2DHalfGated",
        "CrossAttnDownBlock2DHalfGated",
        "DownBlock2DHalfGated",
    )
    mid_block_type: str = "UNetMidBlock2DCrossAttnWidthGated"
    up_block_types: Tuple[str, ...] = (
        "UpBlock2DHalfGated",
        "CrossAttnUpBlock2DHalfGated",
        "CrossAttnUpBlock2DHalfGated",
        "CrossAttnUpBlock2DHalfGated",
    )
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    transformer_layers_per_block: Tuple[int, ...] = (1, 1, 1, 1)  # SDXL: (1, 2, 10)
    num_attention_heads: Tuple[int, ...] = (5, 10, 20, 20)
    cross_attention_dim: int = 1024
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    use_linear_projection: bool = True
    upcast_attention: bool = True
    gated_ff: bool = True
    ff_gate_width: int = 32
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0
    # SDXL micro-conditioning (addition_embed_type="text_time")
    addition_embed_type: Optional[str] = None
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: int = 2816


def _tlpb(cfg: UNetConfig):
    t = cfg.transformer_layers_per_block
    n = len(cfg.block_out_channels)
    if isinstance(t, int):
        return (t,) * n
    if len(t) < n:
        return tuple(t) + (t[-1],) * (n - len(t))
    return tuple(t)[:n]


def _gating_mode(block_type: str) -> str:
    if block_type.endswith("HalfGated"):
        return "half"
    if block_type.endswith("Gated"):  # includes mid 'WidthGated' handled separately
        return "full"
    return "none"


def _make_resnet(in_ch, out_ch, groups, eps, mode, is_last, kind, skip_ch) -> ResnetSpec:
    has_w = mode in ("half", "full")
    has_d = (mode == "full") or (mode == "half" and is_last)
    if has_d and kind == "down" and in_ch != out_ch:
        # the depth lerp (1-g)*x + g*f(x) needs an identity path; a
        # channel-changing resnet has none (the reference's gated registry
        # only ever depth-gates channel-preserving positions — SD-2.1 has
        # layers_per_block=2, so the last resnet of every down block maps
        # out_ch->out_ch; up blocks always end channel-preserving since
        # they run layers_per_block+1 resnets)
        raise ValueError(
            f"depth gate on a channel-changing down-block resnet "
            f"({in_ch}->{out_ch}): the depth lerp has no identity path. "
            f"Use layers_per_block>=2, equal block_out_channels, or an "
            f"ungated block type for this block."
        )
    return ResnetSpec(
        in_channels=in_ch,
        out_channels=out_ch,
        hidden_channels=out_ch,
        norm1_groups=groups,
        norm2_groups=groups,
        gate_width=groups,
        eps=eps,
        has_width_gate=has_w,
        has_depth_gate=has_d,
        skip_channels=skip_ch if has_d else 0,
        is_input_concatenated=(kind == "up"),
    )


def _make_transformer(
    cfg: UNetConfig, channels, heads, mode, is_last, width_only=False, num_layers=1
):
    has_w = mode in ("half", "full")
    has_d = (not width_only) and ((mode == "full") or (mode == "half" and is_last))
    return TransformerSpec(
        in_channels=channels,
        heads=(heads,) * num_layers,
        heads2=(heads,) * num_layers,
        head_dim=channels // heads,
        cross_attention_dim=cfg.cross_attention_dim,
        ff_inner=(channels * 4,) * num_layers,
        ff_gate_width=cfg.ff_gate_width,
        norm_groups=cfg.norm_num_groups,
        use_linear_projection=cfg.use_linear_projection,
        upcast_attention=cfg.upcast_attention,
        gated_ff=cfg.gated_ff,
        has_width_gates=has_w,
        has_depth_gate=has_d,
    )


def build_unet_spec(cfg: UNetConfig) -> UNetSpec:
    """Mirror of diffusers' UNet2DConditionModel wiring with the reference's
    gated block registry (unet_2d_conditional.py:90-624)."""
    g, eps = cfg.norm_num_groups, cfg.norm_eps
    down: List[BlockSpec] = []
    output_channel = cfg.block_out_channels[0]
    for i, bt in enumerate(cfg.down_block_types):
        input_channel = output_channel
        output_channel = cfg.block_out_channels[i]
        is_final = i == len(cfg.block_out_channels) - 1
        mode = _gating_mode(bt)
        n = cfg.layers_per_block
        resnets = tuple(
            _make_resnet(
                input_channel if j == 0 else output_channel,
                output_channel,
                g,
                eps,
                mode,
                j == n - 1,
                "down",
                0,
            )
            for j in range(n)
        )
        transformers: Tuple[TransformerSpec, ...] = ()
        if "CrossAttn" in bt:
            transformers = tuple(
                _make_transformer(
                    cfg, output_channel, cfg.num_attention_heads[i], mode, j == n - 1,
                    num_layers=_tlpb(cfg)[i],
                )
                for j in range(n)
            )
        down.append(
            BlockSpec("down", bt, resnets, transformers, not is_final, output_channel)
        )

    mid_ch = cfg.block_out_channels[-1]
    mid_gated = cfg.mid_block_type.endswith("WidthGated")
    mid_mode = "half" if mid_gated else "none"  # width-only: no depth gates
    mid_resnets = tuple(
        replace(
            _make_resnet(mid_ch, mid_ch, g, eps, mid_mode, False, "mid", 0),
            has_depth_gate=False,
        )
        for _ in range(2)
    )
    mid_transformers = tuple(
        [
            _make_transformer(
                cfg, mid_ch, cfg.num_attention_heads[-1], mid_mode, False,
                width_only=True, num_layers=_tlpb(cfg)[-1],
            )
        ]
    )
    mid = BlockSpec("mid", cfg.mid_block_type, mid_resnets, mid_transformers, False, 0)

    up: List[BlockSpec] = []
    reversed_channels = tuple(reversed(cfg.block_out_channels))
    reversed_heads = tuple(reversed(cfg.num_attention_heads))
    output_channel = reversed_channels[0]
    for i, bt in enumerate(cfg.up_block_types):
        prev_output = output_channel
        output_channel = reversed_channels[i]
        input_channel = reversed_channels[min(i + 1, len(cfg.block_out_channels) - 1)]
        is_final = i == len(cfg.block_out_channels) - 1
        mode = _gating_mode(bt)
        n = cfg.layers_per_block + 1
        resnets = []
        for j in range(n):
            res_skip = input_channel if j == n - 1 else output_channel
            res_in = prev_output if j == 0 else output_channel
            resnets.append(
                _make_resnet(
                    res_in + res_skip, output_channel, g, eps, mode, j == n - 1, "up", res_skip
                )
            )
        transformers = ()
        if "CrossAttn" in bt:
            transformers = tuple(
                _make_transformer(
                    cfg, output_channel, reversed_heads[i], mode, j == n - 1,
                    num_layers=tuple(reversed(_tlpb(cfg)))[i],
                )
                for j in range(n)
            )
        up.append(BlockSpec("up", bt, tuple(resnets), transformers, not is_final, output_channel))

    return UNetSpec(
        sample_size=cfg.sample_size,
        in_channels=cfg.in_channels,
        out_channels=cfg.out_channels,
        block_out_channels=cfg.block_out_channels,
        time_embed_dim=cfg.block_out_channels[0] * 4,
        cross_attention_dim=cfg.cross_attention_dim,
        norm_num_groups=g,
        norm_eps=eps,
        flip_sin_to_cos=cfg.flip_sin_to_cos,
        freq_shift=cfg.freq_shift,
        down=tuple(down),
        mid=mid,
        up=tuple(up),
        addition_embed_type=cfg.addition_embed_type,
        addition_time_embed_dim=cfg.addition_time_embed_dim,
        projection_class_embeddings_input_dim=cfg.projection_class_embeddings_input_dim,
    )


def gate_layout_for_config(cfg: UNetConfig) -> GateLayout:
    return unet_gate_layout(
        down_block_types=cfg.down_block_types,
        mid_block_type=cfg.mid_block_type,
        up_block_types=cfg.up_block_types,
        num_attention_heads=cfg.num_attention_heads,
        layers_per_block=cfg.layers_per_block,
        gated_ff=cfg.gated_ff,
        ff_gate_width=cfg.ff_gate_width,
        resnet_groups=cfg.norm_num_groups,
        transformer_layers_per_block=_tlpb(cfg),
    )


def sd21_unet_config() -> UNetConfig:
    return UNetConfig()


def sdxl_unet_config() -> UNetConfig:
    """SDXL-base shapes with the reference's HalfGated block types
    (SDXLPruner path, trainer.py:1472-1593 — dual text encoders feed a
    2048-d context + pooled micro-conditioning)."""
    return UNetConfig(
        sample_size=128,
        block_out_channels=(320, 640, 1280),
        layers_per_block=2,
        transformer_layers_per_block=(1, 2, 10),
        num_attention_heads=(5, 10, 20),
        cross_attention_dim=2048,
        down_block_types=(
            "DownBlock2DHalfGated",
            "CrossAttnDownBlock2DHalfGated",
            "CrossAttnDownBlock2DHalfGated",
        ),
        up_block_types=(
            "CrossAttnUpBlock2DHalfGated",
            "CrossAttnUpBlock2DHalfGated",
            "UpBlock2DHalfGated",
        ),
        addition_embed_type="text_time",
        projection_class_embeddings_input_dim=2816,
    )


# ---------------------------------------------------------------------------
# Materialized pruning (host-side, numpy): spec + params + hard arch vector
# -> smaller spec + sliced params.
# Mirrors UNet2DConditionModelPruned.from_pretrained + per-module prune()
# (unet_2d_conditional.py:2183-2495; blocks.py:434-475, 162-196, 61-76).
# ---------------------------------------------------------------------------

def _hard_masks(layout: GateLayout, arch_vector: np.ndarray, force_width_non_zero: bool):
    arch_vector = np.asarray(arch_vector)
    if arch_vector.ndim == 2:
        arch_vector = arch_vector[0]
    assert arch_vector.shape[0] == layout.total_dim
    widths: List[np.ndarray] = []
    start = 0
    for w in layout.width_list:
        v = arch_vector[start : start + w].copy()
        if force_width_non_zero and not (v >= 0.5).any():
            v[0] += 0.5
        widths.append(v >= 0.5)
        start += w
    depths = [bool(arch_vector[start + i] >= 0.5) for i in range(layout.num_depth)]
    return widths, depths


class _Cursor:
    def __init__(self, widths, depths):
        self.widths, self.depths = list(widths), list(depths)

    def width(self) -> np.ndarray:
        return self.widths.pop(0)

    def depth(self) -> bool:
        return self.depths.pop(0)


def _slice_resnet(spec: ResnetSpec, p: Dict, cur: _Cursor) -> Tuple[ResnetSpec, Optional[Dict]]:
    if not (spec.has_width_gate or spec.has_depth_gate):
        return spec, p
    keep = True
    if spec.has_depth_gate:
        keep = None  # resolved below, after popping in canonical order
    wmask = cur.width() if spec.has_width_gate else None
    if spec.has_depth_gate:
        keep = cur.depth()
    if not keep:
        return replace(spec, dropped=True, has_width_gate=False, has_depth_gate=False), None
    new_spec = replace(spec, has_width_gate=False, has_depth_gate=False)
    if wmask is None:
        return new_spec, p
    group_dim = spec.hidden_channels // spec.gate_width
    ch = np.repeat(wmask, group_dim)
    kept_groups = int(wmask.sum())
    q = dict(p)
    q["conv1"] = {
        "kernel": np.asarray(p["conv1"]["kernel"])[..., ch],
        "bias": np.asarray(p["conv1"]["bias"])[ch],
    }
    q["time_emb_proj"] = {
        "kernel": np.asarray(p["time_emb_proj"]["kernel"])[:, ch],
        "bias": np.asarray(p["time_emb_proj"]["bias"])[ch],
    }
    q["norm2"] = {
        "scale": np.asarray(p["norm2"]["scale"])[ch],
        "bias": np.asarray(p["norm2"]["bias"])[ch],
    }
    q["conv2"] = {
        "kernel": np.asarray(p["conv2"]["kernel"])[:, :, ch, :],
        "bias": np.asarray(p["conv2"]["bias"]),
    }
    return (
        replace(new_spec, hidden_channels=kept_groups * group_dim, norm2_groups=kept_groups),
        q,
    )


def _slice_attention(p: Dict, hmask: np.ndarray, head_dim: int) -> Dict:
    kept = int(hmask.sum())
    q = {}
    for name in ("to_q", "to_k", "to_v"):
        kern = np.asarray(p[name]["kernel"])  # (in, heads*hd)
        kern = kern.reshape(kern.shape[0], -1, head_dim)[:, hmask].reshape(
            kern.shape[0], kept * head_dim
        )
        q[name] = {"kernel": kern}
    out_k = np.asarray(p["to_out_0"]["kernel"])  # (heads*hd, out)
    out_k = out_k.reshape(-1, head_dim, out_k.shape[-1])[hmask].reshape(
        kept * head_dim, out_k.shape[-1]
    )
    q["to_out_0"] = {"kernel": out_k, "bias": np.asarray(p["to_out_0"]["bias"])}
    return q


def _slice_transformer(
    spec: TransformerSpec, p: Dict, cur: _Cursor
) -> Tuple[TransformerSpec, Optional[Dict]]:
    if not (spec.has_width_gates or spec.has_depth_gate):
        return spec, p
    layer_masks = []
    for _ in range(spec.num_layers):
        if spec.has_width_gates:
            m1 = cur.width()
            m2 = cur.width()
            mff = cur.width() if spec.gated_ff else None
        else:
            m1 = m2 = mff = None
        layer_masks.append((m1, m2, mff))
    keep = cur.depth() if spec.has_depth_gate else True
    if not keep:
        return (
            replace(spec, dropped=True, has_width_gates=False, has_depth_gate=False),
            None,
        )
    new_spec = replace(spec, has_width_gates=False, has_depth_gate=False)
    if not spec.has_width_gates:
        return new_spec, p

    q = dict(p)
    heads_kept, heads2_kept, ff_kept = [], [], []
    for li, (m1, m2, mff) in enumerate(layer_masks):
        src = p[f"transformer_blocks_{li}"]
        tb = dict(src)
        tb["attn1"] = _slice_attention(src["attn1"], m1, spec.head_dim)
        tb["attn2"] = _slice_attention(src["attn2"], m2, spec.head_dim)
        heads_kept.append(int(m1.sum()))
        heads2_kept.append(int(m2.sum()))
        if mff is not None:
            neuron = np.repeat(mff, spec.ff_inner[li] // spec.ff_gate_width)
            ff = dict(tb["ff"])
            proj_k = np.asarray(src["ff"]["net_0"]["proj"]["kernel"])
            proj_b = np.asarray(src["ff"]["net_0"]["proj"]["bias"])
            col = np.concatenate([neuron, neuron])
            ff["net_0"] = {"proj": {"kernel": proj_k[:, col], "bias": proj_b[col]}}
            net2_k = np.asarray(src["ff"]["net_2"]["kernel"])
            ff["net_2"] = {
                "kernel": net2_k[neuron, :],
                "bias": np.asarray(src["ff"]["net_2"]["bias"]),
            }
            tb["ff"] = ff
            ff_kept.append(int(neuron.sum()))
        else:
            ff_kept.append(spec.ff_inner[li])
        q[f"transformer_blocks_{li}"] = tb
    return (
        replace(new_spec, heads=tuple(heads_kept), heads2=tuple(heads2_kept),
                ff_inner=tuple(ff_kept)),
        q,
    )


def materialize_pruned(
    spec: UNetSpec,
    layout: GateLayout,
    params: Dict,
    arch_vector: np.ndarray,
    force_width_non_zero: bool = True,
) -> Tuple[UNetSpec, Dict]:
    """Produce the physically smaller expert U-Net.

    ``params`` is the flax params dict of the *gated/full* model (inner tree,
    no 'params' wrapper). Returns (pruned UNetSpec, pruned params dict).
    Both attention gates of a transformer share one mask semantics with the
    reference (attn1/attn2 pruned by their own mask vectors).
    """
    widths, depths = _hard_masks(layout, arch_vector, force_width_non_zero)
    cur = _Cursor(widths, depths)
    new_params = dict(params)

    def do_block(block: BlockSpec, bp: Dict) -> Tuple[BlockSpec, Dict]:
        bq = dict(bp)
        new_resnets = []
        for j, r in enumerate(block.resnets):
            rname = f"resnets_{j}"
            rspec, rp = _slice_resnet(r, bp.get(rname, {}), cur)
            new_resnets.append(rspec)
            if rp is None:
                bq.pop(rname, None)
            else:
                bq[rname] = rp
        new_tfs = []
        for j, t in enumerate(block.transformers):
            tname = f"attentions_{j}"
            tspec, tp = _slice_transformer(t, bp.get(tname, {}), cur)
            new_tfs.append(tspec)
            if tp is None:
                bq.pop(tname, None)
            else:
                bq[tname] = tp
        return replace(block, resnets=tuple(new_resnets), transformers=tuple(new_tfs)), bq

    new_down = []
    for i, b in enumerate(spec.down):
        nb, bq = do_block(b, params[f"down_blocks_{i}"])
        new_down.append(nb)
        new_params[f"down_blocks_{i}"] = bq
    new_mid, mq = do_block(spec.mid, params["mid_block"])
    new_params["mid_block"] = mq
    new_up = []
    for i, b in enumerate(spec.up):
        nb, bq = do_block(b, params[f"up_blocks_{i}"])
        new_up.append(nb)
        new_params[f"up_blocks_{i}"] = bq

    assert not cur.widths and not cur.depths, "gate cursor not fully consumed"
    new_spec = replace(spec, down=tuple(new_down), mid=new_mid, up=tuple(new_up))
    return new_spec, new_params
