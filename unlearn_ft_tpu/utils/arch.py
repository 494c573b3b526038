"""Architecture-vector layout: the contract between hypernet/quantizer
checkpoints and the gated/pruned U-Net.

The reference encodes this layout implicitly in Python list-traversal order
(get_structure/set_structure, pdm/models/unet/unet_2d_conditional.py:1334-1415
and per-block get_gate_structure, pdm/models/unet/blocks.py). Any ordering
mismatch silently mis-wires experts, so here the layout is an explicit,
serializable manifest built once from the model config.

Canonical ordering (must match the reference exactly):
  * blocks: down blocks -> mid block -> up blocks
  * within a block: ALL resnets first, then ALL attentions
    (even though the forward pass interleaves them)
  * per resnet: one width gate over the GroupNorm groups (32)
  * per transformer: [attn1 heads, attn2 heads, ff neuron groups (32)]
  * flat arch vector: [all width gates concatenated][one scalar per depth gate]

"Half"-gated blocks depth-gate only their LAST resnet and LAST transformer
(blocks.py:1573-1706, 2187-2314, 2316-2447); fully "Gated" blocks depth-gate
every layer; the mid block is width-gated only (blocks.py:2450-2632).
"""
from __future__ import annotations

import json
from dataclasses import dataclass
from typing import List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class Structure(NamedTuple):
    """Runtime gate values: one [B, w] array per width gate, one [B] array per
    depth gate, in canonical layout order. A valid JAX pytree."""

    width: Tuple[jax.Array, ...]
    depth: Tuple[jax.Array, ...]


@dataclass(frozen=True)
class SubmoduleGates:
    kind: str  # 'resnet' | 'transformer'
    widths: Tuple[int, ...]
    depth: int  # 1 if this submodule has a depth gate else 0


@dataclass(frozen=True)
class BlockGates:
    name: str  # block type string (reference registry names)
    submodules: Tuple[SubmoduleGates, ...]


@dataclass(frozen=True)
class GateLayout:
    blocks: Tuple[BlockGates, ...]

    # ---- derived views -------------------------------------------------
    @property
    def submodules(self) -> Tuple[SubmoduleGates, ...]:
        return tuple(s for b in self.blocks for s in b.submodules)

    @property
    def nested_structure(self) -> dict:
        """The reference's get_structure() form:
        {'width': [[...] per submodule], 'depth': [[0|1] per submodule]}."""
        return {
            "width": [list(s.widths) for s in self.submodules],
            "depth": [[s.depth] for s in self.submodules],
        }

    @property
    def width_list(self) -> List[int]:
        return [w for s in self.submodules for w in s.widths]

    @property
    def depth_list(self) -> List[int]:
        return [s.depth for s in self.submodules]

    @property
    def num_width(self) -> int:
        return sum(self.width_list)

    @property
    def num_depth(self) -> int:
        return sum(self.depth_list)

    @property
    def total_dim(self) -> int:
        return self.num_width + self.num_depth

    # ---- flat <-> structured -------------------------------------------
    def split(self, flat: jax.Array) -> Structure:
        """Flat [B, total_dim] -> Structure. Mirrors
        HyperStructure.transform_structure_vector (hypernet.py:83-98)."""
        assert flat.ndim == 2 and flat.shape[1] == self.total_dim, (
            f"arch vector dim {flat.shape} != layout {self.total_dim}"
        )
        widths = []
        start = 0
        for w in self.width_list:
            widths.append(flat[:, start : start + w])
            start += w
        depths = [flat[:, start + i] for i in range(self.num_depth)]
        return Structure(width=tuple(widths), depth=tuple(depths))

    def merge(self, structure: Structure) -> jax.Array:
        parts = list(structure.width) + [d[:, None] for d in structure.depth]
        return jnp.concatenate(parts, axis=1)

    def split_per_block(self, structure: Structure) -> List[Structure]:
        """Slice a full Structure into per-block Structures, in block order."""
        out = []
        wi, di = 0, 0
        for b in self.blocks:
            nw = sum(len(s.widths) for s in b.submodules)
            nd = sum(s.depth for s in b.submodules)
            out.append(
                Structure(
                    width=structure.width[wi : wi + nw],
                    depth=structure.depth[di : di + nd],
                )
            )
            wi += nw
            di += nd
        return out

    def ones(self, batch: int, dtype=jnp.float32) -> Structure:
        """All-on gates (teacher pass, reference trainer.py:1252-1257)."""
        return Structure(
            width=tuple(jnp.ones((batch, w), dtype) for w in self.width_list),
            depth=tuple(jnp.ones((batch,), dtype) for _ in range(self.num_depth)),
        )

    def random_arch_vector(self, target_ratio: float, seed: int = 0) -> np.ndarray:
        """Random baseline arch vector: each width group keeps
        ceil-free int(ratio*w) entries at 0.9; all depth bits 0.9.
        Mirrors HyperStructure.get_random_arch_vector (hypernet.py:128-150)."""
        rng = np.random.default_rng(seed)
        parts = []
        for w in self.width_list:
            v = np.zeros((1, w), dtype=np.float32)
            k = int(target_ratio * w)
            idx = rng.permutation(w)[:k]
            v[0, idx] = 0.9
            parts.append(v)
        parts.append(np.full((1, self.num_depth), 0.9, dtype=np.float32))
        return np.concatenate(parts, axis=1)

    # ---- serialization (manifest) ---------------------------------------
    def to_json(self) -> str:
        return json.dumps(
            [
                {
                    "name": b.name,
                    "submodules": [
                        {"kind": s.kind, "widths": list(s.widths), "depth": s.depth}
                        for s in b.submodules
                    ],
                }
                for b in self.blocks
            ]
        )

    @classmethod
    def from_json(cls, text: str) -> "GateLayout":
        blocks = []
        for b in json.loads(text):
            subs = tuple(
                SubmoduleGates(s["kind"], tuple(s["widths"]), s["depth"])
                for s in b["submodules"]
            )
            blocks.append(BlockGates(b["name"], subs))
        return cls(tuple(blocks))


# --------------------------------------------------------------------------
# Layout builders from U-Net block-type configs (reference registry names,
# unet_2d_conditional.py:90-342 / 382-624).
# --------------------------------------------------------------------------

def _resnet(depth: int, groups: int = 32) -> SubmoduleGates:
    return SubmoduleGates("resnet", (groups,), depth)


def _transformer(
    heads: int, depth: int, gated_ff: bool, ff_gate_width: int, num_layers: int = 1
) -> SubmoduleGates:
    per_layer = (heads, heads, ff_gate_width) if gated_ff else (heads, heads)
    return SubmoduleGates("transformer", per_layer * num_layers, depth)


def _block_gates(
    block_type: str,
    num_layers: int,
    heads: int,
    gated_ff: bool,
    ff_gate_width: int,
    resnet_groups: int = 32,
    transformer_layers: int = 1,
) -> BlockGates:
    subs: List[SubmoduleGates] = []
    bt = block_type
    tl = transformer_layers
    if bt in ("CrossAttnDownBlock2DHalfGated", "CrossAttnUpBlock2DHalfGated"):
        subs += [_resnet(0, resnet_groups)] * (num_layers - 1) + [_resnet(1, resnet_groups)]
        subs += [_transformer(heads, 0, gated_ff, ff_gate_width, tl)] * (num_layers - 1)
        subs += [_transformer(heads, 1, gated_ff, ff_gate_width, tl)]
    elif bt in ("CrossAttnDownBlock2DGated", "CrossAttnUpBlock2DGated"):
        subs += [_resnet(1, resnet_groups)] * num_layers
        subs += [_transformer(heads, 1, gated_ff, ff_gate_width, tl)] * num_layers
    elif bt in ("DownBlock2DHalfGated", "UpBlock2DHalfGated"):
        subs += [_resnet(0, resnet_groups)] * (num_layers - 1) + [_resnet(1, resnet_groups)]
    elif bt in ("DownBlock2DGated", "UpBlock2DGated"):
        subs += [_resnet(1, resnet_groups)] * num_layers
    elif bt == "UNetMidBlock2DCrossAttnWidthGated":
        # mid: num_layers(=1)+1 resnets then num_layers attentions, width-only
        subs += [_resnet(0, resnet_groups)] * (num_layers + 1)
        subs += [_transformer(heads, 0, gated_ff, ff_gate_width, tl)] * num_layers
    elif bt in ("DownBlock2D", "UpBlock2D", "CrossAttnDownBlock2D", "CrossAttnUpBlock2D",
                "UNetMidBlock2DCrossAttn"):
        pass  # ungated
    else:
        raise ValueError(f"unknown block type {bt}")
    return BlockGates(bt, tuple(subs))


def unet_gate_layout(
    down_block_types: Sequence[str],
    mid_block_type: str,
    up_block_types: Sequence[str],
    num_attention_heads: Sequence[int],
    layers_per_block: int = 2,
    gated_ff: bool = True,
    ff_gate_width: int = 32,
    resnet_groups: int = 32,
    transformer_layers_per_block=None,
) -> GateLayout:
    """Build the canonical gate layout for a (gated) SD-style U-Net config.

    ``num_attention_heads`` is per down-block (e.g. SD-2.1: [5, 10, 20, 20]);
    up blocks consume it reversed, as in diffusers' UNet2DConditionModel.
    ``transformer_layers_per_block`` (per down-block) supports SDXL's deeper
    transformers; defaults to 1 everywhere.
    """
    heads = list(num_attention_heads)
    rev_heads = list(reversed(heads))
    tlpb = list(transformer_layers_per_block or [1] * len(down_block_types))
    rev_tlpb = list(reversed(tlpb))
    blocks: List[BlockGates] = []
    for i, bt in enumerate(down_block_types):
        blocks.append(
            _block_gates(bt, layers_per_block, heads[i], gated_ff, ff_gate_width,
                         resnet_groups, tlpb[i])
        )
    blocks.append(_block_gates(mid_block_type, 1, heads[-1], gated_ff, ff_gate_width,
                               resnet_groups, tlpb[-1]))
    for i, bt in enumerate(up_block_types):
        blocks.append(
            _block_gates(
                bt, layers_per_block + 1, rev_heads[i], gated_ff, ff_gate_width,
                resnet_groups, rev_tlpb[i]
            )
        )
    return GateLayout(tuple(blocks))


def sd21_gate_layout(gated_ff: bool = True, ff_gate_width: int = 32) -> GateLayout:
    """The layout used by every shipped reference config
    (configs/baselines/sd-2-1_coco_aptp_*.yaml)."""
    return unet_gate_layout(
        down_block_types=[
            "CrossAttnDownBlock2DHalfGated",
            "CrossAttnDownBlock2DHalfGated",
            "CrossAttnDownBlock2DHalfGated",
            "DownBlock2DHalfGated",
        ],
        mid_block_type="UNetMidBlock2DCrossAttnWidthGated",
        up_block_types=[
            "UpBlock2DHalfGated",
            "CrossAttnUpBlock2DHalfGated",
            "CrossAttnUpBlock2DHalfGated",
            "CrossAttnUpBlock2DHalfGated",
        ],
        num_attention_heads=[5, 10, 20, 20],
        layers_per_block=2,
        gated_ff=gated_ff,
        ff_gate_width=ff_gate_width,
    )
