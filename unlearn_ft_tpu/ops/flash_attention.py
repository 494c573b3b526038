"""Pallas TPU flash attention wrapper.

Routes the U-Net's long self-attention sequences (4096 tokens at 512px)
through the fused Pallas kernel (jax.experimental.pallas.ops.tpu,
forward + custom-VJP backward, fp32 online softmax) instead of the
materialized [L, L] XLA softmax — the memory win enables larger batches and
the fused kernel keeps scores in VMEM.

Interface is BLHD to match ops/attention.py; head gating happens before the
call (masked q/k/v), which composes exactly like the reference's
HeadGatedAttnProcessor2 + SDPA (blocks.py:267-277).
"""
from __future__ import annotations

import jax.numpy as jnp


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """[B, L, H, D] -> [B, L, H, D]; softmax accumulated in fp32."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention as pallas_flash,
    )

    bq, lq, h, d = q.shape
    scale = 1.0 / (d**0.5)
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    block = min(512, lq)
    sizes = BlockSizes(
        block_q=block, block_k_major=block, block_k=block, block_b=1,
        block_q_major_dkv=block, block_k_major_dkv=block, block_k_dkv=block,
        block_q_dkv=block, block_k_major_dq=block, block_k_dq=block, block_q_dq=block,
    )
    out = pallas_flash(qt, kt, vt, causal=False, sm_scale=scale, block_sizes=sizes)
    return out.transpose(0, 2, 1, 3)
