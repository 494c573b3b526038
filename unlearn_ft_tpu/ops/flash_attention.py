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
    # measured on v5e at the U-Net's shapes (B8, H5/H10, D64): q-block 1024 /
    # k-block 512 beats the uniform 512 by 7.9% fwd+bwd at L=4096 and 3% at
    # L=1024 (larger q blocks amortize the kv streaming; 2048 q blocks
    # exceed the Mosaic VMEM budget and fail to compile)
    blk_q = min(1024, lq)
    blk_k = min(512, lq)
    sizes = BlockSizes(
        block_q=blk_q, block_k_major=blk_k, block_k=blk_k, block_b=1,
        block_q_major_dkv=blk_q, block_k_major_dkv=blk_k, block_k_dkv=blk_k,
        block_q_dkv=blk_q, block_k_major_dq=blk_k, block_k_dq=blk_k,
        block_q_dq=blk_q,
    )
    out = pallas_flash(qt, kt, vt, causal=False, sm_scale=scale, block_sizes=sizes)
    return out.transpose(0, 2, 1, 3)
