"""Host-side preprocessing: image transforms (NHWC, [-1,1]) and batched text
embedding precomputation.

Design change vs the reference: CLIP/MPNet encoding runs ONCE per dataset in
large jitted batches and is cached (the reference re-encodes every batch in
the training process on the accelerator, data_utils.py:247-284 — flagged in
SURVEY §3.5 as the throughput bottleneck to fix).
"""
from __future__ import annotations

import hashlib
import os
from typing import Callable, List, Optional

import numpy as np


def image_transform(
    resolution: int,
    center_crop: bool = False,
    random_flip: bool = True,
    rng: Optional[np.random.Generator] = None,
):
    """PIL image -> float32 NHWC in [-1, 1] (torchvision-equivalent chain:
    resize shorter side, crop, optional flip, normalize —
    data_utils.py:71-97)."""
    rng = rng or np.random.default_rng(0)

    def transform(img):
        from PIL import Image

        w, h = img.size
        scale = resolution / min(w, h)
        img = img.resize((round(w * scale), round(h * scale)), Image.BILINEAR)
        w, h = img.size
        if center_crop:
            left, top = (w - resolution) // 2, (h - resolution) // 2
        else:
            left = rng.integers(0, w - resolution + 1)
            top = rng.integers(0, h - resolution + 1)
        img = img.crop((left, top, left + resolution, top + resolution))
        arr = np.asarray(img.convert("RGB"), dtype=np.float32) / 127.5 - 1.0
        if random_flip and rng.random() < 0.5:
            arr = arr[:, ::-1]
        return arr

    return transform


class LatentMomentsCache:
    """Precompute VAE posterior moments (mean, logvar) per image once, so the
    hot training step samples latents with one elementwise op instead of
    running the VAE encoder (which costs more FLOPs than the teacher U-Net at
    512px). Sampling from the cached moments is distributionally identical to
    in-loop encoding."""

    def __init__(self, encode_moments: Callable, cache_dir: Optional[str] = None,
                 batch_size: int = 32):
        self.encode_moments = encode_moments  # [B,H,W,3] -> (mean, logvar)
        self.cache_dir = cache_dir
        self.batch_size = batch_size

    def __call__(self, images: np.ndarray, key: str = "latents"):
        if self.cache_dir:
            path = os.path.join(self.cache_dir, f"latent_moments_{key}.npy")
            if os.path.exists(path):
                return np.load(path, mmap_mode="r")
        out = []
        for i in range(0, len(images), self.batch_size):
            mean, logvar = self.encode_moments(images[i : i + self.batch_size])
            out.append(np.concatenate([np.asarray(mean), np.asarray(logvar)], axis=-1))
        moments = np.concatenate(out, 0)
        if self.cache_dir:
            os.makedirs(self.cache_dir, exist_ok=True)
            np.save(path, moments)
        return moments


class TextEmbeddingCache:
    """Precompute CLIP last-hidden-state + MPNet mean-pooled embeddings for a
    caption list, cached to .npz keyed by content hash."""

    def __init__(self, encode_clip: Callable, encode_mpnet: Optional[Callable],
                 cache_dir: Optional[str] = None, batch_size: int = 256):
        self.encode_clip = encode_clip
        self.encode_mpnet = encode_mpnet
        self.cache_dir = cache_dir
        self.batch_size = batch_size

    def __call__(self, captions: List[str]):
        key = hashlib.sha1("\x00".join(captions).encode()).hexdigest()[:16]
        if self.cache_dir:
            path = os.path.join(self.cache_dir, f"text_emb_{key}.npz")
            if os.path.exists(path):
                z = np.load(path)
                return z["prompt_embeds"], (z["mpnet"] if "mpnet" in z else None)
        clip_chunks, mpnet_chunks = [], []
        for i in range(0, len(captions), self.batch_size):
            chunk = captions[i : i + self.batch_size]
            clip_chunks.append(np.asarray(self.encode_clip(chunk)))
            if self.encode_mpnet is not None:
                mpnet_chunks.append(np.asarray(self.encode_mpnet(chunk)))
        prompt_embeds = np.concatenate(clip_chunks, 0)
        mpnet = np.concatenate(mpnet_chunks, 0) if mpnet_chunks else None
        if self.cache_dir:
            os.makedirs(self.cache_dir, exist_ok=True)
            data = {"prompt_embeds": prompt_embeds}
            if mpnet is not None:
                data["mpnet"] = mpnet
            np.savez(path, **data)
        return prompt_embeds, mpnet
