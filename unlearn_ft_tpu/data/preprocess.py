"""Host-side preprocessing: image transforms (NHWC, [-1,1]) and batched text
embedding precomputation.

Design change vs the reference: CLIP/MPNet encoding runs ONCE per dataset in
large jitted batches and is cached (the reference re-encodes every batch in
the training process on the accelerator, data_utils.py:247-284 — flagged in
SURVEY §3.5 as the throughput bottleneck to fix).

Both caches are bounded-memory: results stream chunk-by-chunk into on-disk
``.npy`` memmaps (np.lib.format.open_memmap) and are handed back as read-only
memmaps, so peak host RSS is one chunk regardless of dataset size (COCO-2017
train is ~591k captions x 77 x 1024 fp32 ≈ 186 GB of CLIP states — it must
never be materialized). Without a cache_dir (tiny test sets) they fall back
to in-RAM arrays.
"""
from __future__ import annotations

import hashlib
import os
from typing import Callable, List, Optional, Sequence

import numpy as np


def params_fingerprint(tree) -> str:
    """Cheap stable digest of a params pytree (or a dict of pytrees) for
    cache keying: per leaf, path + shape + dtype + a strided value sample.
    Mixing this into precompute-cache keys makes a model-root swap (or a
    fine-tuned tower) under the same cache_dir recompute instead of silently
    reusing stale embeddings."""
    import jax

    h = hashlib.sha1()
    for path, leaf in sorted(
        jax.tree_util.tree_leaves_with_path(tree), key=lambda kv: str(kv[0])
    ):
        arr = np.asarray(leaf)
        h.update(str(path).encode())
        h.update(str(arr.shape).encode() + str(arr.dtype).encode())
        flat = arr.reshape(-1)
        stride = max(1, flat.size // 1024)
        h.update(np.ascontiguousarray(flat[::stride][:1024]).tobytes())
    return h.hexdigest()[:16]


def image_transform(
    resolution: int,
    center_crop: bool = False,
    random_flip: bool = True,
    rng: Optional[np.random.Generator] = None,
):
    """PIL image -> float32 NHWC in [-1, 1] (torchvision-equivalent chain:
    resize shorter side, crop, optional flip, normalize —
    data_utils.py:71-97). Without an explicit rng, each loader worker thread
    gets its own Generator (numpy Generators are not thread-safe)."""
    import threading

    tls = threading.local()

    def _rng():
        if rng is not None:
            return rng
        r = getattr(tls, "rng", None)
        if r is None:
            r = np.random.default_rng(abs(hash((0, threading.get_ident()))) % (2**32))
            tls.rng = r
        return r

    def transform(img):
        from PIL import Image

        w, h = img.size
        scale = resolution / min(w, h)
        img = img.resize((round(w * scale), round(h * scale)), Image.BILINEAR)
        w, h = img.size
        if center_crop:
            left, top = (w - resolution) // 2, (h - resolution) // 2
        else:
            r = _rng()
            left = r.integers(0, w - resolution + 1)
            top = r.integers(0, h - resolution + 1)
        img = img.crop((left, top, left + resolution, top + resolution))
        arr = np.asarray(img.convert("RGB"), dtype=np.float32) / 127.5 - 1.0
        if random_flip and _rng().random() < 0.5:
            arr = arr[:, ::-1]
        return arr

    return transform


class LazyImages:
    """Lazy decoded-image view over dataset records: images are opened and
    transformed per index, so callers can stream a dataset through the VAE
    without ever holding all pixels in RAM."""

    def __init__(self, records: Sequence, transform: Callable):
        self.records = records
        self.transform = transform

    def __len__(self):
        return len(self.records)

    def __getitem__(self, i):
        from PIL import Image

        return self.transform(Image.open(self.records[i].image))


def _stream_to_memmap(path: str, n: int, chunks) -> np.ndarray:
    """Fill an on-disk .npy from an iterator of [b, ...] chunks; returns the
    reopened read-only memmap. Writes to a .tmp first so interrupted
    precomputes never leave a truncated cache behind."""
    tmp = path + ".tmp.npy"
    out = None
    row = 0
    for chunk in chunks:
        chunk = np.asarray(chunk)
        if out is None:
            out = np.lib.format.open_memmap(
                tmp, mode="w+", dtype=chunk.dtype, shape=(n,) + chunk.shape[1:]
            )
        out[row : row + chunk.shape[0]] = chunk
        row += chunk.shape[0]
    assert out is not None and row == n, (row, n)
    out.flush()
    del out
    os.replace(tmp, path)
    return np.load(path, mmap_mode="r")


class LatentMomentsCache:
    """Precompute VAE posterior moments (mean, logvar) per image once, so the
    hot training step samples latents with one elementwise op instead of
    running the VAE encoder (which costs more FLOPs than the teacher U-Net at
    512px). Sampling from the cached moments is distributionally identical to
    in-loop encoding. ``images`` may be an ndarray or any lazy __getitem__
    view (LazyImages); only one encode batch is ever resident."""

    def __init__(self, encode_moments: Callable, cache_dir: Optional[str] = None,
                 batch_size: int = 32, fingerprint: str = ""):
        self.encode_moments = encode_moments  # [B,H,W,3] -> (mean, logvar)
        self.cache_dir = cache_dir
        self.batch_size = batch_size
        self.fingerprint = fingerprint  # model identity (params_fingerprint)

    def _chunks(self, images):
        n = len(images)
        for i in range(0, n, self.batch_size):
            batch = np.stack([images[j] for j in range(i, min(i + self.batch_size, n))])
            mean, logvar = self.encode_moments(batch)
            yield np.concatenate([np.asarray(mean), np.asarray(logvar)], axis=-1)

    def __call__(self, images, key: str = "latents"):
        if self.cache_dir:
            if self.fingerprint:
                key = hashlib.sha1(
                    f"{self.fingerprint}\x00{key}".encode()
                ).hexdigest()[:16]
            path = os.path.join(self.cache_dir, f"latent_moments_{key}.npy")
            if os.path.exists(path):
                return np.load(path, mmap_mode="r")
            os.makedirs(self.cache_dir, exist_ok=True)
            return _stream_to_memmap(path, len(images), self._chunks(images))
        return np.concatenate(list(self._chunks(images)), 0)


class TextEmbeddingCache:
    """Precompute CLIP last-hidden-state + MPNet mean-pooled embeddings for a
    caption list, cached as per-tower .npy memmaps keyed by content hash."""

    def __init__(self, encode_clip: Callable, encode_mpnet: Optional[Callable],
                 cache_dir: Optional[str] = None, batch_size: int = 256,
                 fingerprint: str = ""):
        self.encode_clip = encode_clip
        self.encode_mpnet = encode_mpnet
        self.cache_dir = cache_dir
        self.batch_size = batch_size
        self.fingerprint = fingerprint  # model identity (params_fingerprint)

    def _chunks(self, captions: List[str], encode: Callable):
        for i in range(0, len(captions), self.batch_size):
            yield np.asarray(encode(captions[i : i + self.batch_size]))

    def _tower(self, captions: List[str], encode: Callable, path: Optional[str]):
        if path is not None:
            if os.path.exists(path):
                return np.load(path, mmap_mode="r")
            return _stream_to_memmap(path, len(captions), self._chunks(captions, encode))
        return np.concatenate(list(self._chunks(captions, encode)), 0)

    def __call__(self, captions: List[str]):
        key = hashlib.sha1(
            (self.fingerprint + "\x00\x00" + "\x00".join(captions)).encode()
        ).hexdigest()[:16]
        clip_path = mpnet_path = None
        if self.cache_dir:
            os.makedirs(self.cache_dir, exist_ok=True)
            clip_path = os.path.join(self.cache_dir, f"text_emb_{key}_clip.npy")
            mpnet_path = os.path.join(self.cache_dir, f"text_emb_{key}_mpnet.npy")
        prompt_embeds = self._tower(captions, self.encode_clip, clip_path)
        mpnet = None
        if self.encode_mpnet is not None:
            mpnet = self._tower(captions, self.encode_mpnet, mpnet_path)
        return prompt_embeds, mpnet
