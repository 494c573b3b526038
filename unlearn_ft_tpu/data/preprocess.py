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

    def _geometry(w, h):
        """(resize dims, crop offsets, flip) for a source of size (w, h) —
        shared by the PIL and native paths so both sample the rng the same
        way."""
        scale = resolution / min(w, h)
        rw, rh = round(w * scale), round(h * scale)
        if center_crop:
            left, top = (rw - resolution) // 2, (rh - resolution) // 2
        else:
            r = _rng()
            left = int(r.integers(0, rw - resolution + 1))
            top = int(r.integers(0, rh - resolution + 1))
        flip = bool(random_flip and _rng().random() < 0.5)
        return rw, rh, left, top, flip

    def transform(img):
        from PIL import Image

        w, h = img.size
        rw, rh, left, top, flip = _geometry(w, h)
        img = img.resize((rw, rh), Image.BILINEAR)
        img = img.crop((left, top, left + resolution, top + resolution))
        arr = np.asarray(img.convert("RGB"), dtype=np.float32) / 127.5 - 1.0
        if flip:
            arr = arr[:, ::-1]
        return arr

    def from_path(path):
        """Fused native decode->resize->crop->flip (native/image_ops.cpp)
        when the file is a libjpeg-decodable JPEG; PIL otherwise. Numerics
        match PIL within its fixed-point rounding (±1 uint8 level,
        tests/test_native_image_ops.py)."""
        from ..native import load_image_ops

        ops = load_image_ops()
        if ops is not None:
            try:
                with open(path, "rb") as f:
                    data = f.read()
                w, h = ops.probe_jpeg(data)
                rw, rh, left, top, flip = _geometry(w, h)
                arr = ops.decode_resize_crop(data, rw, rh, resolution, left, top, flip)
                return arr.astype(np.float32) / 127.5 - 1.0
            except (ValueError, OSError):
                pass  # non-JPEG / CMYK / truncated -> PIL
        from PIL import Image

        return transform(Image.open(path))

    def from_paths(paths, num_threads: int = 8):
        """Batch of from_path with the decode thread pool (GIL released in
        the extension). Items the native path can't take fall back to PIL."""
        from ..native import load_image_ops

        ops = load_image_ops()
        if ops is None:
            return [from_path(p) for p in paths]
        jobs, idx, out = [], [], [None] * len(paths)
        for i, p in enumerate(paths):
            try:
                with open(p, "rb") as f:
                    data = f.read()
                w, h = ops.probe_jpeg(data)
            except (ValueError, OSError):
                out[i] = from_path(p)
                continue
            rw, rh, left, top, flip = _geometry(w, h)
            jobs.append((data, rw, rh, left, top, flip))
            idx.append(i)
        if jobs:
            batch = ops.batch_decode_resize_crop(jobs, resolution, int(num_threads))
            batch = batch.astype(np.float32) / 127.5 - 1.0
            for k, i in enumerate(idx):
                out[i] = batch[k]
        return out

    transform.from_path = from_path
    transform.from_paths = from_paths
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
        path = self.records[i].image
        from_path = getattr(self.transform, "from_path", None)
        if from_path is not None:
            return from_path(path)
        from PIL import Image

        return self.transform(Image.open(path))


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
