"""Shared image-directory iteration for the metric tools (.npy / .png / .jpg)."""
from __future__ import annotations

import os

import numpy as np


def save_image(img, path: str):
    """HWC array -> 8-bit PNG/JPEG on disk. Accepts float [0,1] or uint8
    (device-quantized, SDPipeline output_uint8)."""
    from PIL import Image

    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr.astype(np.float32), 0.0, 1.0) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def iter_images(directory: str):
    for name in sorted(os.listdir(directory)):
        path = os.path.join(directory, name)
        if name.endswith(".npy"):
            yield np.load(path)
        elif name.lower().endswith((".png", ".jpg", ".jpeg")):
            from PIL import Image

            yield np.asarray(Image.open(path).convert("RGB"))
