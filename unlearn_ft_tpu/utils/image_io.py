"""Shared image-directory iteration for the metric tools (.npy / .png / .jpg)."""
from __future__ import annotations

import os

import numpy as np


def save_image(img, path: str):
    """float [0,1] HWC array -> 8-bit PNG/JPEG on disk."""
    from PIL import Image

    arr = np.clip(np.asarray(img, np.float32), 0.0, 1.0)
    Image.fromarray((arr * 255).astype(np.uint8)).save(path)


def iter_images(directory: str):
    for name in sorted(os.listdir(directory)):
        path = os.path.join(directory, name)
        if name.endswith(".npy"):
            yield np.load(path)
        elif name.lower().endswith((".png", ".jpg", ".jpeg")):
            from PIL import Image

            yield np.asarray(Image.open(path).convert("RGB"))
