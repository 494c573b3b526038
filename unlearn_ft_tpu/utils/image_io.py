"""Shared image-directory iteration for the metric tools (.npy / .png / .jpg)."""
from __future__ import annotations

import os

import numpy as np


def iter_images(directory: str):
    for name in sorted(os.listdir(directory)):
        path = os.path.join(directory, name)
        if name.endswith(".npy"):
            yield np.load(path)
        elif name.lower().endswith((".png", ".jpg", ".jpeg")):
            from PIL import Image

            yield np.asarray(Image.open(path).convert("RGB"))
