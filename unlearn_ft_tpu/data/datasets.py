"""Dataset loaders: COCO captions, CC3M, HF datasets, and a synthetic set.

Parity with pdm/datasets/{coco,cc3m}.py and pdm/utils/data_utils.py:12-68
(get_dataset dispatch by path substring). Records are plain dicts
{"image": path-or-None, "caption": str}; all preprocessing is explicit and
host-side (data/preprocess.py), with text embeddings precomputed off the hot
path — the reference encodes CLIP/MPNet inside the training process per batch
(data_utils.py:247-284), a known throughput bottleneck (SURVEY.md §3.5).
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import List, Optional


@dataclass
class Record:
    image: Optional[str]
    caption: str


class CocoCaptions:
    """COCO captions from annotation JSON (pdm/datasets/coco.py:7-21)."""

    def __init__(self, data_dir: str, year: int = 2017, split: str = "train",
                 max_samples: Optional[int] = None):
        ann = os.path.join(data_dir, "annotations", f"captions_{split}{year}.json")
        with open(ann) as f:
            data = json.load(f)
        images = {img["id"]: img["file_name"] for img in data["images"]}
        img_dir = os.path.join(data_dir, f"{split}{year}")
        self.records: List[Record] = []
        for a in data["annotations"]:
            fn = images.get(a["image_id"])
            if fn is None:
                continue
            self.records.append(Record(os.path.join(img_dir, fn), a["caption"]))
            if max_samples and len(self.records) >= max_samples:
                break

    def __len__(self):
        return len(self.records)

    def __getitem__(self, i):
        return self.records[i]


class CC3M:
    """CC3M from a TSV of (caption, url/filename) pairs (pdm/datasets/cc3m.py)."""

    def __init__(self, tsv_path: str, image_dir: Optional[str] = None,
                 max_samples: Optional[int] = None):
        self.records: List[Record] = []
        with open(tsv_path) as f:
            for line in f:
                parts = line.rstrip("\n").split("\t")
                if len(parts) < 2:
                    continue
                caption, loc = parts[0], parts[1]
                if image_dir is not None:
                    loc = os.path.join(image_dir, os.path.basename(loc))
                self.records.append(Record(loc, caption))
                if max_samples and len(self.records) >= max_samples:
                    break

    def __len__(self):
        return len(self.records)

    def __getitem__(self, i):
        return self.records[i]


class HFDataset:
    """Wrap a HuggingFace dataset (e.g. rezashkv/controlled_distillation).

    When ``split="validation"`` and the dataset has no validation split, a
    deterministic held-out slice is carved from train with the reference's
    parameters (train_test_split(test_size=0.083333, seed=42),
    data_utils.py:63-67)."""

    def __init__(self, name_or_path: str, split: str = "train",
                 image_column: str = "image", caption_column: str = "caption",
                 max_samples: Optional[int] = None, style_filter: Optional[str] = None,
                 cache_dir: Optional[str] = None):
        import datasets as hfds

        try:
            ds = hfds.load_dataset(name_or_path, split=split, cache_dir=cache_dir)
        except ValueError:
            if split not in ("train", "validation"):
                raise
            full = hfds.load_dataset(name_or_path, split="train", cache_dir=cache_dir)
            parts = full.train_test_split(test_size=0.083333, seed=42)
            ds = parts["train"] if split == "train" else parts["test"]
        if style_filter is not None:
            ds = ds.filter(lambda ex: style_filter in str(ex.get("style", "")))
        if max_samples:
            ds = ds.select(range(min(max_samples, len(ds))))
        self.ds = ds
        self.image_column, self.caption_column = image_column, caption_column

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, i):
        ex = self.ds[int(i)]
        return Record(ex.get(self.image_column), str(ex[self.caption_column]))


class SyntheticDataset:
    """Random pixels + captions; used by tests and smoke benchmarks."""

    def __init__(self, n: int = 64, resolution: int = 16, seed: int = 0):
        import numpy as np

        self.n, self.resolution = n, resolution
        self.rng = np.random.default_rng(seed)
        self.captions = [f"synthetic caption {i}" for i in range(n)]

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return Record(None, self.captions[i])


def get_dataset(config, split: str = "train") -> object:
    """Dispatch mirroring data_utils.get_dataset (path substring rules),
    with the reference's train/validation contract (data_utils.py:12-68):
    COCO validation = val{year} annotations, HF validation = named split or
    a deterministic held-out slice, CC3M validation = validation TSV."""
    data = config.data
    max_samples = (
        data.get("max_train_samples")
        if split == "train"
        else data.get("max_validation_samples")
    )
    if data.get("dataset_name"):
        return HFDataset(
            data.dataset_name,
            split=split,
            image_column=data.get("image_column", "image"),
            caption_column=data.get("caption_column", "caption"),
            max_samples=max_samples,
        )
    data_dir = data.get("data_dir", "") or ""
    if "coco" in data_dir.lower():
        return CocoCaptions(
            data_dir, year=data.get("year", 2017),
            split="train" if split == "train" else "val",
            max_samples=max_samples,
        )
    if "cc3m" in data_dir.lower() or "conceptual" in data_dir.lower():
        path = data_dir
        if split != "train" and data.get("validation_data_file"):
            path = data.validation_data_file
        return CC3M(path, max_samples=max_samples)
    if data_dir == "synthetic" or not data_dir:
        n = max_samples or (64 if split == "train" else 16)
        return SyntheticDataset(n=n, resolution=data.get("resolution", 16),
                                seed=0 if split == "train" else 1)
    raise ValueError(f"cannot infer dataset type from {data_dir}")
