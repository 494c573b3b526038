"""Stable-Diffusion safety checker, host-side (torch CPU).

The reference pipelines inherit diffusers' StableDiffusionSafetyChecker
(pruning_pipelines.py:179-187; run_safety_checker at :840,:991 blacks out
flagged images and returns per-image nsfw flags). diffusers is not in this
image, so the checker is reimplemented on transformers' torch CLIP vision
tower: cosine similarity of the projected image embedding against the
checkpoint's fixed "special care" / "concept" embeddings with per-concept
thresholds — the exact logic of
diffusers.pipelines.stable_diffusion.safety_checker (forward, non-adjusted
inference path).

Loads from the SD model root's ``safety_checker/`` (weights; the extra
concept tensors ride in the same state dict) and ``feature_extractor/``
(CLIP image-processor config) subfolders.
"""
from __future__ import annotations

import json
import os
from typing import List, Optional, Tuple

import numpy as np


class SafetyChecker:
    def __init__(self, vision_model, processor, concept_embeds, special_care_embeds,
                 concept_embeds_weights, special_care_embeds_weights):
        self.vision_model = vision_model
        self.processor = processor
        self.concept_embeds = concept_embeds  # [17, proj]
        self.special_care_embeds = special_care_embeds  # [3, proj]
        self.concept_embeds_weights = concept_embeds_weights  # [17]
        self.special_care_embeds_weights = special_care_embeds_weights  # [3]

    @classmethod
    def from_pretrained_root(cls, pretrained_root: str) -> Optional["SafetyChecker"]:
        """None when the model root ships no safety_checker/ subfolder."""
        sc_dir = os.path.join(str(pretrained_root), "safety_checker")
        if not os.path.isdir(sc_dir):
            return None
        import torch
        from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

        from ..models.convert import load_torch_state_dict

        sd = None
        for name in ("model.safetensors", "pytorch_model.bin"):
            p = os.path.join(sc_dir, name)
            if os.path.exists(p):
                sd = load_torch_state_dict(p)
                break
        if sd is None:
            return None
        with open(os.path.join(sc_dir, "config.json")) as f:
            cfg = json.load(f)
        vis_cfg = CLIPVisionConfig(**cfg.get("vision_config", cfg))
        model = CLIPVisionModelWithProjection(vis_cfg)
        # diffusers' checker wraps CLIPVisionModel as `vision_model.` — strip
        # one prefix level so transformers' WithProjection keys line up
        renamed = {}
        for k, v in sd.items():
            if k.startswith("vision_model.vision_model."):
                renamed["vision_model." + k[len("vision_model.vision_model."):]] = v
            elif k.startswith("visual_projection."):
                renamed[k] = v
        model.load_state_dict(
            {k: torch.as_tensor(np.asarray(v)) for k, v in renamed.items()}, strict=False
        )
        model.eval()

        fe_dir = os.path.join(str(pretrained_root), "feature_extractor")
        try:
            from transformers import CLIPImageProcessor

            processor = CLIPImageProcessor.from_pretrained(fe_dir)
        except Exception:
            from transformers import CLIPImageProcessor

            processor = CLIPImageProcessor(size=vis_cfg.image_size,
                                           crop_size=vis_cfg.image_size)
        get = lambda k: np.asarray(sd[k], np.float32)  # noqa: E731
        return cls(model, processor,
                   get("concept_embeds"), get("special_care_embeds"),
                   get("concept_embeds_weights"), get("special_care_embeds_weights"))

    def _image_embeds(self, images: np.ndarray) -> np.ndarray:
        """uint8/float [B,H,W,3] -> L2-normalized projected embeddings."""
        import torch

        if images.dtype != np.uint8:
            images = (np.clip(images.astype(np.float32), 0, 1) * 255).astype(np.uint8)
        inputs = self.processor(images=[im for im in images], return_tensors="pt")
        with torch.no_grad():
            emb = self.vision_model(**inputs).image_embeds.numpy()
        return emb / np.linalg.norm(emb, axis=-1, keepdims=True)

    def __call__(self, images: np.ndarray, adjustment: float = 0.0
                 ) -> Tuple[np.ndarray, List[bool]]:
        """Black out flagged images; return (images, has_nsfw flags) — the
        run_safety_checker contract (pruning_pipelines.py:840-848)."""
        emb = self._image_embeds(images)

        def cos(a, b):
            bn = b / np.linalg.norm(b, axis=-1, keepdims=True)
            return a @ bn.T

        special_cos = cos(emb, self.special_care_embeds)  # [B, 3]
        concept_cos = cos(emb, self.concept_embeds)  # [B, 17]
        special_scores = special_cos - self.special_care_embeds_weights + adjustment
        # any special-care hit lowers every concept threshold by 0.01
        special_hit = (special_scores > 0).any(axis=1, keepdims=True)
        concept_scores = (concept_cos - self.concept_embeds_weights + adjustment
                          + np.where(special_hit, 0.01, 0.0))
        has_nsfw = (concept_scores > 0).any(axis=1)

        out = np.array(images, copy=True)
        out[has_nsfw] = 0
        return out, [bool(x) for x in has_nsfw]
