"""Artist-style erasure benchmark (reference
baselines/concept_prune/artist_erasure.py): generate images for per-artist
prompt CSVs (Van Gogh / Monet / Picasso) with the unlearned checkpoint, then
score style similarity. The reference uses the external CSD repo
(README.md:162); here we report CLIP similarity to style anchor prompts as a
built-in proxy and leave CSD hooks to the host environment.
"""
import argparse
import csv
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def clip_style_similarity(image_dir: str, artist: str, clip_model: str):
    import torch
    from transformers import CLIPModel, CLIPProcessor

    model = CLIPModel.from_pretrained(clip_model).eval()
    proc = CLIPProcessor.from_pretrained(clip_model)
    anchor = f"a painting in the style of {artist}"
    with torch.no_grad():
        t = proc(text=[anchor], return_tensors="pt", padding=True)
        tf = model.get_text_features(**t)
        tf = tf / tf.norm(dim=-1, keepdim=True)
        sims = []
        from unlearn_ft_tpu.utils.image_io import iter_images

        for img in iter_images(image_dir):
            i = proc(images=[img], return_tensors="pt")
            f = model.get_image_features(**i)
            f = f / f.norm(dim=-1, keepdim=True)
            sims.append(float((f @ tf.T)[0, 0]))
    return float(np.mean(sims)), len(sims)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--image_dir", required=True)
    p.add_argument("--artist", required=True, help="e.g. 'Van Gogh'")
    p.add_argument("--clip_model", default="openai/clip-vit-base-patch32")
    args = p.parse_args(argv)
    sim, n = clip_style_similarity(args.image_dir, args.artist, args.clip_model)
    print(json.dumps({"artist": args.artist, "style_similarity": sim, "images": n}))


if __name__ == "__main__":
    main()
