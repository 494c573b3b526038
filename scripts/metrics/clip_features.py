"""Extract reference caption CLIP text features (reference
scripts/metrics/clip_features.py; pdm/utils/clip_utils.py). ViT-B/32 via
transformers; features saved as per-caption .npy files."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--captions_dir", required=True, help="dir of per-image caption .txt files")
    p.add_argument("--save_dir", required=True)
    p.add_argument("--clip_model", default="openai/clip-vit-base-patch32")
    p.add_argument("--batch_size", type=int, default=256)
    args = p.parse_args(argv)

    import torch
    from transformers import CLIPModel, CLIPProcessor

    model = CLIPModel.from_pretrained(args.clip_model).eval()
    proc = CLIPProcessor.from_pretrained(args.clip_model)

    names, caps = [], []
    for fn in sorted(os.listdir(args.captions_dir)):
        if fn.endswith(".txt"):
            with open(os.path.join(args.captions_dir, fn)) as f:
                caps.append(f.read().strip())
            names.append(fn[:-4])

    os.makedirs(args.save_dir, exist_ok=True)
    with torch.no_grad():
        for i in range(0, len(caps), args.batch_size):
            chunk = caps[i : i + args.batch_size]
            inputs = proc(text=chunk, return_tensors="pt", padding=True, truncation=True)
            feats = model.get_text_features(**inputs)
            feats = feats / feats.norm(dim=-1, keepdim=True)
            for j, name in enumerate(names[i : i + args.batch_size]):
                np.save(os.path.join(args.save_dir, f"{name}.npy"), feats[j].numpy())
    print(f"saved {len(caps)} text features to {args.save_dir}")


if __name__ == "__main__":
    main()
