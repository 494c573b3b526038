"""CLIP score: cosine similarity between generated images and their caption
text features (reference scripts/metrics/clip_score.py; Taited/clip-score
protocol, ViT-B/32)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--image_dir", required=True,
                   help=".npy uint8 images named by COCO image stem "
                        "(generate_fid_images.py output)")
    p.add_argument("--text_features_dir", default=None,
                   help="precomputed text features keyed by the same image stems "
                        "(clip_features.py over save_captions.py output). If absent, "
                        "image filenames are treated as the captions themselves — "
                        "only valid for caption-named dirs.")
    p.add_argument("--clip_model", default="openai/clip-vit-base-patch32")
    p.add_argument("--batch_size", type=int, default=64)
    args = p.parse_args(argv)

    import torch
    from transformers import CLIPModel, CLIPProcessor

    model = CLIPModel.from_pretrained(args.clip_model).eval()
    proc = CLIPProcessor.from_pretrained(args.clip_model)

    files = sorted(f for f in os.listdir(args.image_dir) if f.endswith(".npy"))
    sims = []
    with torch.no_grad():
        for i in range(0, len(files), args.batch_size):
            chunk = files[i : i + args.batch_size]
            imgs = [np.load(os.path.join(args.image_dir, f)) for f in chunk]
            img_in = proc(images=imgs, return_tensors="pt")
            img_feats = model.get_image_features(**img_in)
            img_feats = img_feats / img_feats.norm(dim=-1, keepdim=True)
            if args.text_features_dir:
                txt_feats = torch.stack([
                    torch.from_numpy(
                        np.load(os.path.join(args.text_features_dir, f))
                    ) for f in chunk
                ])
            else:
                caps = [f[:-4] for f in chunk]
                txt_in = proc(text=caps, return_tensors="pt", padding=True, truncation=True)
                txt_feats = model.get_text_features(**txt_in)
                txt_feats = txt_feats / txt_feats.norm(dim=-1, keepdim=True)
            sims.append((img_feats * txt_feats).sum(-1).numpy())
    score = float(np.concatenate(sims).mean())
    print(f"CLIP score (ViT-B/32): {score:.4f} over {len(files)} images")


if __name__ == "__main__":
    main()
