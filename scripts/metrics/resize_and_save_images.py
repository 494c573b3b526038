"""COCO-val prep: resized reference images as uint8 .npy (reference
scripts/metrics/resize_and_save_images.py)."""
import argparse
import json
import os

import numpy as np
from PIL import Image


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--coco_data_dir", required=True)
    p.add_argument("--save_dir", required=True)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--year", type=int, default=2017)
    p.add_argument("--max_images", type=int, default=None)
    args = p.parse_args(argv)

    img_dir = os.path.join(args.coco_data_dir, f"val{args.year}")
    os.makedirs(args.save_dir, exist_ok=True)
    files = sorted(os.listdir(img_dir))
    if args.max_images:
        files = files[: args.max_images]
    for i, fn in enumerate(files):
        img = Image.open(os.path.join(img_dir, fn)).convert("RGB")
        img = img.resize((args.resolution, args.resolution), Image.BICUBIC)
        np.save(os.path.join(args.save_dir, fn.rsplit(".", 1)[0] + ".npy"),
                np.asarray(img, dtype=np.uint8))
        if (i + 1) % 1000 == 0:
            print(f"{i + 1}/{len(files)}")


if __name__ == "__main__":
    main()
