"""COCO-val prep: one caption .txt per image for CLIP scoring (reference
scripts/metrics/save_captions.py)."""
import argparse
import json
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--coco_data_dir", required=True)
    p.add_argument("--save_dir", required=True)
    p.add_argument("--year", type=int, default=2017)
    args = p.parse_args(argv)

    ann = os.path.join(args.coco_data_dir, "annotations", f"captions_val{args.year}.json")
    with open(ann) as f:
        data = json.load(f)
    images = {img["id"]: img["file_name"] for img in data["images"]}
    os.makedirs(args.save_dir, exist_ok=True)
    seen = set()
    for a in data["annotations"]:
        img_id = a["image_id"]
        if img_id in seen or img_id not in images:
            continue
        seen.add(img_id)
        name = images[img_id].rsplit(".", 1)[0]
        with open(os.path.join(args.save_dir, f"{name}.txt"), "w") as f:
            f.write(a["caption"].strip())
    print(f"saved {len(seen)} captions")


if __name__ == "__main__":
    main()
