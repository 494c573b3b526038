"""Generate FID images from a fine-tuned expert checkpoint.

Parity with scripts/metrics/generate_fid_images.py:33-157: loads the expert
(arch vector + weights), runs 50-step PNDM at 512px over COCO-val captions,
saves each image as uint8 .npy named by caption. Work is sharded across hosts
(jax.process_index) and batched per device; optionally applies an erasure
state-dict overlay (ESD/UCE outputs) before sampling.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint_dir", "--finetuning_ckpt_dir", dest="checkpoint_dir",
                   required=True, help="checkpoint-N dir (reference: finetuning_ckpt_dir)")
    p.add_argument("--pretrained_root", "--pretrained_model_name_or_path",
                   dest="pretrained_root", required=True,
                   help="local diffusers dir with vae/ text_encoder/ tokenizer/")
    p.add_argument("--base_config_path", type=str, default=None,
                   help="reference-style img config (configs/img/sd-2-1_coco.yaml): "
                        "supplies data.data_dir / data.year / "
                        "training.num_inference_steps defaults")
    p.add_argument("--coco_data_dir", default=None)
    p.add_argument("--save_dir", default=None,
                   help="default: <checkpoint_dir>/coco_fid_images_<steps> "
                        "(the reference's layout, generate_fid_images.py:128-133)")
    p.add_argument("--num_inference_steps", type=int, default=None)
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--batch_size", type=int, default=16,
                   help="per-chip; b16 measured 19%% faster than b8 at 512px")
    p.add_argument("--max_images", type=int, default=30000)
    p.add_argument("--year", type=int, default=None)
    p.add_argument("--erasure_ckpt_path", type=str, default=None)
    p.add_argument("--seed", type=int, default=43)
    args = p.parse_args(argv)

    # Config-driven defaults, reference CLI parity (the reference reads
    # configs/img/sd-2-1_coco.yaml for data dir + inference steps,
    # generate_fid_images.py:35-56).
    cfg = {}
    if args.base_config_path:
        from unlearn_ft_tpu.utils.config import load_config
        cfg = load_config(args.base_config_path)
    if args.coco_data_dir is None:
        args.coco_data_dir = cfg.get_path("data.data_dir") if cfg else None
        if args.coco_data_dir is None:
            p.error("--coco_data_dir (or data.data_dir in --base_config_path) required")
    if args.num_inference_steps is None:
        args.num_inference_steps = (
            cfg.get_path("training.num_inference_steps", 50) if cfg else 50)
    if args.year is None:
        args.year = cfg.get_path("data.year", 2017) if cfg else 2017
    if args.save_dir is None:
        if args.erasure_ckpt_path is None:
            sub = f"coco_fid_images_{args.num_inference_steps}"
        else:
            tag = args.erasure_ckpt_path.replace("/", "_").replace(".", "_")
            sub = os.path.join(tag, "coco_fid_images")
        args.save_dir = os.path.join(args.checkpoint_dir, sub)

    import jax

    from unlearn_ft_tpu.data.datasets import CocoCaptions
    from unlearn_ft_tpu.eval_gen import build_expert_pipeline

    _, pipe = build_expert_pipeline(
        args.checkpoint_dir, args.pretrained_root, args.erasure_ckpt_path,
        scheduler_type="pndm",
    )

    # --- captions, sharded across hosts -------------------------------------
    # One caption per image; outputs are named by the source image's file stem
    # so they pair with save_captions.py / clip_features.py keys — the
    # reference protocol (generate_fid_images.py:146-150).
    ds = CocoCaptions(args.coco_data_dir, split="val", year=args.year)
    seen, items = set(), []  # (image stem, caption)
    for r in ds.records:
        if r.image not in seen:
            seen.add(r.image)
            stem = os.path.basename(r.image).rsplit(".", 1)[0]
            items.append((stem, r.caption))
    items = items[: args.max_images]
    items = items[jax.process_index() :: jax.process_count()]

    os.makedirs(args.save_dir, exist_ok=True)
    empty = pipe.encode_prompts([""] * args.batch_size)
    pending = None  # (device images, stems): double buffer — the device
    # computes batch N+1 while the host fetches/writes batch N's .npy files

    def flush(p):
        imgs, stems = p
        imgs = np.asarray(imgs)
        for j, stem in enumerate(stems):
            np.save(os.path.join(args.save_dir, f"{stem}.npy"), imgs[j])

    for i in range(0, len(items), args.batch_size):
        chunk = items[i : i + args.batch_size]
        caps = [c for _, c in chunk]
        pe = pipe.encode_prompts(caps + [""] * (args.batch_size - len(chunk)))
        imgs = pipe.generate_samples(
            pe, empty, args.num_inference_steps, args.guidance_scale,
            args.resolution, args.resolution, seed=args.seed + i,
            output_uint8=True,  # quantized on device: 4x smaller host fetch
            device_output=True,
        )
        if pending is not None:
            flush(pending)
        pending = (imgs[: len(chunk)], [s for s, _ in chunk])
        print(f"[{jax.process_index()}] {i + len(chunk)}/{len(items)}", flush=True)
    if pending is not None:
        flush(pending)


if __name__ == "__main__":
    main()
