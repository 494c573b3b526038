"""Export a fine-tuned expert checkpoint to the reference's torch format.

One command from this framework's orbax checkpoint to the artifact pair the
reference's evaluation/serving stack consumes
(UNet2DConditionModelPruned.from_pretrained(..., checkpoint_loading=True),
reference unet_2d_conditional.py:2185-2495; generate_fid_images.py:67-118):

  out_dir/
    diffusion_pytorch_model.safetensors   pruned U-Net, diffusers naming/NCHW
    arch_vector.pt                        torch sidecar (trainer.py:2159-2163)
    unet_spec.json                        this framework's spec (round-trip)

Usage:
  python scripts/export_checkpoint.py \
      --checkpoint_dir /logs/run/checkpoint-50000 --out_dir /out/expert2 \
      [--format safetensors|bin]

This is the inverse direction of MIGRATION.md's artifact table: reference
artifacts already load here; this makes checkpoints trained here load there.
"""
import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint_dir", required=True,
                   help="checkpoint-{step} dir with unet_spec.json sidecar")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--format", choices=("safetensors", "bin"), default="safetensors")
    args = p.parse_args(argv)

    import numpy as np

    from unlearn_ft_tpu.loading import load_unet_from_checkpoint
    from unlearn_ft_tpu.models.export import (
        export_unet,
        save_arch_vector_pt,
        save_state_dict,
    )

    spec, _unet, params, step = load_unet_from_checkpoint(args.checkpoint_dir)
    sd = export_unet(spec, params)
    os.makedirs(args.out_dir, exist_ok=True)
    name = ("diffusion_pytorch_model.safetensors" if args.format == "safetensors"
            else "diffusion_pytorch_model.bin")
    save_state_dict(sd, os.path.join(args.out_dir, name))

    av_path = os.path.join(args.checkpoint_dir, "arch_vector.npy")
    if os.path.exists(av_path):
        save_arch_vector_pt(np.load(av_path), os.path.join(args.out_dir, "arch_vector.pt"))
    spec_path = os.path.join(args.checkpoint_dir, "unet_spec.json")
    if os.path.exists(spec_path):
        shutil.copyfile(spec_path, os.path.join(args.out_dir, "unet_spec.json"))

    n = sum(int(np.prod(v.shape)) for v in sd.values())
    print(f"exported step-{step} expert: {len(sd)} tensors, {n/1e6:.1f}M params "
          f"-> {args.out_dir}")


if __name__ == "__main__":
    main()
