"""Export checkpoints trained here to the reference's torch format.

One command from this framework's orbax checkpoints to the artifacts the
reference's stack consumes — both stages:

FINE-TUNE checkpoint (detected by its ``unet_spec.json`` sidecar):
  out_dir/
    diffusion_pytorch_model.safetensors   pruned U-Net, diffusers naming/NCHW
    arch_vector.pt                        torch sidecar (trainer.py:2159-2163)
    unet_spec.json                        this framework's spec (round-trip)
  -> loadable by UNet2DConditionModelPruned.from_pretrained(...,
     checkpoint_loading=True) (reference unet_2d_conditional.py:2185-2495)
     and generate_fid_images.py:67-118.

PRUNING checkpoint (orbax tree with hypernet+quantizer; pass
``--base_config_path`` so the gate layout can be rebuilt):
  out_dir/
    hypernet/{config.json, diffusion_pytorch_model.safetensors}
    quantizer/{config.json, diffusion_pytorch_model.safetensors}
    quantizer_embeddings.pt
  -> the three artifacts the reference fine-tune stage reads
     (HyperStructure/StructureVectorQuantizer.from_pretrained +
     torch.load(quantizer_embeddings.pt), trainer.py:2132-2163).

Usage:
  python scripts/export_checkpoint.py --checkpoint_dir .../checkpoint-50000 \
      --out_dir /out/expert [--base_config_path run/config.yaml] \
      [--format safetensors|bin]
"""
import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _export_finetune(args):
    import numpy as np

    from unlearn_ft_tpu.loading import load_unet_from_checkpoint
    from unlearn_ft_tpu.models.export import (
        export_unet,
        save_arch_vector_pt,
        save_state_dict,
    )

    spec, _unet, params, step = load_unet_from_checkpoint(args.checkpoint_dir)
    sd = export_unet(spec, params)
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


def _export_pruning(args):
    import numpy as np
    import orbax.checkpoint as ocp

    from unlearn_ft_tpu.models import gate_layout_for_config
    from unlearn_ft_tpu.models.export import export_hypernet, export_quantizer, save_state_dict
    from unlearn_ft_tpu.models.quantizer import QuantizerConfig
    from unlearn_ft_tpu.training.trainer import unet_config_from
    from unlearn_ft_tpu.utils.config import load_config

    assert args.base_config_path, (
        "--base_config_path is required to export a PRUNING checkpoint "
        "(the gate layout is rebuilt from the model config)"
    )
    config = load_config(args.base_config_path)
    if str(config.get_path("model.type", "sd")).lower() == "flux":
        raise SystemExit(
            "flux pruning export is not supported: the reference's flux "
            "hypernet has no depth head and its fine-tune stage is SD-only"
        )
    layout = gate_layout_for_config(unet_config_from(config))
    g = config.get_path
    qcfg = QuantizerConfig(
        layout=layout,
        n_e=int(g("model.quantizer.num_arch_vq_codebook_embeddings", 8)),
        temperature=float(g("model.quantizer.quantizer_T", 0.4)),
        base=float(g("model.quantizer.quantizer_base", 2.0)),
        non_zero_width=bool(g("model.quantizer.non_zero_width", True)),
        optimal_transport=bool(g("model.quantizer.optimal_transport", True)),
        resource_aware_normalization=bool(
            g("model.quantizer.resource_aware_normalization", True)
        ),
        depth_order=tuple(g("model.quantizer.depth_order"))
        if g("model.quantizer.depth_order") else None,
    )

    tree = ocp.StandardCheckpointer().restore(
        os.path.join(os.path.abspath(args.checkpoint_dir), "state")
    )
    trainable = tree["trainable"]
    emb_gs_path = os.path.join(args.checkpoint_dir, "quantizer_embeddings.npy")
    emb_gs = (np.load(emb_gs_path) if os.path.exists(emb_gs_path)
              else np.asarray(tree["qstate_embedding_gs"]))

    name = ("diffusion_pytorch_model.safetensors" if args.format == "safetensors"
            else "diffusion_pytorch_model.bin")
    for sub, (sd, cfg) in {
        "hypernet": export_hypernet(trainable["hypernet"], layout),
        "quantizer": export_quantizer(
            trainable["quantizer"], emb_gs, layout, qcfg=qcfg
        ),
    }.items():
        d = os.path.join(args.out_dir, sub)
        os.makedirs(d, exist_ok=True)
        save_state_dict(sd, os.path.join(d, name))
        with open(os.path.join(d, "config.json"), "w") as f:
            json.dump(cfg, f, indent=2)

    import torch

    torch.save(torch.from_numpy(np.asarray(emb_gs, np.float32)),
               os.path.join(args.out_dir, "quantizer_embeddings.pt"))
    print(f"exported pruning checkpoint ({emb_gs.shape[0]} experts, "
          f"arch dim {emb_gs.shape[1]}) -> {args.out_dir}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint_dir", required=True,
                   help="checkpoint-{step} dir (fine-tune or pruning)")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--base_config_path", default=None,
                   help="run config.yaml (required for pruning checkpoints)")
    p.add_argument("--format", choices=("safetensors", "bin"), default="safetensors")
    args = p.parse_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)

    if os.path.exists(os.path.join(args.checkpoint_dir, "unet_spec.json")):
        _export_finetune(args)
    else:
        _export_pruning(args)


if __name__ == "__main__":
    main()
