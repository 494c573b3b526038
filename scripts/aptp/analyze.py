"""Pruning-checkpoint analysis CLI: per-expert codebook samples, depth-gate
ablations, and hypernet routing — the reference
StableDiffusionPruningPipeline's quantizer_samples / depth_analysis /
__call__ surfaces (pruning_pipelines.py:1243, 1460, 629) exposed from the
command line over this framework's pruning checkpoints.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pruning_ckpt_dir", required=True, help="checkpoint-N dir")
    p.add_argument("--base_config_path", required=True,
                   help="the pruning run's YAML (defines model shapes)")
    p.add_argument("--pretrained_model_name_or_path", default=None,
                   help="override the config's model root")
    p.add_argument("--mpnet_model", default=None)
    p.add_argument("--prompts", default=None,
                   help="comma-separated; default: config data.prompts")
    p.add_argument("--mode", default="all",
                   choices=["all", "experts", "depth", "route"])
    p.add_argument("--max_experts", type=int, default=8)
    p.add_argument("--num_inference_steps", type=int, default=25)
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--resolution", type=int, default=None,
                   help="default: config model.prediction_model.resolution")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out_dir", required=True)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from unlearn_ft_tpu.eval_gen import load_pruning_pipeline
    from unlearn_ft_tpu.utils.config import load_config
    from unlearn_ft_tpu.utils.image_io import save_image

    config = load_config(args.base_config_path)
    for k in ("pretrained_model_name_or_path", "mpnet_model"):
        if getattr(args, k):
            config.merge({k: getattr(args, k)})
    pipe = load_pruning_pipeline(config, args.pruning_ckpt_dir)
    assert pipe.tokenizer is not None, (
        "text tower weights required (pretrained root with text_encoder/ + tokenizer/)"
    )

    prompts = (
        [s for s in args.prompts.split(",") if s] if args.prompts
        else list(config.get_path("data.prompts") or [])
    )
    assert prompts, "no prompts (pass --prompts or set data.prompts in the YAML)"
    res = args.resolution or int(
        config.get_path("model.prediction_model.resolution", 512)
    )
    os.makedirs(args.out_dir, exist_ok=True)

    pe = pipe.encode_prompts(prompts)
    empty = pipe.encode_prompts([""] * len(prompts))
    kw = dict(num_inference_steps=args.num_inference_steps,
              guidance_scale=args.guidance_scale, height=res, width=res,
              seed=args.seed)
    summary = {"prompts": prompts}

    def save(img, name):
        save_image(img, os.path.join(args.out_dir, name))

    if args.mode in ("all", "experts"):
        n_e = np.asarray(pipe.qstate["embedding_gs"]).shape[0]
        sampled = pipe.quantizer_samples(
            pe, empty, expert_ids=range(min(n_e, args.max_experts)), **kw
        )
        for e, imgs in sampled.items():
            for i, img in enumerate(imgs):
                save(img, f"expert{e}_{i}.png")
        summary["experts_sampled"] = sorted(sampled)
    if args.mode in ("all", "depth"):
        ablations = pipe.depth_analysis(pe, empty, **kw)
        for d, imgs in ablations.items():
            for i, img in enumerate(imgs):
                save(img, f"depth{d}_off_{i}.png")
        summary["depth_gates_ablated"] = sorted(ablations)
    if args.mode in ("all", "route"):
        if pipe.mpnet_params is None:
            print("routing skipped: no MPNet weights (set --mpnet_model)",
                  file=sys.stderr)
        else:
            from transformers import AutoTokenizer

            from unlearn_ft_tpu.models.mpnet import mean_pool

            tok = AutoTokenizer.from_pretrained(str(config.get("mpnet_model")))
            enc = tok(prompts, padding="max_length", truncation=True,
                      max_length=min(int(tok.model_max_length or 128), 128),
                      return_tensors="np")
            hidden = pipe.mpnet.apply(
                {"params": pipe.mpnet_params},
                jnp.asarray(enc["input_ids"]), jnp.asarray(enc["attention_mask"]),
            )
            emb = mean_pool(hidden, jnp.asarray(enc["attention_mask"]))
            images, idx, ratios = pipe(emb, pe, empty, **kw)
            for i, img in enumerate(images):
                save(img, f"routed{i}_expert{int(idx[i])}.png")
            summary["routing"] = {
                "expert_indices": [int(x) for x in idx],
                "resource_ratios": [float(r) for r in np.asarray(ratios)],
            }
    with open(os.path.join(args.out_dir, "analysis.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
