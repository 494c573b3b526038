"""Artist-style erasure benchmark — ONE command from a checkpoint (+optional
erasure overlay) to a style-similarity JSON.

Parity with the reference driver (baselines/concept_prune/artist_erasure.py):
load the per-artist prompt CSV (prompt + evaluation_seed +
evaluation_guidance columns, datasets/test_{artist}.csv), generate one image
per row with the unlearned checkpoint (:70-115, here on TPU through
SDPipeline with optional ESD/UCE overlay and per-row latent seeds), then
score style similarity. The reference defers to the external CSD repo
(README.md:162); here CLIP similarity to style anchor prompts is the
built-in proxy — point --clip_model at any local CLIP dir.
``--image_dir`` alone scores an existing directory.
"""
import argparse
import csv
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def load_artist_csv(path: str):
    """(prompts, seeds, guidance) from the reference's per-artist CSV layout
    (ArtistDataset, artist_erasure.py:37-48)."""
    with open(path) as f:
        rows = list(csv.DictReader(f))
    prompts = [r["prompt"] for r in rows]
    seeds = [int(float(r.get("evaluation_seed", 0) or 0)) for r in rows]
    guidance = [float(r.get("evaluation_guidance", 7.5) or 7.5) for r in rows]
    return prompts, seeds, guidance


def clip_style_similarity(image_dir: str, artist: str, clip_model: str):
    import torch
    from transformers import CLIPModel, CLIPProcessor

    model = CLIPModel.from_pretrained(clip_model).eval()
    proc = CLIPProcessor.from_pretrained(clip_model)
    anchor = f"a painting in the style of {artist}"
    with torch.no_grad():
        t = proc(text=[anchor], return_tensors="pt", padding=True, truncation=True)
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


def csd_style_similarity(image_dir: str, csd_model: str, style_ref_dir: str):
    """CSD scoring (the reference's protocol: it defers artist-style
    similarity to the external CSD repo, reference README.md:162). Loads the
    published CSD checkpoint — a CLIP ViT-L/14 vision tower ('backbone.*'
    keys, mapped onto transformers' CLIPVisionModel) with a style projection
    head ('last_layer_style') — embeds generated and reference-style images,
    and returns the mean max-over-references cosine similarity per image."""
    import torch
    from transformers import CLIPVisionConfig, CLIPVisionModel

    from unlearn_ft_tpu.utils.image_io import iter_images

    sd = torch.load(csd_model, map_location="cpu", weights_only=True)
    sd = sd.get("model_state_dict", sd)
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    style_head = sd["last_layer_style"]  # [D_style, width] projection

    cfg = CLIPVisionConfig(
        hidden_size=1024, intermediate_size=4096, num_hidden_layers=24,
        num_attention_heads=16, image_size=224, patch_size=14,
    )  # ViT-L/14 — the CSD backbone
    model = CLIPVisionModel(cfg).eval()
    # CSD saves the open-clip visual tower under 'backbone.'; the tensor
    # names match transformers' CLIPVisionModel modulo the prefix
    backbone = {
        k.removeprefix("backbone."): v for k, v in sd.items()
        if k.startswith("backbone.")
    }
    missing, unexpected = model.load_state_dict(backbone, strict=False)
    if len(missing) > len(backbone) // 2:
        raise ValueError(
            f"--csd_model {csd_model}: state dict does not look like a CSD "
            f"checkpoint ({len(missing)} unmapped backbone keys)"
        )
    mean = torch.tensor([0.48145466, 0.4578275, 0.40821073])[:, None, None]
    std = torch.tensor([0.26862954, 0.26130258, 0.27577711])[:, None, None]

    @torch.no_grad()
    def embed_dir(d):
        feats = []
        for img in iter_images(d):
            x = torch.from_numpy(img).permute(2, 0, 1).float() / 255.0
            x = torch.nn.functional.interpolate(
                x[None], size=(224, 224), mode="bicubic", align_corners=False
            )
            x = (x - mean) / std
            pooled = model(pixel_values=x).pooler_output
            f = pooled @ style_head.T
            feats.append(f / f.norm(dim=-1, keepdim=True))
        return torch.cat(feats)

    gen = embed_dir(image_dir)
    ref = embed_dir(style_ref_dir)
    sims = (gen @ ref.T).max(dim=-1).values
    return float(sims.mean()), int(gen.shape[0])


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--image_dir", default=None,
                   help="score an existing directory (skips generation)")
    p.add_argument("--checkpoint_dir", default=None, help="checkpoint-N dir")
    p.add_argument("--pretrained_root", default=None)
    p.add_argument("--erasure_ckpt_path", default=None,
                   help="ESD/UCE overlay (.npz or torch state dict)")
    p.add_argument("--prompts_csv", default=None,
                   help="per-artist CSV (prompt, evaluation_seed, "
                        "evaluation_guidance columns)")
    p.add_argument("--artist", required=True, help="e.g. 'Van Gogh'")
    p.add_argument("--max_prompts", type=int, default=1000)
    p.add_argument("--save_dir", default=None)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--skip_scoring", action="store_true")
    p.add_argument("--clip_model", default="openai/clip-vit-base-patch32")
    p.add_argument("--csd_model", default=None,
                   help="path to the published CSD checkpoint (.pt): scores "
                        "with CSD style embeddings — the reference protocol "
                        "(README.md:162) — instead of the CLIP proxy; "
                        "requires --style_ref_dir")
    p.add_argument("--style_ref_dir", default=None,
                   help="directory of reference artist-style images for CSD "
                        "scoring")
    p.add_argument("--out", default=None, help="results JSON path")
    args = p.parse_args(argv)

    image_dir = args.image_dir
    if image_dir is None:
        assert args.checkpoint_dir and args.pretrained_root and args.prompts_csv, (
            "either --image_dir (score-only) or --checkpoint_dir + "
            "--pretrained_root + --prompts_csv (generate then score)"
        )
        from unlearn_ft_tpu.eval_gen import build_expert_pipeline, generate_prompt_images

        prompts, seeds, guidance = load_artist_csv(args.prompts_csv)
        prompts = prompts[: args.max_prompts]
        seeds = seeds[: args.max_prompts]
        guidance = guidance[: args.max_prompts]
        image_dir = args.save_dir or os.path.join(
            os.path.dirname(args.out) if args.out else ".", "artist_images"
        )
        _, pipe = build_expert_pipeline(
            args.checkpoint_dir, args.pretrained_root, args.erasure_ckpt_path
        )
        # per-row evaluation_guidance, like the per-row evaluation_seed: the
        # CFG scale is compile-time static, so rows group by guidance value
        # (one compiled loop per distinct value); `indices=rows` keeps
        # filenames and the merged prompts.json keyed by the original CSV
        # row index across groups
        by_guidance = {}
        for i, gval in enumerate(guidance):
            by_guidance.setdefault(gval, []).append(i)
        for gval, rows in sorted(by_guidance.items()):
            generate_prompt_images(
                pipe, [prompts[i] for i in rows], image_dir,
                batch_size=args.batch_size,
                num_inference_steps=args.num_inference_steps,
                guidance_scale=gval, resolution=args.resolution,
                seeds=[seeds[i] for i in rows],
                indices=rows,
            )
        import jax

        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("artist_eval_generation_done")
            if jax.process_index() != 0:
                return
    if args.skip_scoring:
        print(json.dumps({"image_dir": image_dir, "scored": False}))
        return
    if args.csd_model:
        assert args.style_ref_dir, "--csd_model requires --style_ref_dir"
        sim, n = csd_style_similarity(image_dir, args.csd_model, args.style_ref_dir)
        scorer = "csd"
    else:
        # deviation from the reference protocol: CLIP anchor-prompt
        # similarity is a PROXY for CSD style similarity — not comparable
        # to CSD numbers (pass --csd_model to use the real protocol)
        sim, n = clip_style_similarity(image_dir, args.artist, args.clip_model)
        scorer = "clip-proxy"
    result = {"artist": args.artist, "style_similarity": sim, "images": n,
              "scorer": scorer}
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f)


if __name__ == "__main__":
    main()
