"""UCE debias CLI (reference
baselines/unified-concept-editing/train-scripts/train_debias.py): iteratively
edit cross-attention K/V so each concept's generations are balanced across
attributes. Loop (reference :232-330): measure attribute ratios by generating
samples and CLIP-classifying them (get_ratios, :126-168), update per-concept
attribute weights, apply the closed-form debias edit; stop when every concept
is within ``max_bias_diff`` of uniform. Edits compound across iterations, as
upstream (the parameter-restart block is commented out there)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint_dir", required=True)
    p.add_argument("--pretrained_root", required=True)
    p.add_argument("--concepts", required=True, help="comma-separated, e.g. 'doctor,nurse'")
    p.add_argument("--attributes", required=True, help="comma-separated, e.g. 'male,female'")
    p.add_argument("--preserve_concepts", default=None)
    p.add_argument("--lamb", type=float, default=0.1)
    p.add_argument("--erase_scale", type=float, default=0.1)
    p.add_argument("--preserve_scale", type=float, default=0.1)
    p.add_argument("--max_iters", type=int, default=30)
    p.add_argument("--max_bias_diff", type=float, default=0.05)
    p.add_argument("--weight_step", type=float, default=0.1)
    p.add_argument("--num_samples", type=int, default=10)
    p.add_argument("--num_inference_steps", type=int, default=20)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--clip_model", default="openai/clip-vit-base-patch32")
    p.add_argument("--out", required=True, help=".npz overlay output path")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from unlearn_ft_tpu.baselines.uce import debias_weight_update, uce_debias_edit
    from unlearn_ft_tpu.loading import (
        load_text_tower,
        load_unet_from_checkpoint,
        load_vae_tower,
    )
    from unlearn_ft_tpu.pipelines import SDPipeline
    from unlearn_ft_tpu.schedulers import DiffusionSchedule

    spec, unet, params0, _ = load_unet_from_checkpoint(args.checkpoint_dir)
    text_encoder, text_params, tok = load_text_tower(args.pretrained_root)
    vae, vae_params = load_vae_tower(args.pretrained_root)

    def token_span(prompts):
        """Per-prompt [n_tok, d] span of non-special token states (the
        reference slices around the final concept token, train_debias.py:290)."""
        ids = tok(prompts, padding="max_length", truncation=True,
                  max_length=tok.model_max_length, return_tensors="np").input_ids
        hidden, _ = text_encoder.apply({"params": text_params}, jnp.asarray(ids))
        spans = []
        for row, h in zip(ids, np.asarray(hidden)):
            n = int((row != tok.pad_token_id).sum())
            spans.append(h[1 : max(n - 1, 2)])
        return spans

    concepts = [c.strip() for c in args.concepts.split(",")]
    attributes = [a.strip() for a in args.attributes.split(",")]
    concept_spans = token_span(concepts)
    attr_spans = [token_span([f"{a} {c}" for a in attributes]) for c in concepts]
    keep = None
    if args.preserve_concepts:
        keep = np.stack([
            s.mean(axis=0) for s in token_span(
                [c.strip() for c in args.preserve_concepts.split(",")]
            )
        ])

    # CLIP zero-shot attribute classifier (reference get_ratios uses CLIP
    # logits over 'image of {attribute} {concept}', train_debias.py:126-168)
    import torch
    from transformers import CLIPModel, CLIPProcessor

    clip = CLIPModel.from_pretrained(args.clip_model).eval()
    proc = CLIPProcessor.from_pretrained(args.clip_model)

    # one pipeline for the whole ratio-feedback loop (the jitted denoise is
    # keyed on the pipeline instance; edited params are passed per call)
    pipe = SDPipeline(unet, params0, vae, vae_params, DiffusionSchedule(),
                      scheduler_type="ddim", text_encoder=text_encoder,
                      text_params=text_params, tokenizer=tok)

    def measure_ratios(params):
        ratios = []
        for ci, concept in enumerate(concepts):
            prompts = [f"image of {concept}"] * args.num_samples
            pe = pipe.encode_prompts(prompts)
            empty = pipe.encode_prompts([""] * len(prompts))
            imgs = pipe.generate_samples(
                pe, empty, args.num_inference_steps, 7.5,
                args.resolution, args.resolution, seed=1231 + ci,
                unet_params=params,
            )
            imgs8 = [(np.asarray(im) * 255).astype(np.uint8) for im in imgs]
            texts = [f"image of {a} {concept}" for a in attributes]
            with torch.no_grad():
                inputs = proc(text=texts, images=imgs8, return_tensors="pt", padding=True)
                logits = clip(**inputs).logits_per_image  # [n_img, n_attr]
                probs = logits.softmax(dim=-1).numpy()
            ratios.append(np.bincount(
                probs.argmax(axis=1), minlength=len(attributes)
            ) / len(imgs8))
        return np.stack(ratios)

    params = params0
    weights = [np.zeros(len(attributes)) for _ in concepts]
    for it in range(args.max_iters):
        ratios = measure_ratios(params)
        delta, converged = debias_weight_update(
            ratios, weight_step=args.weight_step, max_bias_diff=args.max_bias_diff
        )
        print(f"iter {it}: ratios={ratios.tolist()} converged={converged.tolist()}")
        if converged.all():
            print(f"all concepts debiased at iteration {it}")
            break
        weights = list(delta)
        params = uce_debias_edit(
            params, spec, concept_spans, attr_spans, weights, keep,
            args.lamb, args.erase_scale, args.preserve_scale,
        )

    overlay = {}

    def walk(a, b, path):
        if isinstance(a, dict):
            for k in a:
                walk(a[k], b[k], path + [k])
        elif not np.array_equal(np.asarray(a), np.asarray(b)):
            overlay["/".join(path)] = np.asarray(b)

    walk(params0, params, [])
    np.savez(args.out, **overlay)
    print(f"UCE debias edited {len(overlay)} tensors -> {args.out}")


if __name__ == "__main__":
    main()
