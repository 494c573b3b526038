"""UCE closed-form concept editing CLI (reference
baselines/unified-concept-editing/train-scripts/train_erase.py)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint_dir", required=True)
    p.add_argument("--pretrained_root", required=True)
    p.add_argument("--erase_concepts", required=True, help="comma-separated")
    p.add_argument("--guided_concepts", default="",
                   help="replacement targets (comma-separated, default '')")
    p.add_argument("--preserve_concepts", default=None)
    p.add_argument("--lamb", type=float, default=0.5)
    p.add_argument("--erase_scale", type=float, default=1.0)
    p.add_argument("--preserve_scale", type=float, default=0.1)
    p.add_argument("--technique", default="replace", choices=["replace", "tensor"],
                   help="erase technique (train_erase.py:341): 'replace' swaps in "
                        "the guided concept's values, 'tensor' removes the old "
                        "concept's value direction from them")
    p.add_argument("--out", required=True, help=".npz overlay output path")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from unlearn_ft_tpu.baselines import uce_edit
    from unlearn_ft_tpu.loading import load_text_tower, load_unet_from_checkpoint

    spec, unet, params, _ = load_unet_from_checkpoint(args.checkpoint_dir)
    text_encoder, text_params, tok = load_text_tower(args.pretrained_root)

    def token_embed(prompts):
        """Per-concept embedding = mean of non-pad token states (UCE uses the
        final token states of the concept tokens)."""
        ids = tok(prompts, padding="max_length", truncation=True,
                  max_length=tok.model_max_length, return_tensors="np").input_ids
        hidden, _ = text_encoder.apply({"params": text_params}, jnp.asarray(ids))
        embs = []
        for row, h in zip(ids, np.asarray(hidden)):
            n = int((row != tok.pad_token_id).sum())
            embs.append(h[1 : max(n - 1, 2)].mean(axis=0))  # skip BOS/EOS
        return np.stack(embs)

    old_c = [c.strip() for c in args.erase_concepts.split(",")]
    new_c = [c.strip() for c in args.guided_concepts.split(",")] if args.guided_concepts else [
        "" for _ in old_c
    ]
    old = token_embed(old_c)
    new = token_embed(new_c)
    keep = token_embed([c.strip() for c in args.preserve_concepts.split(",")]) if (
        args.preserve_concepts
    ) else None

    edited = uce_edit(params, spec, old, new, keep, args.lamb, args.erase_scale,
                      args.preserve_scale, technique=args.technique)

    # save only the attn2 K/V kernels that changed
    overlay = {}

    def walk(a, b, path):
        if isinstance(a, dict):
            for k in a:
                walk(a[k], b[k], path + [k])
        elif not np.array_equal(np.asarray(a), np.asarray(b)):
            overlay["/".join(path)] = np.asarray(b)

    walk(params, edited, [])
    np.savez(args.out, **overlay)
    print(f"UCE edited {len(overlay)} tensors -> {args.out}")


if __name__ == "__main__":
    main()
