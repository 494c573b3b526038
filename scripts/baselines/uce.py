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
    p.add_argument("--out", required=True, help=".npz overlay output path")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from unlearn_ft_tpu.baselines import uce_edit
    from unlearn_ft_tpu.baselines.overlay import save_overlay
    from unlearn_ft_tpu.models.unet import UNet2DConditionModel
    from unlearn_ft_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
    from unlearn_ft_tpu.models.convert import convert_clip_text, load_torch_state_dict
    from unlearn_ft_tpu.training.checkpoint import CheckpointManager, spec_from_json

    with open(os.path.join(args.checkpoint_dir, "unet_spec.json")) as f:
        spec = spec_from_json(f.read())
    ckpt_root = os.path.dirname(os.path.abspath(args.checkpoint_dir))
    step_idx = int(os.path.basename(args.checkpoint_dir.rstrip("/")).split("-")[-1])
    mgr = CheckpointManager(ckpt_root)
    unet = UNet2DConditionModel(spec)
    template = jax.eval_shape(
        lambda k: unet.init(
            k, jnp.zeros((1, 64, 64, spec.in_channels)), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, spec.cross_attention_dim)),
        ),
        jax.random.PRNGKey(0),
    )["params"]
    template = jax.tree.map(lambda s: np.zeros(s.shape, np.float32), template)
    params = mgr.restore(step_idx, {"params": template, "step": 0})["params"]

    text_encoder = CLIPTextModel(CLIPTextConfig())
    text_params = convert_clip_text(load_torch_state_dict(
        os.path.join(args.pretrained_root, "text_encoder", "model.safetensors")))
    from transformers import CLIPTokenizer

    tok = CLIPTokenizer.from_pretrained(os.path.join(args.pretrained_root, "tokenizer"))

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
                      args.preserve_scale)

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
