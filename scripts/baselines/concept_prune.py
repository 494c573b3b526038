"""ConceptPrune (Wanda) CLI (reference baselines/concept_prune/wanda.py +
remove_neurons.py + save_union_over_time.py): record FFN activations on base
vs target prompts across timesteps, build skilled-neuron masks, zero them,
and save the modified FFN tensors as an .npz overlay.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint_dir", required=True)
    p.add_argument("--pretrained_root", required=True)
    p.add_argument("--target_prompt", required=True, help="concept to remove")
    p.add_argument("--base_prompt", default="a photo")
    p.add_argument("--skill_ratio", type=float, default=0.01)
    p.add_argument("--timesteps", type=int, nargs="+", default=[100, 300, 500, 700, 900])
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from unlearn_ft_tpu.baselines import apply_neuron_masks, wanda_masks
    from unlearn_ft_tpu.baselines.concept_prune import collect_ffn_activations, union_masks
    from unlearn_ft_tpu.loading import load_text_tower, load_unet_from_checkpoint

    spec, unet, params, _ = load_unet_from_checkpoint(args.checkpoint_dir)
    text_encoder, text_params, tok = load_text_tower(args.pretrained_root)

    def encode(prompts):
        ids = tok(prompts, padding="max_length", truncation=True,
                  max_length=tok.model_max_length, return_tensors="np").input_ids
        return text_encoder.apply({"params": text_params}, jnp.asarray(ids))[0]

    base_ctx = encode([args.base_prompt])
    tgt_ctx = encode([args.target_prompt])
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, spec.in_channels))

    per_t_masks = []
    for t in args.timesteps:
        tt = jnp.array([t])
        base = collect_ffn_activations(unet, params, x, tt, base_ctx)
        tgt = collect_ffn_activations(unet, params, x, tt, tgt_ctx)
        per_t_masks.append(wanda_masks(params, spec, base, tgt, args.skill_ratio))
        print(f"t={t}: masked "
              f"{sum(int(m.sum()) for m in per_t_masks[-1].values())} neurons", flush=True)

    masks = union_masks(per_t_masks)
    pruned = apply_neuron_masks(params, masks)

    overlay = {}
    for path in masks:
        node_p, node_q = params, pruned
        for part in path.split("/"):
            node_p, node_q = node_p[part], node_q[part]
        overlay[path + "/proj/kernel"] = np.asarray(node_q["proj"]["kernel"])
        if "bias" in node_q["proj"]:
            overlay[path + "/proj/bias"] = np.asarray(node_q["proj"]["bias"])
    np.savez(args.out, **overlay)
    print(f"saved ConceptPrune overlay ({len(overlay)} tensors) -> {args.out}")


if __name__ == "__main__":
    main()
