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
