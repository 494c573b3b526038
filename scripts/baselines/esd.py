"""ESD erasure fine-tuning CLI (reference baselines/erasing/esd_diffusers.py).

Operates on a fine-tuned expert checkpoint (this framework's checkpoint dir):
trains the selected param subset against the negative-guidance target for a
concept prompt, then saves the changed subset as an .npz overlay consumable
by generate_fid_images.py --erasure_ckpt_path.
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
    p.add_argument("--erase_concept", required=True, help="e.g. 'Van Gogh'")
    p.add_argument("--train_method", default="noxattn",
                   choices=["noxattn", "xattn", "selfattn", "full", "notime"])
    p.add_argument("--iterations", type=int, default=1000)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--negative_guidance", type=float, default=1.0)
    p.add_argument("--ddim_steps", type=int, default=50)
    p.add_argument("--out", required=True, help=".npz overlay output path")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from unlearn_ft_tpu.baselines import esd_param_mask, make_esd_step, masked_optimizer
    from unlearn_ft_tpu.baselines.overlay import save_overlay
    from unlearn_ft_tpu.loading import load_text_tower, load_unet_from_checkpoint
    from unlearn_ft_tpu.schedulers import DiffusionSchedule
    from unlearn_ft_tpu.training.optim import make_optimizer

    spec, unet, params, _ = load_unet_from_checkpoint(args.checkpoint_dir)
    text_encoder, text_params, tok = load_text_tower(args.pretrained_root)

    def encode(prompts):
        ids = tok(prompts, padding="max_length", truncation=True,
                  max_length=tok.model_max_length, return_tensors="np").input_ids
        return text_encoder.apply({"params": text_params}, jnp.asarray(ids))[0]

    concept = encode([args.erase_concept])
    neutral = encode([""])

    mask = esd_param_mask(params, args.train_method)
    tx = masked_optimizer(make_optimizer(args.lr), mask)
    sched = DiffusionSchedule()
    step = make_esd_step(unet, sched, tx, args.negative_guidance, args.ddim_steps)
    frozen = jax.tree.map(jnp.copy, jax.tree.map(jnp.asarray, params))
    opt_state = tx.init(params)
    params = jax.tree.map(jnp.asarray, params)
    for i in range(args.iterations):
        params, opt_state, loss = step(
            params, frozen, opt_state, concept, neutral, jax.random.PRNGKey(i),
            # latent grid tracks the expert's training resolution (the kernel
            # default of 64 is only right for 512px checkpoints)
            latent_hw=int(spec.sample_size),
        )
        if (i + 1) % 50 == 0:
            print(f"iter {i + 1}: loss={float(loss):.5f}", flush=True)

    # save only the trained subset as an overlay
    trained = jax.tree.map(
        lambda m, new, old: np.asarray(new) if m else None, mask,
        jax.device_get(params), jax.device_get(frozen),
    )

    def prune_nones(t):
        if isinstance(t, dict):
            out = {k: prune_nones(v) for k, v in t.items()}
            return {k: v for k, v in out.items() if v is not None} or None
        return t

    save_overlay(prune_nones(trained), args.out)
    print(f"saved ESD overlay to {args.out}")


if __name__ == "__main__":
    main()
