"""Prompt-set image generation for the unlearning benchmarks.

The reference's benchmark drivers are self-contained: load a prompt set,
generate images with the (possibly erasure-overlaid) expert checkpoint, then
score them (baselines/concept_prune/nudity_eval.py:90-170,
artist_erasure.py:70-115). This module is the shared generation half for the
TPU rebuild: build an SDPipeline from a checkpoint dir (+ optional overlay),
then batch-generate a prompt list to PNGs with a prompts.json manifest so the
scoring half can attribute detections back to prompts.
"""
from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence


def build_expert_pipeline(
    checkpoint_dir: str,
    pretrained_root: str,
    erasure_ckpt_path: Optional[str] = None,
    scheduler_type: str = "pndm",
    dtype=None,
):
    """(spec, SDPipeline) from a checkpoint-N dir + SD-layout model root,
    with an optional ESD/UCE erasure overlay applied to the U-Net params
    (the reference's --erasure_ckpt_path / load_models switchboard)."""
    import jax.numpy as jnp

    from .loading import load_text_tower, load_unet_from_checkpoint, load_vae_tower
    from .pipelines import SDPipeline
    from .schedulers import DiffusionSchedule

    dtype = dtype or jnp.bfloat16
    spec, unet, unet_params, _ = load_unet_from_checkpoint(checkpoint_dir, dtype=dtype)
    if erasure_ckpt_path:
        from .baselines.overlay import apply_erasure_overlay

        unet_params = apply_erasure_overlay(unet_params, spec, erasure_ckpt_path)
    vae, vae_params = load_vae_tower(pretrained_root, dtype=dtype)
    text_encoder, text_params, tokenizer = load_text_tower(pretrained_root, dtype=dtype)
    pipe = SDPipeline(
        unet, unet_params, vae, vae_params, DiffusionSchedule(),
        scheduler_type=scheduler_type, text_encoder=text_encoder,
        text_params=text_params, tokenizer=tokenizer,
    )
    return spec, pipe


def load_pruning_pipeline(config, checkpoint_dir: str):
    """PruningPipeline from a pruning checkpoint-N dir + the training YAML
    (the config defines the gated U-Net / hypernet / quantizer shapes; the
    checkpoint supplies the trained hypernet + codebook). Mirrors
    PruningTrainer.init_models' model construction so analysis CLIs don't
    need a full trainer (reference analogue: pruning_pipelines.py
    from_pretrained swapping in the gated classes, :46-167)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp

    from .models import UNet2DConditionModel, build_unet_spec, gate_layout_for_config
    from .models.hypernet import HyperStructure
    from .models.quantizer import QuantizerConfig
    from .pipelines import PruningPipeline
    from .schedulers import DiffusionSchedule
    from .training.trainer import BaseTrainer, load_diffusers_unet, unet_config_from
    from .utils import macs as macs_lib
    from .utils.config import resolve_model_type

    mt = resolve_model_type(config)
    if mt == "flux":
        return _load_flux_pruning_pipeline(config, checkpoint_dir)
    g = config.get_path
    seed = int(config.get("seed", 43))
    unet_cfg = unet_config_from(config)
    spec = build_unet_spec(unet_cfg)
    layout = gate_layout_for_config(unet_cfg)
    unet = UNet2DConditionModel(spec)

    root = str(config.get("pretrained_model_name_or_path", ""))
    unet_dir = os.path.join(root, "unet")
    if os.path.isdir(unet_dir):
        unet_params = load_diffusers_unet(unet_dir, spec)
    else:  # random-init runs (tests/smoke): same seed as the trainer
        added = None
        if unet_cfg.addition_embed_type == "text_time":
            pooled_dim = (unet_cfg.projection_class_embeddings_input_dim
                          - 6 * unet_cfg.addition_time_embed_dim)
            added = {"text_embeds": jnp.zeros((1, pooled_dim)),
                     "time_ids": jnp.zeros((1, 6))}
        from .training.trainer import host_init

        unet_params = host_init(
            unet.init,
            jax.random.PRNGKey(seed),
            jnp.zeros((1, unet_cfg.sample_size, unet_cfg.sample_size,
                       unet_cfg.in_channels)),
            jnp.array([0]), jnp.zeros((1, 7, unet_cfg.cross_attention_dim)),
            added_cond=added,
        )["params"]

    # frozen towers via the trainer's own builder: an uninitialized trainer
    # instance gives the real (SDXL-aware, super()-chained) method without
    # paying trainer construction
    if mt == "sdxl":
        from .training.sdxl_pruner import SDXLPruningTrainer

        h = object.__new__(SDXLPruningTrainer)
    else:
        class _Holder:
            build_frozen_towers = BaseTrainer.build_frozen_towers
            _load_mpnet = BaseTrainer._load_mpnet

        h = _Holder()
    h.config = config
    h.dtype = jnp.float32
    h.build_frozen_towers()

    hypernet = HyperStructure(
        layout,
        input_dim=int(g("model.hypernet.input_dim", 768)),
        wn_flag=bool(g("model.hypernet.weight_norm", True)),
        linear_bias=bool(g("model.hypernet.linear_bias", False)),
        single_arch_param=bool(g("model.hypernet.single_arch_param", False)),
    )
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
        os.path.join(checkpoint_dir, "state")
    )
    trainable = tree["trainable"]
    emb_gs_path = os.path.join(checkpoint_dir, "quantizer_embeddings.npy")
    emb_gs = (
        np.load(emb_gs_path) if os.path.exists(emb_gs_path)
        else tree["qstate_embedding_gs"]
    )
    qstate = {"embedding_gs": jnp.asarray(emb_gs), "prunable_macs_template": None}
    table = macs_lib.unet_macs(spec)
    norm = table["prunable"]
    qstate = qcfg.set_prunable_macs_template(
        qstate, [[v / norm for v in sub] for sub in table["per_submodule_prunable"]]
    )

    tokenizer = None
    if getattr(h, "text_params", None) is not None:
        from transformers import CLIPTokenizer

        tokenizer = CLIPTokenizer.from_pretrained(os.path.join(root, "tokenizer"))
    common = dict(
        hypernet=hypernet, hypernet_params=trainable["hypernet"],
        quantizer_cfg=qcfg, quantizer_params=trainable["quantizer"],
        quantizer_state=qstate, layout=layout,
        mpnet=h.mpnet, mpnet_params=h.mpnet_params,
    )
    if mt == "sdxl":
        from transformers import CLIPTokenizer

        from .pipelines import SDXLPruningPipeline

        tok2_dir = os.path.join(root, "tokenizer_2")
        tokenizer_2 = CLIPTokenizer.from_pretrained(
            tok2_dir if os.path.isdir(tok2_dir) else os.path.join(root, "tokenizer")
        ) if tokenizer is not None else None
        return SDXLPruningPipeline(
            unet, jax.tree.map(jnp.asarray, unet_params), h.vae, h.vae_params,
            DiffusionSchedule(), scheduler_type="ddim",
            text_encoder=h.text_encoder, text_params=h.text_params,
            tokenizer=tokenizer, text_encoder_2=h.text_encoder_2,
            text_params_2=h.text_params_2, tokenizer_2=tokenizer_2,
            **common,
        )
    return PruningPipeline(
        unet, jax.tree.map(jnp.asarray, unet_params), h.vae, h.vae_params,
        DiffusionSchedule(), scheduler_type="ddim",
        text_encoder=h.text_encoder, text_params=h.text_params,
        tokenizer=tokenizer,
        **common,
    )


def _load_flux_pruning_pipeline(config, checkpoint_dir: str):
    """FluxPruningPipeline from a Flux pruning checkpoint-N dir + the training
    YAML — mirrors FluxPruningTrainer.init_models' construction (reference
    FluxPruningPipeline from_pretrained, pruning_pipelines.py:1613-1711)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp

    from .models.hypernet import HyperStructure
    from .models.quantizer import QuantizerConfig
    from .pipelines import FluxPruningPipeline
    from .schedulers import FlowMatchSchedule
    from .training.flux_pruner import FluxPruningTrainer
    from .utils import flux_macs as fm

    g = config.get_path

    # model construction + tower loading via the trainer's own init (an
    # uninitialized instance: init_models reads only config/dtype/seed/mesh-
    # independent state and leaves trainable/frozen host trees behind)
    from .parallel import create_mesh

    h = object.__new__(FluxPruningTrainer)
    h.config = config
    h.dtype = jnp.float32
    h.seed = int(config.get("seed", 43))
    h.loss_cfg = _flux_loss_cfg(config)
    h.mesh = create_mesh(1)
    h.place_frozen = lambda tree: tree
    h.init_models()
    h._load_mpnet()

    tree = ocp.StandardCheckpointer().restore(os.path.join(checkpoint_dir, "state"))
    trainable = tree["trainable"]
    emb_gs_path = os.path.join(checkpoint_dir, "quantizer_embeddings.npy")
    emb_gs = (
        np.load(emb_gs_path) if os.path.exists(emb_gs_path)
        else tree["qstate_embedding_gs"]
    )
    qstate = {"embedding_gs": jnp.asarray(emb_gs), "prunable_macs_template": None}
    table = fm.flux_macs(h.flux_cfg, h.l_img, h.l_txt)
    norm = table["prunable"]
    qstate = h.qcfg.set_prunable_macs_template(
        qstate, [[v / norm for v in sub] for sub in table["per_submodule_prunable"]]
    )

    tokenizer = tokenizer_2 = None
    root = str(config.get("pretrained_model_name_or_path", ""))
    if getattr(h, "text_params", None) is not None and root:
        from transformers import AutoTokenizer, CLIPTokenizer

        tokenizer = CLIPTokenizer.from_pretrained(os.path.join(root, "tokenizer"))
        tokenizer_2 = AutoTokenizer.from_pretrained(os.path.join(root, "tokenizer_2"))
    return FluxPruningPipeline(
        h.flux, h.frozen["flux"],
        FlowMatchSchedule(shift=float(g("model.prediction_model.flow_shift", 1.0))),
        vae=h.vae, vae_params=h.vae_params,
        hypernet=h.hypernet, hypernet_params=trainable["hypernet"],
        quantizer_cfg=h.qcfg, quantizer_params=trainable["quantizer"],
        quantizer_state=qstate, layout=h.layout,
        text_encoder=h.text_encoder, text_params=h.text_params,
        tokenizer=tokenizer, t5=h.t5, t5_params=h.t5_params,
        tokenizer_2=tokenizer_2, mpnet=h.mpnet, mpnet_params=h.mpnet_params,
        max_text_tokens=h.l_txt,
    )


def _flux_loss_cfg(config):
    """LossConfig slice init_models needs (resource target rescale)."""
    from .training.steps import LossConfig

    g = config.get_path
    return LossConfig(
        resource_target=float(
            g("training.losses.resource_loss.pruning_target", 0.6)
        ),
    )


def generate_prompt_images(
    pipe,
    prompts: Sequence[str],
    save_dir: str,
    batch_size: int = 16,
    num_inference_steps: int = 50,
    guidance_scale: float = 7.5,
    resolution: int = 512,
    seed: int = 0,
    seeds: Optional[Sequence[int]] = None,
    prefix: str = "",
    skip_existing: bool = True,
    write_manifest: bool = True,
    indices: Optional[Sequence[int]] = None,
) -> List[str]:
    """Generate one image per prompt into ``save_dir`` as
    ``{prefix}{index:05d}.png`` plus a ``prompts.json`` manifest
    (index -> prompt). Work is sharded across hosts by jax.process_index.
    ``seeds`` gives a per-prompt latent seed (artist CSVs' evaluation_seed);
    otherwise one seed per batch derived from ``seed``. ``indices`` overrides
    the filename/manifest index per prompt (defaults to position) so callers
    that split one prompt set over several calls — e.g. per-guidance groups —
    keep global row attribution; the manifest is then merged, not replaced.
    Returns the host-local list of written image paths."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .utils.image_io import save_image

    os.makedirs(save_dir, exist_ok=True)
    if indices is None:
        global_ids = list(range(len(prompts)))
        merge_manifest = False
    else:
        assert len(indices) == len(prompts), (len(indices), len(prompts))
        global_ids = [int(i) for i in indices]
        merge_manifest = True
    if write_manifest and jax.process_index() == 0:
        manifest_path = os.path.join(save_dir, "prompts.json")
        manifest = {}
        if merge_manifest and os.path.exists(manifest_path):
            with open(manifest_path) as fh:
                manifest = json.load(fh)
        manifest.update({str(g): p for g, p in zip(global_ids, prompts)})
        with open(manifest_path, "w") as f:
            json.dump(manifest, f, indent=0)

    positions = list(range(len(prompts)))[jax.process_index() :: jax.process_count()]
    empty = pipe.encode_prompts([""] * batch_size)
    written: List[str] = []
    f = pipe.vae_scale_factor
    lat_hw = resolution // f
    pending = None  # (device images, paths): double buffer — the device
    # computes batch N+1 while the host fetches/encodes batch N's PNGs
    done = 0

    def flush(p):
        imgs, paths = p
        imgs = np.asarray(imgs)
        for j, path in enumerate(paths):
            save_image(imgs[j], path)
            written.append(path)

    for start in range(0, len(positions), batch_size):
        chunk = positions[start : start + batch_size]
        paths = [os.path.join(save_dir, f"{prefix}{global_ids[i]:05d}.png") for i in chunk]
        if skip_existing and all(os.path.exists(p) for p in paths):
            written.extend(paths)
            done += len(chunk)
            continue
        pad = batch_size - len(chunk)
        pe = pipe.encode_prompts([prompts[i] for i in chunk] + [""] * pad)
        latents = None
        if seeds is not None:
            # per-prompt latent seeds (reference seeds torch per row,
            # artist_erasure.py:100-110); batching keeps one latent per row
            latents = jnp.concatenate([
                jax.random.normal(
                    jax.random.PRNGKey(int(seeds[i])),
                    (1, lat_hw, lat_hw, pipe.unet.spec.in_channels), jnp.float32,
                )
                for i in chunk
            ] + [jnp.zeros((pad, lat_hw, lat_hw, pipe.unet.spec.in_channels))] * (1 if pad else 0))
        imgs = pipe.generate_samples(
            pe, empty, num_inference_steps, guidance_scale, resolution, resolution,
            seed=seed + start, latents=latents, output_uint8=True, device_output=True,
        )
        if pending is not None:
            flush(pending)
        pending = (imgs[: len(chunk)], paths)
        done += len(chunk)
        print(f"[{jax.process_index()}] generated {done}/{len(positions)}", flush=True)
    if pending is not None:
        flush(pending)
    return written
