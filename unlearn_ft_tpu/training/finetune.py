"""Expert fine-tuning trainer (reference UnetFineTuner, trainer.py:2116-2574)
plus the single-arch and baseline variants (trainer.py:3401-3581).

Student construction mirrors the reference contract exactly:
- multi-expert: pruning checkpoint's quantizer ``embedding_gs[expert_id]`` is
  the arch vector; the student is the *materialized* pruned U-Net and the
  arch vector is saved as a sidecar artifact (trainer.py:2159-2163).
- single-expert: the hypernet's single learned arch param.
- baselines: random arch vector at a target ratio / no pruning.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import UNet2DConditionModel, build_unet_spec, gate_layout_for_config
from ..models import materialize_pruned
from ..data import DataLoader, get_dataset
from ..data.datasets import SyntheticDataset
from ..parallel import replicate
from ..utils.logging_utils import logger
from .checkpoint import spec_to_json
from .steps import make_finetune_step
from .trainer import BaseTrainer, host_init, load_diffusers_unet, unet_config_from


def resolve_num_workers(cfg_value) -> int:
    """Collate-thread count from the YAML: an explicit 0 means serial
    collate (the reference configs' in-process semantics, which our loader
    expresses as 1 thread); unset means the 4-thread TPU-friendly default."""
    return 4 if cfg_value is None else max(1, int(cfg_value))


def load_quantizer_embeddings(pruning_ckpt_dir: str) -> np.ndarray:
    """Load the [n_e, dim] quantizer embedding_gs matrix from a pruning
    checkpoint — this framework's .npy or the reference's torch artifact
    (quantizer_embeddings.pt, trainer.py:2159-2161)."""
    p = os.path.join(pruning_ckpt_dir, "quantizer_embeddings.npy")
    if os.path.exists(p):
        return np.load(p)
    for name in ("quantizer_embeddings.pt", os.path.join("quantizer", "quantizer_embeddings.pt")):
        p = os.path.join(pruning_ckpt_dir, name)
        if os.path.exists(p):
            import torch

            return np.asarray(torch.load(p, map_location="cpu", weights_only=True))
    raise FileNotFoundError(f"no quantizer embeddings under {pruning_ckpt_dir}")


def load_arch_vector_from_pruning_ckpt(pruning_ckpt_dir: str, expert_id: int) -> np.ndarray:
    """Read one expert's arch vector from a pruning checkpoint."""
    return load_quantizer_embeddings(pruning_ckpt_dir)[expert_id][None, :]


class FineTuneTrainer(BaseTrainer):
    def init_models(self):
        cfg = self.config
        self.unet_cfg = unet_config_from(cfg)
        self.full_spec = build_unet_spec(self.unet_cfg)
        self.layout = gate_layout_for_config(self.unet_cfg)
        self.teacher = UNet2DConditionModel(self.full_spec, dtype=self.dtype)

        # teacher weights: local HF dir or random init (tests)
        root = str(cfg.get("pretrained_model_name_or_path", ""))
        unet_dir = os.path.join(root, "unet")
        key = jax.random.PRNGKey(self.seed)
        sample = jnp.zeros((1, self.unet_cfg.sample_size, self.unet_cfg.sample_size,
                            self.unet_cfg.in_channels))
        ctx = jnp.zeros((1, 7, self.unet_cfg.cross_attention_dim))
        if os.path.isdir(unet_dir):
            teacher_params = load_diffusers_unet(unet_dir, self.full_spec)
        else:
            teacher_params = host_init(
                self.teacher.init, key, sample, jnp.array([0]), ctx
            )["params"]

        arch_vector = self._resolve_arch_vector()
        if arch_vector is not None:
            self.arch_vector = arch_vector
            self.student_spec, student_params = materialize_pruned(
                self.full_spec, self.layout, teacher_params, arch_vector
            )
            np.save(os.path.join(self.logging_dir, "arch_vector.npy"), arch_vector)
        else:  # no-pruning baseline: student is a copy of the teacher
            self.arch_vector = None
            self.student_spec = self.full_spec
            student_params = teacher_params
        self.student = UNet2DConditionModel(
            self.student_spec, dtype=self.dtype,
            remat=bool(self.config.get_path("training.gradient_checkpointing", False)),
            remat_policy=self.config.get_path("training.remat_policy", None),
        )

        if cfg.get("random_init"):
            student_params = host_init(
                UNet2DConditionModel(self.student_spec).init,
                jax.random.PRNGKey(self.seed + 1), sample, jnp.array([0]), ctx,
            )["params"]

        self.build_frozen_towers()

        n_teacher = sum(np.asarray(x).size for x in jax.tree.leaves(teacher_params))
        n_student = sum(np.asarray(x).size for x in jax.tree.leaves(student_params))
        logger.info(
            "teacher params: %.1fM | student params: %.1fM (%.1f%%)",
            n_teacher / 1e6, n_student / 1e6, 100.0 * n_student / n_teacher,
        )

        # deep-copy: materialize_pruned shares unsliced leaves with the
        # teacher tree, and the train step donates the student params —
        # aliased buffers would invalidate the frozen teacher
        self.params = replicate(jax.tree.map(np.copy, student_params), self.mesh)
        self.frozen = self.place_frozen(
            {"teacher": jax.tree.map(jnp.asarray, teacher_params),
             "vae": self.vae_params}
        )

    def _resolve_arch_vector(self) -> Optional[np.ndarray]:
        cfg = self.config
        if cfg.get("pruning_ckpt_dir"):
            if cfg.get("pruning_type", "multi-expert") == "multi-expert":
                assert cfg.get("expert_id") is not None, "expert_id required"
                return load_arch_vector_from_pruning_ckpt(
                    cfg.pruning_ckpt_dir, int(cfg.expert_id)
                )
            # single-expert: the hypernet's learned single arch param
            p = os.path.join(cfg.pruning_ckpt_dir, "arch_vector.npy")
            if os.path.exists(p):
                return np.load(p)
            p = os.path.join(cfg.pruning_ckpt_dir, "hypernet", "arch.npy")
            if os.path.exists(p):
                return np.load(p)
            raise FileNotFoundError("single-expert arch vector not found")
        ratio = cfg.get_path("model.prediction_model.random_pruning_ratio")
        if ratio:
            return self.layout.random_arch_vector(float(ratio), seed=self.seed)
        return None

    # ---- data ---------------------------------------------------------------
    def init_datasets(self):
        cfg = self.config
        ds = get_dataset(cfg, "train")
        ds = self._maybe_filter_by_expert(ds)
        self.dataset = ds
        bs = int(cfg.get_path("data.dataloader.train_batch_size", 8))
        # per-host shard of the records (replaces DistributedSampler /
        # dist_utils.nodesplitter; device-level sharding happens in shard_batch)
        # decode-heavy collates (PIL on the pixel path) overlap across threads;
        # reference leaves this at 0 workers in-process (SURVEY §3.5). The
        # synthetic collate shares one numpy Generator -> keep it single-thread.
        workers = resolve_num_workers(
            cfg.get_path("data.dataloader.dataloader_num_workers")
        )
        if isinstance(ds, SyntheticDataset):
            workers = 1
        self.train_loader = DataLoader(
            list(range(len(ds))), bs, self._make_collate(ds, train=True), seed=self.seed,
            num_shards=jax.process_count(), shard_index=jax.process_index(),
            num_workers=workers,
        )
        # held-out validation split (reference keeps dataset["validation"] and
        # truncates to max_validation_samples, trainer.py:89-93, 252-258)
        try:
            val_ds = get_dataset(cfg, "validation")
        except Exception as e:  # e.g. COCO dir without val annotations
            logger.warning("no validation split (%s); validate() uses losses only on train", e)
            self.val_dataset = self.val_loader = None
            return
        self.val_dataset = val_ds
        vbs = int(cfg.get_path("data.dataloader.validation_batch_size", 0) or bs)
        self.val_loader = DataLoader(
            list(range(len(val_ds))), vbs, self._make_collate(val_ds, train=False),
            shuffle=False, seed=self.seed,
            num_shards=jax.process_count(), shard_index=jax.process_index(),
        )

    def _mpnet_encoder(self):
        """Caption list -> mean-pooled MPNet embeddings, or None when the
        MPNet tower has no weights. Shared by dataset filtering and the
        text-embedding precompute (reference encodes per batch in-loop,
        data_utils.py:231-244)."""
        if self.mpnet_params is None:
            return None
        from transformers import AutoTokenizer

        from ..models.mpnet import mean_pool

        tok = AutoTokenizer.from_pretrained(str(self.config.get("mpnet_model")))
        # fixed pad length so the jitted tower compiles once per precompute
        pad_len = min(int(getattr(tok, "model_max_length", 128) or 128), 128)

        @jax.jit
        def fwd(ids, mask):
            hidden = self.mpnet.apply({"params": self.mpnet_params}, ids, mask)
            return mean_pool(hidden, mask)

        def encode(captions):
            enc = tok(captions, padding="max_length", truncation=True,
                      max_length=pad_len, return_tensors="np")
            return fwd(jnp.asarray(enc["input_ids"]), jnp.asarray(enc["attention_mask"]))

        return encode

    def _load_pruning_hypernet(self, input_dim: int):
        """Hypernet params from a pruning checkpoint: the reference's torch
        layout (hypernet/ subfolder with safetensors/bin) or this framework's
        own orbax pruning checkpoint (PruningTrainer.save_checkpoint)."""
        from ..models.hypernet import convert_hypernet
        from ..models.convert import load_torch_state_dict

        root = str(self.config.pruning_ckpt_dir)
        hdir = os.path.join(root, "hypernet")
        for name in ("diffusion_pytorch_model.safetensors", "pytorch_model.bin",
                     "model.safetensors"):
            p = os.path.join(hdir, name)
            if os.path.exists(p):
                return convert_hypernet(load_torch_state_dict(p), self.layout)
        state_dir = os.path.join(root, "state")
        if os.path.isdir(state_dir):
            import orbax.checkpoint as ocp

            tree = ocp.StandardCheckpointer().restore(state_dir)
            hp = tree.get("trainable", {}).get("hypernet")
            if hp is not None:
                return jax.tree.map(np.asarray, hp)
        return None

    def _maybe_filter_by_expert(self, ds):
        """Keep only captions routed to this expert (reference
        UnetFineTuner.init_datasets + filter_dataset, trainer.py:2200-2231,
        data_utils.py:322-350). Requires the pruning checkpoint's hypernet +
        quantizer and MPNet embeddings; silently skipped for synthetic runs."""
        cfg = self.config
        if not (cfg.get_path("data.filter_dataset") and cfg.get("pruning_ckpt_dir")
                and cfg.get("expert_id") is not None):
            return ds
        encode_mpnet = None if isinstance(ds, SyntheticDataset) else self._mpnet_encoder()
        if encode_mpnet is None:
            logger.warning("filter_dataset requested but MPNet weights unavailable; skipping")
            return ds

        from ..data import filter_dataset_by_expert
        from ..data.preprocess import TextEmbeddingCache
        from ..models.hypernet import HyperStructure
        from ..models.quantizer import QuantizerConfig

        from ..data.preprocess import params_fingerprint

        cache = TextEmbeddingCache(encode_mpnet, None, cfg.get("cache_dir"),
                                   batch_size=256,
                                   fingerprint=params_fingerprint(self.mpnet_params))
        emb, _ = cache([r.caption for r in ds.records])

        hn = HyperStructure(self.layout, input_dim=emb.shape[1])
        hparams = self._load_pruning_hypernet(emb.shape[1])
        if hparams is None:
            logger.warning("no hypernet weights in pruning ckpt; skipping filtering")
            return ds
        qcfg = QuantizerConfig(layout=self.layout)
        emb_gs = load_quantizer_embeddings(cfg.pruning_ckpt_dir)
        qstate = {"embedding_gs": jnp.asarray(emb_gs), "prunable_macs_template": None}
        mask = filter_dataset_by_expert(
            emb, hn, hparams, qcfg, {"embedding": jnp.asarray(emb_gs)}, qstate,
            int(cfg.expert_id),
        )
        kept = [r for r, m in zip(ds.records, mask) if m]
        logger.info("expert %s dataset filter: kept %d/%d captions",
                    cfg.expert_id, len(kept), len(ds.records))
        if not kept:
            raise ValueError(
                f"expert {cfg.expert_id} was assigned 0/{len(ds.records)} "
                "captions — wrong expert_id or a collapsed codebook"
            )

        class _Filtered:
            def __init__(self, records):
                self.records = records

            def __len__(self):
                return len(self.records)

            def __getitem__(self, i):
                return self.records[i]

        return _Filtered(kept)

    def _make_collate(self, ds, train: bool = True):
        cfg = self.config
        resolution = int(cfg.get_path("model.prediction_model.resolution", 512))
        seq = int(cfg.get_path("data.synthetic_seq_len", 7))
        xdim = self.unet_cfg.cross_attention_dim
        synthetic = isinstance(ds, SyntheticDataset)

        if synthetic:
            res = int(cfg.get_path("data.resolution", 16))
            rng = np.random.default_rng(self.seed if train else self.seed + 1)

            def collate(indices):
                b = len(indices)
                return {
                    "pixel_values": rng.standard_normal((b, res, res, 3)).astype(np.float32),
                    "prompt_embeds": rng.standard_normal((b, seq, xdim)).astype(np.float32),
                    "empty_prompt_embeds": np.zeros((b, seq, xdim), np.float32),
                    "mpnet_embeddings": rng.standard_normal((b, 768)).astype(np.float32),
                }

            return collate

        from ..data.preprocess import image_transform

        transform = image_transform(
            resolution,
            center_crop=(not train) or bool(cfg.get_path("data.dataloader.center_crop", False)),
            random_flip=train and bool(cfg.get_path("data.dataloader.random_flip", True)),
        )
        embeds = self._precompute_text_embeddings([r.caption for r in ds.records])

        moments = None
        if cfg.get_path("data.precompute_latents"):
            # production input pipeline: VAE posterior moments cached once
            # (center-crop, no flip — fixes augmentation; opt-in tradeoff,
            # see data/preprocess.py::LatentMomentsCache)
            moments = self._precompute_latent_moments(ds, resolution)

        def collate(indices):
            pe = [embeds["prompt_embeds"][i] for i in indices]
            ee = [embeds["empty_prompt_embeds"] for _ in indices]
            batch = {
                "prompt_embeds": np.stack(pe).astype(np.float32),
                "empty_prompt_embeds": np.stack(ee).astype(np.float32),
            }
            if embeds.get("mpnet") is not None:
                batch["mpnet_embeddings"] = np.stack(
                    [embeds["mpnet"][i] for i in indices]
                ).astype(np.float32)
            if moments is not None:
                batch["latent_moments"] = np.stack(
                    [moments[i] for i in indices]
                ).astype(np.float32)
            else:
                # native fused decode->resize->crop when available (thread
                # pool inside the extension, GIL released); PIL fallback
                batch["pixel_values"] = np.stack(
                    transform.from_paths([ds.records[i].image for i in indices])
                )
            return batch

        return collate

    def _precompute_latent_moments(self, ds, resolution):
        from ..data.preprocess import LatentMomentsCache, LazyImages, image_transform

        fixed = image_transform(resolution, center_crop=True, random_flip=False)

        @jax.jit
        def encode_moments(px):
            mean, logvar = self.vae.apply(
                {"params": self.vae_params}, px, method=self.vae.encode_moments
            )
            return mean, logvar

        from ..data.preprocess import params_fingerprint

        cache = LatentMomentsCache(
            lambda imgs: encode_moments(jnp.asarray(imgs)),
            cache_dir=self.config.get("cache_dir") or self.logging_dir,
            fingerprint=params_fingerprint(self.vae_params),
        )
        # images decode lazily inside the cache: one encode batch in RAM
        import hashlib

        key = hashlib.sha1(
            ("\x00".join(r.image or "" for r in ds.records) + f"@{resolution}").encode()
        ).hexdigest()[:16]
        return cache(LazyImages(ds.records, fixed), key=key)

    def _precompute_text_embeddings(self, captions):
        """Tokenize + encode all captions once with the Flax CLIP (+MPNet)
        towers, streamed to on-disk memmaps (data/preprocess.py)."""
        assert self.text_params is not None, (
            "text encoder weights required for real datasets"
        )
        from transformers import CLIPTokenizer

        from ..data.preprocess import TextEmbeddingCache

        root = str(self.config.get("pretrained_model_name_or_path", ""))
        tok = CLIPTokenizer.from_pretrained(os.path.join(root, "tokenizer"))

        @jax.jit
        def fwd(ids):
            hidden, _ = self.text_encoder.apply({"params": self.text_params}, ids)
            return hidden

        def encode_clip(chunk):
            ids = tok(
                chunk, padding="max_length", truncation=True,
                max_length=tok.model_max_length, return_tensors="np",
            ).input_ids
            return fwd(jnp.asarray(ids))

        from ..data.preprocess import params_fingerprint

        cache = TextEmbeddingCache(
            encode_clip, self._mpnet_encoder(),
            cache_dir=self.config.get("cache_dir") or self.logging_dir,
            fingerprint=params_fingerprint(
                {"clip": self.text_params, "mpnet": self.mpnet_params or {}}
            ),
        )
        prompt_embeds, mpnet = cache(list(captions))
        empty = np.asarray(encode_clip([""]))[0]
        return {
            "prompt_embeds": prompt_embeds,
            "empty_prompt_embeds": empty,
            "mpnet": mpnet,
        }

    # ---- optimization ---------------------------------------------------------
    def _use_packed(self) -> bool:
        return bool(self.config.get_path("training.packed_dispatch", False))

    def _place_opt_state(self, opt_state):
        """ZeRO-1 moment sharding over the dp mesh by default (reference has
        no equivalent — its optimizer state is replicated per DDP rank).
        packed_dispatch keeps states replicated: sharding a flat buffer would
        put unpack slices across shard boundaries."""
        from ..parallel import shard_moments

        if self._use_packed():
            if self.config.get_path("training.optim.shard_optimizer_states", None):
                raise ValueError(
                    "training.optim.shard_optimizer_states (ZeRO-1) and "
                    "training.packed_dispatch are mutually exclusive — pick one"
                )
            return replicate(opt_state, self.mesh)
        if self.config.get_path("training.optim.shard_optimizer_states", True):
            return shard_moments(opt_state, self.mesh)
        return replicate(opt_state, self.mesh)

    def init_optimizers(self):
        self.tx = self.make_tx()
        self.opt_state = self._place_opt_state(
            self.tx.init(jax.tree.map(np.asarray, jax.device_get(self.params)))
        )

    # ---- packed dispatch ------------------------------------------------------
    # The step boundary carries thousands of leaf buffers (params + optimizer
    # states + frozen towers); per-dispatch bookkeeping is ~9us/buffer on the
    # v5e tunnel. training.packed_dispatch flattens small leaves into per-dtype
    # flat buffers that unpack INSIDE the jitted step (utils/packing.py) —
    # self.params/opt_state/frozen then hold flat dicts between steps, and the
    # checkpoint/validation/sampling boundaries unpack on demand.
    def _setup_packing(self):
        if getattr(self, "_packed", None) is not None:
            return  # idempotent: DreamBooth re-enters make_steps
        self._packed = self._use_packed()
        if not self._packed:
            return
        from ..utils.packing import make_pack_spec, pack

        thr = int(self.config.get_path(
            "training.pack_threshold", 2 * 1024 * 1024) or 0)
        self._pk = {
            "param": make_pack_spec(self.params, max_leaf_bytes=thr),
            "opt": make_pack_spec(self.opt_state, max_leaf_bytes=thr),
            "frozen": make_pack_spec(self.frozen, max_leaf_bytes=thr),
        }
        self.params = jax.jit(lambda t: pack(t, self._pk["param"]))(self.params)
        self.opt_state = jax.jit(lambda t: pack(t, self._pk["opt"]))(self.opt_state)
        self.frozen = jax.jit(lambda t: pack(t, self._pk["frozen"]))(self.frozen)

    def _unpacked(self, flat, which: str):
        """Device tree view of a packed buffer dict (packed mode only).
        The jitted unpacker is cached per spec — a fresh lambda per call
        would retrace every time."""
        from ..utils.packing import unpack

        cache = self.__dict__.setdefault("_unpack_fns", {})
        if which not in cache:
            spec = self._pk[which]
            cache[which] = jax.jit(lambda f: unpack(f, spec))
        return cache[which](flat)

    def _host_tree(self, obj, which: str):
        """Host pytree of params/opt_state/frozen, packed-aware."""
        if getattr(self, "_packed", False):
            obj = self._unpacked(obj, which)
        return jax.device_get(obj)

    def _pack_placed(self, tree, which: str):
        """Host tree -> replicated packed buffers (packed mode only)."""
        from ..utils.packing import pack_host

        return replicate(pack_host(tree, self._pk[which]), self.mesh)

    def make_steps(self):
        self._setup_packing()
        if self._packed:
            from .steps import make_packed_finetune_step

            self.step_fn = make_packed_finetune_step(
                self.student, self.teacher, self.vae, self.sched, self.loss_cfg,
                self.tx, self._pk["param"], self._pk["opt"], self._pk["frozen"],
                grad_accum=self.grad_accum,
            )
            return
        self.step_fn = make_finetune_step(
            self.student, self.teacher, self.vae, self.sched, self.loss_cfg, self.tx,
            grad_accum=self.grad_accum,
        )

    def run_step(self, batch, rng) -> Dict:
        self.params, self.opt_state, metrics = self.step_fn(
            self.params, self.opt_state, self.frozen, batch, rng
        )
        return metrics

    # ---- validation / sample logging --------------------------------------------
    def validate(self):
        """Validation losses on the held-out split (reference
        UnetFineTuner.validate, trainer.py:2490-2533), plus optional
        sample-image logging when `data.prompts` is set."""
        import functools

        if self.val_loader is None:
            self.log_samples()
            return
        if not hasattr(self, "_eval_fn"):

            @functools.partial(jax.jit)
            def eval_fn(params, frozen, batch, rng):
                from .steps import _forward_process, _get_latents
                from ..losses import diffusion_loss

                k_vae, k_fwd = jax.random.split(rng)
                latents = _get_latents(self.vae, frozen["vae"], batch, k_vae)
                noisy, timesteps, target = _forward_process(
                    self.sched, self.loss_cfg, latents, k_fwd
                )
                pred = self.student.apply(
                    {"params": params}, noisy, timesteps, batch["prompt_embeds"]
                )
                return diffusion_loss(
                    pred, target, timesteps, self.sched.alphas_cumprod,
                    self.loss_cfg.snr_gamma, self.sched.prediction_type,
                )

            self._eval_fn = eval_fn

        from ..parallel import shard_batch

        max_batches = int(
            self.config.get_path("training.max_validation_batches", 0) or 8
        )
        params, frozen = self.params, self.frozen
        if getattr(self, "_packed", False):
            params = self._unpacked(params, "param")
            frozen = self._unpacked(frozen, "frozen")
        losses = []
        for i, batch in enumerate(self.val_loader):
            if i >= max_batches:
                break
            batch = shard_batch(batch, self.mesh)
            losses.append(float(self._eval_fn(
                params, frozen, batch, jax.random.PRNGKey(1000 + i)
            )))
        if losses:
            self.tracker.log({"val_loss": float(np.mean(losses))}, step=self.global_step)
            logger.info("validation | val_loss=%.4f", float(np.mean(losses)))
        self.log_samples()

    def log_samples(self):
        """Generate and save sample images for config prompts (reference
        generate_samples_from_prompts, trainer.py:2543)."""
        if not self.tracker.primary_host:
            return  # the sampling pipeline is host-local (no mesh)
        prompts = self.sample_prompts()
        if not prompts or self.text_params is None:
            return
        from ..pipelines import SDPipeline

        pipe = SDPipeline(
            self.student, self._host_tree(self.params, "param"), self.vae,
            self.vae_params, self.sched, scheduler_type="ddim",
            text_encoder=self.text_encoder, text_params=self.text_params,
        )
        try:
            from transformers import CLIPTokenizer

            root = str(self.config.get("pretrained_model_name_or_path", ""))
            pipe.tokenizer = CLIPTokenizer.from_pretrained(os.path.join(root, "tokenizer"))
        except Exception:
            return
        pe = pipe.encode_prompts(list(prompts))
        empty = pipe.encode_prompts([""] * len(prompts))
        res = int(self.config.get_path("model.prediction_model.resolution", 512))
        steps = int(self.config.get_path("training.num_inference_steps", 10))
        # generation chunked by data.dataloader.image_generation_batch_size
        # (reference trainer.py:708-710); the last chunk pads to the chunk
        # size so the denoise loop keeps ONE compiled shape, then is sliced
        gbs = int(self.config.get_path(
            "data.dataloader.image_generation_batch_size", 0) or 0) or len(prompts)
        chunks = []
        for s in range(0, len(prompts), gbs):
            cpe, cem = pe[s:s + gbs], empty[s:s + gbs]
            pad = gbs - cpe.shape[0]
            if pad:
                cpe = jnp.concatenate([cpe, jnp.repeat(cpe[-1:], pad, axis=0)])
                cem = jnp.concatenate([cem, jnp.repeat(cem[-1:], pad, axis=0)])
            out = pipe.generate_samples(cpe, cem, steps, 7.5, res, res,
                                        seed=self.seed + self.global_step + s)
            chunks.append(out[: gbs - pad] if pad else out)
        imgs = np.concatenate(chunks, axis=0)
        out_dir = os.path.join(self.logging_dir, f"samples-{self.global_step}")
        os.makedirs(out_dir, exist_ok=True)
        from ..utils.image_io import save_image

        for i, img in enumerate(imgs):
            save_image(img, os.path.join(out_dir, f"{i}.png"))
        logger.info("logged %d sample images to %s", len(imgs), out_dir)

    # ---- checkpointing ----------------------------------------------------------
    def save_checkpoint(self):
        tree = {
            "params": self._host_tree(self.params, "param"),
            "opt_state": self._host_tree(self.opt_state, "opt"),
            "step": self.global_step,
        }
        self.ckpt.save(
            self.global_step, tree,
            arch_vector=self.arch_vector,
            spec_json=spec_to_json(self.student_spec),
        )
        logger.info("saved checkpoint-%d", self.global_step)

    def maybe_resume(self):
        mode = self.config.get_path("training.logging.resume_from_checkpoint")
        if not mode:
            return
        step = self.ckpt.latest_step()
        if step is None:
            return
        tree = {
            "params": self._host_tree(self.params, "param"),
            "opt_state": self._host_tree(self.opt_state, "opt"),
            "step": 0,
        }
        restored = self.ckpt.restore(step, tree)
        if getattr(self, "_packed", False):
            self.params = self._pack_placed(restored["params"], "param")
            self.opt_state = self._pack_placed(restored["opt_state"], "opt")
        else:
            self.params = replicate(restored["params"], self.mesh)
            self.opt_state = self._place_opt_state(restored["opt_state"])
        self.global_step = int(restored["step"])
        logger.info("resumed from checkpoint-%d", step)


class SingleArchFineTuneTrainer(FineTuneTrainer):
    """pruning_type=single-expert (reference SingleArchUnetFinetuner)."""

    def _resolve_arch_vector(self):
        self.config["pruning_type"] = "single-expert"
        return super()._resolve_arch_vector()


class BaselineFineTuneTrainer(FineTuneTrainer):
    """Baselines (reference BaselineUnetFineTuner, trainer.py:3482-3581):
    baseline_type in {random, no-pruning, structural}."""

    def _resolve_arch_vector(self):
        bt = self.config.get("baseline_type", "no-pruning")
        if bt == "random":
            ratio = float(
                self.config.get_path("model.prediction_model.random_pruning_ratio", 0.7)
            )
            return self.layout.random_arch_vector(ratio, seed=self.seed)
        if bt == "structural":
            p = os.path.join(str(self.config.get("pruning_ckpt_dir", "")), "arch_vector.npy")
            return np.load(p)
        if bt == "magnitude":
            # deferred: computed in init_models once teacher weights exist
            self._magnitude_pending = True
            return None
        return None  # no-pruning

    def init_models(self):
        # run the standard init; then, for the magnitude baseline, derive the
        # arch vector from the (loaded) teacher weights and re-materialize
        FineTuneTrainer.init_models(self)
        if getattr(self, "_magnitude_pending", False):
            from ..baselines.magnitude import magnitude_arch_vector
            from ..models import materialize_pruned
            from ..parallel import replicate as _rep

            teacher_params = jax.device_get(self.frozen)["teacher"]
            ratio = float(
                self.config.get_path("model.prediction_model.random_pruning_ratio", 0.7)
            )
            arch = magnitude_arch_vector(teacher_params, self.full_spec, self.layout, ratio)
            self.arch_vector = arch
            self.student_spec, student_params = materialize_pruned(
                self.full_spec, self.layout, teacher_params, arch
            )
            from ..models import UNet2DConditionModel

            self.student = UNet2DConditionModel(
                self.student_spec, dtype=self.dtype,
                remat=bool(self.config.get_path("training.gradient_checkpointing", False)),
                remat_policy=self.config.get_path("training.remat_policy", None),
            )
            self.params = _rep(jax.tree.map(np.copy, student_params), self.mesh)
            np.save(os.path.join(self.logging_dir, "arch_vector.npy"), arch)
