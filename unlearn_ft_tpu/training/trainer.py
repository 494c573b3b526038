"""Base trainer: config -> models/mesh/data/optimizer/checkpoints/loop.

TPU-native counterpart of the reference Trainer ABC
(pdm/training/trainer.py:69-756). Differences by design:

- no accelerate: the mesh + sharded jit steps replace DDP; mixed precision is
  a dtype policy on the modules; grad sync is XLA's psum.
- models load from *local* HF-layout directories via the host-side converters
  (models/convert.py) or are randomly initialized from config (tests/smoke).
- text embeddings are precomputed per dataset (data/preprocess.py), so the
  hot loop only moves pixels.
"""
from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import (
    UNet2DConditionModel,
    UNetConfig,
    build_unet_spec,
    gate_layout_for_config,
)
from ..models.clip_text import CLIPTextConfig, CLIPTextModel
from ..models.mpnet import MPNetConfig, MPNetModel
from ..models.vae import AutoencoderKL, VAEConfig
from ..parallel import create_mesh, replicate, shard_batch
from ..schedulers import DiffusionSchedule
from ..utils.config import Config
from ..utils.logging_utils import Tracker, init_logging_dir, logger
from .checkpoint import CheckpointManager, spec_to_json
from .optim import make_optimizer
from .steps import LossConfig


def unet_config_from(config: Config) -> UNetConfig:
    """Build a UNetConfig from the training YAML: SD-2.1 defaults + the
    reference's block-type keys + optional `unet_config` field overrides."""
    pm = config.model.prediction_model
    kwargs: Dict = {}
    if pm.get("unet_down_blocks"):
        kwargs["down_block_types"] = tuple(pm.unet_down_blocks)
    if pm.get("unet_mid_block"):
        kwargs["mid_block_type"] = pm.unet_mid_block
    if pm.get("unet_up_blocks"):
        kwargs["up_block_types"] = tuple(pm.unet_up_blocks)
    kwargs["gated_ff"] = pm.get("gated_ff", True)
    kwargs["ff_gate_width"] = pm.get("ff_gate_width", 32)
    for k, v in (pm.get("unet_config") or {}).items():
        kwargs[k] = tuple(v) if isinstance(v, list) else v
    return UNetConfig(**kwargs)


def resolve_learning_rate(config: Config, lr_key, grad_accum: int = 1) -> float:
    """LR from the first present ``training.optim.<key>`` (``lr_key`` may be a
    tuple of fallback spellings), with the reference's optional sqrt scaling
    rule: under ``training.optim.scale_lr`` the LR scales by
    sqrt(grad_accum x per-process batch x world size) (init_optimizer,
    trainer.py:870-884; the loader batch here is per-process)."""
    g = config.get_path
    keys = (lr_key,) if isinstance(lr_key, str) else tuple(lr_key)
    lr = next(
        (v for v in (g(f"training.optim.{k}") for k in keys) if v is not None),
        1e-6,
    )
    if g("training.optim.scale_lr"):
        scaling = (
            max(1, int(grad_accum))
            * int(g("data.dataloader.train_batch_size", 8))
            * jax.process_count()
        )
        lr = float(lr) * float(np.sqrt(scaling))
    return float(lr)


def host_init(fn, *args, **kwargs):
    """Run a random flax ``init`` (or any one-shot initializer) on the host
    CPU backend and return numpy leaves.

    The random-init path exists for tests/smoke (real runs load converted
    checkpoints host-side, models/convert.py), but it must not die on
    accelerator quirks: an init program carries one threefry instance per
    param leaf, which the axon TPU platform's remote compile helper cannot
    handle (hang/SIGKILL at hundreds of instances — measured r5: a tiny
    CLI trainer stalled >25 min in ``Module.init`` on-chip). One-shot init
    programs gain nothing from the accelerator anyway; compile them for
    CPU and let ``replicate``/``shard`` place the results later.
    """
    cpu = jax.local_devices(backend="cpu")[0]
    args, kwargs = jax.device_get((args, kwargs))
    with jax.default_device(cpu):
        out = fn(*args, **kwargs)
    return jax.device_get(out)


def load_diffusers_unet(path: str, spec):
    from ..models.convert import convert_unet, load_torch_state_dict

    for name in ("diffusion_pytorch_model.safetensors", "diffusion_pytorch_model.bin"):
        p = os.path.join(path, name)
        if os.path.exists(p):
            return convert_unet(load_torch_state_dict(p), spec)
    raise FileNotFoundError(f"no unet weights under {path}")


class BaseTrainer:
    """Owns config/mesh/schedule/logging/checkpoints and the train loop
    scaffold; subclasses implement init_models/init_datasets/make_steps/
    train_step_fn dispatch."""

    def __init__(self, config: Config):
        self.config = config
        self.seed = int(config.get("seed", 43))
        self.rng = jax.random.PRNGKey(self.seed)
        self.mesh = create_mesh(config.get("num_devices"))
        self.dtype = {
            "bf16": jnp.bfloat16, "fp16": jnp.float16,
        }.get(config.get("mixed_precision") or "no", jnp.float32)

        self.logging_dir = init_logging_dir(config)
        self.tracker = Tracker(config, self.logging_dir)
        self.ckpt = CheckpointManager(
            self.logging_dir,
            config.get_path("training.logging.checkpoints_total_limit"),
            # overlap the orbax write/rotate with training (the device->host
            # fetch still blocks — the steps donate their buffers); the loop
            # joins the last write before finishing
            async_save=bool(config.get_path("training.async_checkpointing", False)),
        )

        pm = config.model.prediction_model
        self.sched = DiffusionSchedule(
            prediction_type=pm.get("prediction_type", "v_prediction")
        )
        self.loss_cfg = self._make_loss_config()
        # one global_step = one optimizer update over grad_accum microbatches
        # (reference: accelerate's gradient_accumulation_steps, trainer.py:124)
        self.grad_accum = max(
            1, int(config.get_path("training.gradient_accumulation_steps", 1) or 1)
        )
        self.global_step = 0

        self.init_models()
        self.init_datasets()
        self._derive_max_train_steps()
        self.init_optimizers()
        self.make_steps()

    def _derive_max_train_steps(self):
        """With no ``training.max_train_steps``, derive it from
        ``training.num_train_epochs`` x ceil(batches-per-epoch / grad_accum)
        (reference update_config_params, trainer.py:445-450) — BEFORE the
        optimizers so decaying LR schedules see the real total_steps."""
        cfg = self.config
        if cfg.get_path("training.max_train_steps") is not None:
            return
        epochs = cfg.get_path("training.num_train_epochs")
        loader = getattr(self, "train_loader", None)
        if not epochs or loader is None or len(loader) == 0:
            return
        import math

        per_epoch = math.ceil(len(loader) / self.grad_accum)
        cfg["training"]["max_train_steps"] = int(epochs) * per_epoch
        logger.info(
            "derived max_train_steps=%d from num_train_epochs=%s (%d update "
            "steps/epoch)", cfg.training.max_train_steps, epochs, per_epoch,
        )

    # ---- config plumbing ---------------------------------------------------
    def _make_loss_config(self) -> LossConfig:
        g = self.config.get_path
        pm = self.config.model.prediction_model
        return LossConfig(
            snr_gamma=g("training.losses.diffusion_loss.snr_gamma", 5.0),
            diffusion_weight=g("training.losses.diffusion_loss.weight", 1.0),
            distillation_weight=g("training.losses.distillation_loss.weight", 0.0),
            block_weight=g("training.losses.block_loss.weight", 0.0),
            upper_distillation_weight=g(
                "training.losses.distillation_loss.upper_weight", 1.0
            ),
            upper_block_weight=g("training.losses.block_loss.upper_weight", 0.0),
            contrastive_weight=g("training.losses.contrastive_loss.weight", 10.0),
            resource_weight=g("training.losses.resource_loss.weight", 2.0),
            resource_target=g("training.losses.resource_loss.pruning_target", 0.7),
            resource_type=g("training.losses.resource_loss.loss_type", "log"),
            std_weight=g("training.losses.std_loss.weight", 0.0),
            max_weight=g("training.losses.max_loss.weight", 0.0),
            noise_offset=pm.get("noise_offset", 0.0) or 0.0,
            input_perturbation=pm.get("input_perturbation", 0.0) or 0.0,
            max_scheduler_steps=pm.get("max_scheduler_steps"),
        )

    def make_tx(self, lr_key="prediction_model_learning_rate",
                wd_key="prediction_model_weight_decay"):
        """``lr_key`` may be a tuple of config keys tried in order (the
        reference renamed the bilevel upper LR across configs)."""
        g = self.config.get_path
        # training.optim.moment_dtype: fp32 (reference AdamW precision) or
        # bf16 (half optimizer-state HBM; second moment uses stochastic
        # rounding — optim.scale_by_adam_low_mem). bf16 is what fits the
        # bilevel mix's two states at batch 16 on a 16GB v5e chip.
        moment_dtype = g("training.optim.moment_dtype", "fp32")
        low = str(moment_dtype).replace("bfloat16", "bf16") == "bf16"
        lr = resolve_learning_rate(self.config, lr_key, self.grad_accum)
        return make_optimizer(
            learning_rate=float(lr),
            weight_decay=float(g(f"training.optim.{wd_key}", 0.0) or 0.0),
            beta1=float(g("training.optim.adam_beta1", 0.9)),
            beta2=float(g("training.optim.adam_beta2", 0.999)),
            eps=float(g("training.optim.adam_epsilon", 1e-8)),
            lr_scheduler=g("training.optim.lr_scheduler", "constant_with_warmup"),
            warmup_steps=int(g("training.optim.lr_warmup_steps", 0) or 0),
            total_steps=self.config.get_path("training.max_train_steps"),
            max_grad_norm=g("training.optim.max_grad_norm"),
            mu_dtype=jnp.bfloat16 if low else None,
            nu_dtype=jnp.bfloat16 if low else None,
        )

    # ---- shared model builders ----------------------------------------------
    def place_frozen(self, tree):
        """Frozen-tower device placement: replicated by default;
        ``parallel.shard_frozen: true`` shards them FSDP-style over the dp
        axis (parallel.shard_params — XLA all-gathers each weight at its
        use site) for towers that exceed per-chip HBM, e.g. full-scale
        Flux-dev's 11.8B frozen transformer (reference trains it on H100s,
        trainer.py:1596-2113)."""
        from ..parallel import shard_params

        if bool(self.config.get_path("parallel.shard_frozen", False)):
            return shard_params(tree, self.mesh)
        return replicate(tree, self.mesh)

    def build_frozen_towers(self):
        """VAE + CLIP (+MPNet) from local HF dirs, or tiny random models when
        the config carries explicit tiny configs (tests / smoke runs)."""
        cfg = self.config
        key = jax.random.PRNGKey(0)

        vae_cfg_dict = cfg.model.get("vae_config")
        if vae_cfg_dict:
            vae_cfg = VAEConfig(**{
                k: tuple(v) if isinstance(v, list) else v for k, v in vae_cfg_dict.items()
            })
        else:
            vae_cfg = VAEConfig()
        self.vae = AutoencoderKL(vae_cfg, dtype=self.dtype)

        root = cfg.get("pretrained_model_name_or_path", "")
        vae_dir = os.path.join(str(root), "vae")
        if os.path.isdir(vae_dir):
            from ..models.convert import convert_vae, load_torch_state_dict

            for name in ("diffusion_pytorch_model.safetensors", "diffusion_pytorch_model.bin"):
                p = os.path.join(vae_dir, name)
                if os.path.exists(p):
                    self.vae_params = convert_vae(
                        load_torch_state_dict(p), vae_cfg.block_out_channels,
                        vae_cfg.layers_per_block,
                    )
                    break
        else:
            res = 2 ** (len(vae_cfg.block_out_channels) - 1) * 2
            self.vae_params = host_init(
                self.vae.init, key, jnp.zeros((1, res * 4, res * 4, 3)), key
            )["params"]

        te_cfg_dict = cfg.model.get("text_encoder_config")
        clip_cfg = CLIPTextConfig(**(te_cfg_dict or {}))
        self.text_encoder = CLIPTextModel(clip_cfg, dtype=self.dtype)
        te_dir = os.path.join(str(root), "text_encoder")
        if os.path.isdir(te_dir):
            from ..models.convert import convert_clip_text, load_torch_state_dict

            for name in ("model.safetensors", "pytorch_model.bin"):
                p = os.path.join(te_dir, name)
                if os.path.exists(p):
                    self.text_params = convert_clip_text(
                        load_torch_state_dict(p), clip_cfg.num_hidden_layers
                    )
                    break
        else:
            self.text_params = None  # tests use synthetic prompt embeddings

        self._load_mpnet()

    def _load_mpnet(self):
        """MPNet prompt encoder (reference loads it unconditionally for the
        pruning stage and dataset filtering, trainer.py:790-800). Weights
        come from a local HF dir named by `mpnet_model`; tiny test configs
        may instead carry an explicit `model.mpnet_config`."""
        cfg = self.config
        mp_cfg_dict = cfg.model.get("mpnet_config")
        self.mpnet_cfg = MPNetConfig(**(mp_cfg_dict or {}))
        self.mpnet = MPNetModel(self.mpnet_cfg, dtype=self.dtype)
        self.mpnet_params = None
        mp_root = str(cfg.get("mpnet_model") or "")
        if os.path.isdir(mp_root):
            from ..models.convert import convert_mpnet, load_torch_state_dict

            for name in ("model.safetensors", "pytorch_model.bin"):
                p = os.path.join(mp_root, name)
                if os.path.exists(p):
                    self.mpnet_params = convert_mpnet(
                        load_torch_state_dict(p), self.mpnet_cfg.num_hidden_layers
                    )
                    break

    # ---- overridables -------------------------------------------------------
    def init_models(self):
        raise NotImplementedError

    def init_datasets(self):
        raise NotImplementedError

    def init_optimizers(self):
        raise NotImplementedError

    def make_steps(self):
        raise NotImplementedError

    def run_step(self, batch, rng) -> Dict:
        raise NotImplementedError

    def _next_batch(self, it):
        """One optimizer-step batch from an iterator of loader batches: the
        plain sharded batch, or — under gradient accumulation — grad_accum
        loader batches stacked to an [accum, batch, ...] leading axis with
        the batch axis sharded."""
        if self.grad_accum == 1:
            return shard_batch(next(it), self.mesh)
        micro = [next(it) for _ in range(self.grad_accum)]
        stacked = jax.tree.map(lambda *xs: np.stack(xs), *micro)
        return shard_batch(stacked, self.mesh, batch_axis=1)

    def save_checkpoint(self):
        pass

    def maybe_resume(self):
        pass

    # ---- the loop -----------------------------------------------------------
    def train(self):
        cfg = self.config
        max_steps = int(cfg.get_path("training.max_train_steps", 10))
        ckpt_steps = int(cfg.get_path("training.checkpoint_steps", 0) or 0)
        val_steps = int(cfg.get_path("training.validation_steps", 0) or 0)
        # sample images on their own cadence (reference image_logging_steps,
        # configs/baselines/*.yaml; trainer.py:2543) — validate() also logs
        img_steps = int(cfg.get_path("training.image_logging_steps", 0) or 0)
        self.maybe_resume()

        it = iter(self.train_loader.infinite())
        t0 = time.time()
        samples = 0
        self._steps_this_run = 0
        while self.global_step < max_steps:
            batch = self._next_batch(it)
            step_rng = jax.random.fold_in(self.rng, self.global_step)
            metrics = self.run_step(batch, step_rng)
            samples += (
                int(cfg.get_path("data.dataloader.train_batch_size", 8)) * self.grad_accum
            )
            self.global_step += 1
            if self._steps_this_run == 0 or getattr(self, "_reset_throughput_window", False):
                # a step that paid a jit compile (first step; or the first
                # fused-cadence flush, which lands at step upper_step_freq —
                # trainers signal it via _reset_throughput_window) restarts
                # the window so logged samples/sec reflects steady state
                self._reset_throughput_window = False
                jax.block_until_ready(metrics)
                t0 = time.time()
                samples = 0
            self._steps_this_run += 1

            if self.global_step % int(cfg.get_path("training.log_steps", 10) or 10) == 0:
                metrics = {k: v for k, v in metrics.items()}
                dt = time.time() - t0
                metrics["samples_per_sec"] = samples / max(dt, 1e-9)
                self.tracker.log(metrics, step=self.global_step)
                logger.info(
                    "step %d | %s", self.global_step,
                    " ".join(
                        f"{k}={float(v):.4f}" for k, v in metrics.items()
                        if np.ndim(v) == 0
                    ),
                )
            if val_steps and self.global_step % val_steps == 0:
                self.validate()
            if (img_steps and self.global_step % img_steps == 0
                    and not (val_steps and self.global_step % val_steps == 0)):
                self.log_samples()
            if ckpt_steps and self.global_step % ckpt_steps == 0:
                self.save_checkpoint()
        self.save_checkpoint()
        self.ckpt.wait()  # join + surface any async write failure
        self.tracker.finish()

    def validate(self):
        pass

    def log_samples(self):
        pass

    def sample_prompts(self):
        """`data.prompts` capped at `data.max_generated_samples` (reference
        trainer.py:432-434 slices the prompt list the same way)."""
        prompts = self.config.get_path("data.prompts") or []
        maxg = self.config.get_path("data.max_generated_samples")
        if maxg:
            prompts = list(prompts)[: int(maxg)]
        return list(prompts)
