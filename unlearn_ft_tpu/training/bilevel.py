"""Bilevel fine-tuning: lower DDPM+distill step interleaved with an upper
ESD-style concept-suppression step on a second optimizer.

Reference: BilevelUnetFineTuner (trainer.py:2577-3001), Nudity variant
(:3004-3016), DreamBooth variant (:3019-3398). Two optax states over one
param tree; the upper step fires every ``upper_step_freq`` lower steps
(host-side control), each step a separately-jitted pure function.
"""
from __future__ import annotations

import os
from typing import Dict

import jax
import numpy as np

from ..data import DataLoader
from ..data.datasets import HFDataset, SyntheticDataset
from ..parallel import replicate
from ..utils.logging_utils import logger
from .finetune import FineTuneTrainer
from .steps import make_bilevel_cadence_step, make_upper_step


class BilevelFineTuneTrainer(FineTuneTrainer):
    upper_dataset_name = "rezashkv/controlled_distillation"
    upper_style_filter_key = "erase_concept"  # e.g. "Van Gogh" / "Monet" / "Picasso"

    def init_datasets(self):
        super().init_datasets()
        self.init_upper_dataset()

    def init_upper_dataset(self):
        cfg = self.config
        if isinstance(self.dataset, SyntheticDataset):
            ds = SyntheticDataset(
                n=cfg.get_path("data.max_train_samples") or 64,
                resolution=cfg.get_path("data.resolution", 16),
                seed=self.seed + 7,
            )
        else:
            ds = HFDataset(
                cfg.get_path("data.upper_dataset_name", self.upper_dataset_name),
                style_filter=cfg.get(self.upper_style_filter_key),
                cache_dir=cfg.get("cache_dir"),
            )
        self.upper_dataset = ds
        bs = int(cfg.get_path("data.dataloader.train_batch_size", 8))
        self.upper_loader = DataLoader(
            list(range(len(ds))), bs, self._make_collate(ds), seed=self.seed + 7,
            num_shards=jax.process_count(), shard_index=jax.process_index(),
        )

    def init_optimizers(self):
        super().init_optimizers()
        self.upper_tx = self.make_tx(
            # the reference bilevel configs name the upper LR
            # prediction_model_upper_learning_rate (trainer.py:2688,
            # configs/baselines/*_bilevel.yaml:107); accept the legacy
            # unet_unlearning_learning_rate spelling as a fallback
            lr_key=("prediction_model_upper_learning_rate",
                    "unet_unlearning_learning_rate"),
            wd_key="prediction_model_weight_decay",
        )
        self.upper_opt_state = self._place_opt_state(
            self.upper_tx.init(jax.tree.map(np.asarray, jax.device_get(self.params)))
        )

    def make_steps(self):
        super().make_steps()
        if getattr(self, "_packed", False):
            from ..utils.packing import make_pack_spec, pack
            from .steps import make_packed_upper_step

            thr = int(self.config.get_path(
                "training.pack_threshold", 2 * 1024 * 1024) or 0)
            self._pk["upper_opt"] = make_pack_spec(
                self.upper_opt_state, max_leaf_bytes=thr)
            self.upper_opt_state = jax.jit(
                lambda t: pack(t, self._pk["upper_opt"]))(self.upper_opt_state)
            self.upper_step_fn = make_packed_upper_step(
                self.student, self.teacher, self.vae, self.sched, self.loss_cfg,
                self.upper_tx, self._pk["param"], self._pk["upper_opt"],
                self._pk["frozen"], grad_accum=self.grad_accum,
            )
        else:
            self.upper_step_fn = make_upper_step(
                self.student, self.teacher, self.vae, self.sched, self.loss_cfg,
                self.upper_tx, grad_accum=self.grad_accum,
            )
        # opt-in fused cadence: the whole upper_step_freq-lower+1-upper window
        # is ONE lax.scan program — one device dispatch per window instead of
        # freq+1 (removes the per-step host launch gap; see
        # steps.make_bilevel_cadence_step). DreamBooth keeps its own path.
        self._fused = bool(self.config.get_path("training.fused_cadence", False))
        if self._fused and getattr(self, "_packed", False):
            logger.warning(
                "training.fused_cadence is ignored under packed_dispatch "
                "(the packed boundary already removes the per-step dispatch "
                "gap, and measured fused+packed compute is slower)")
            self._fused = False
        if self._fused:
            freq = int(self.config.get_path("training.upper_step_freq", 10) or 10)
            self.cadence_fn = make_bilevel_cadence_step(
                self.student, self.teacher, self.vae, self.sched, self.loss_cfg,
                self.tx, self.upper_tx, lower_per_upper=freq,
                grad_accum=self.grad_accum,
            )

    def train(self):
        # wrap run_step with the upper-step cadence (trainer.py:2793-2816)
        self.upper_step_freq = int(
            self.config.get_path("training.upper_step_freq", 10) or 10
        )
        self._upper_it = iter(self.upper_loader.infinite())
        self._buffer = []
        self._last_metrics: Dict = {}
        self._lower_since_upper = 0  # cadence phase across partial flushes
        super().train()

    def run_step(self, batch, rng) -> Dict:
        if getattr(self, "_fused", False):
            # buffer lower batches; dispatch once per cadence window. The
            # params/opt-states lag by up to freq-1 steps between flushes —
            # validate()/save_checkpoint() flush first so observable state is
            # always exact. After a partial flush the window shrinks so the
            # upper step keeps firing every upper_step_freq lower steps.
            self._buffer.append(batch)
            self._flush_rng = rng
            if len(self._buffer) == self.upper_step_freq - self._lower_since_upper:
                self._flush_pending()
            return dict(self._last_metrics)
        metrics = super().run_step(batch, rng)
        if (self.global_step + 1) % self.upper_step_freq == 0:
            upper_batch = self._next_batch(self._upper_it)
            upper_rng = jax.random.fold_in(rng, 0xE5D)
            self.params, self.upper_opt_state, upper_metrics = self.upper_step_fn(
                self.params, self.upper_opt_state, self.frozen, upper_batch, upper_rng
            )
            metrics = {**metrics, **upper_metrics}
        return metrics

    def _flush_pending(self):
        """Apply buffered lower batches. An aligned full window runs the fused
        cadence (freq lowers + 1 upper in one dispatch); a partial one (at a
        validate/checkpoint boundary not divisible by upper_step_freq) replays
        the plain lower step — and still advances the cadence phase, firing
        the standalone upper step whenever freq lower steps have accumulated,
        so the ESD suppression schedule never starves or drifts. (Partial
        flushes compile the plain step functions too; keep
        validation_steps/checkpoint_steps multiples of upper_step_freq to
        stay on the single fused program.)"""
        if not getattr(self, "_buffer", None):
            return
        import jax.numpy as jnp

        freq = self.upper_step_freq
        if len(self._buffer) == freq and self._lower_since_upper == 0:
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *self._buffer)
            upper_batch = self._next_batch(self._upper_it)
            (self.params, self.opt_state, self.upper_opt_state, lm, um) = self.cadence_fn(
                self.params, self.opt_state, self.upper_opt_state, self.frozen,
                stacked, upper_batch, self._flush_rng,
            )
            self._last_metrics = {k: v[-1] for k, v in lm.items()}
            self._last_metrics.update(um)
        else:
            for i, b in enumerate(self._buffer):
                self.params, self.opt_state, self._last_metrics = self.step_fn(
                    self.params, self.opt_state, self.frozen, b,
                    jax.random.fold_in(self._flush_rng, i),
                )
                self._lower_since_upper += 1
                if self._lower_since_upper == freq:
                    upper_batch = self._next_batch(self._upper_it)
                    self.params, self.upper_opt_state, um = self.upper_step_fn(
                        self.params, self.upper_opt_state, self.frozen, upper_batch,
                        jax.random.fold_in(self._flush_rng, 0xE5D + i),
                    )
                    self._last_metrics = {**self._last_metrics, **um}
                    self._lower_since_upper = 0
        self._buffer = []
        if not getattr(self, "_window_reset_done", False):
            # the first flush paid the fused-cadence compile; ask the train
            # loop to restart its throughput window (trainer.py loop)
            self._reset_throughput_window = True
            self._window_reset_done = True

    def validate(self):
        self._flush_pending()
        super().validate()

    def log_samples(self):
        # image_logging_steps cadence: observable params must be exact
        self._flush_pending()
        super().log_samples()

    def save_checkpoint(self):
        self._flush_pending()
        tree = {
            "params": self._host_tree(self.params, "param"),
            "opt_state": self._host_tree(self.opt_state, "opt"),
            "upper_opt_state": self._host_tree(self.upper_opt_state, "upper_opt"),
            "step": self.global_step,
        }
        from .checkpoint import spec_to_json

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
            "upper_opt_state": self._host_tree(self.upper_opt_state, "upper_opt"),
            "step": 0,
        }
        restored = self.ckpt.restore(step, tree)
        if getattr(self, "_packed", False):
            self.params = self._pack_placed(restored["params"], "param")
            self.opt_state = self._pack_placed(restored["opt_state"], "opt")
            self.upper_opt_state = self._pack_placed(
                restored["upper_opt_state"], "upper_opt")
        else:
            self.params = replicate(restored["params"], self.mesh)
            self.opt_state = self._place_opt_state(restored["opt_state"])
            self.upper_opt_state = self._place_opt_state(restored["upper_opt_state"])
        self.global_step = int(restored["step"])
        logger.info("resumed from checkpoint-%d", step)


class NudityBilevelFineTuneTrainer(BilevelFineTuneTrainer):
    """Upper dataset = controlled_distillation_nudity, no style filter
    (reference NudityBilevelUnetFineTuner, trainer.py:3004-3016)."""

    upper_dataset_name = "rezashkv/controlled_distillation_nudity"

    def init_upper_dataset(self):
        self.config[self.upper_style_filter_key] = None
        super().init_upper_dataset()


class _ListDS:
    def __init__(self, records):
        self.records = records

    def __len__(self):
        return len(self.records)

    def __getitem__(self, i):
        return self.records[i]


class DreamBoothBilevelFineTuneTrainer(BilevelFineTuneTrainer):
    """Upper loop = DreamBooth with prior preservation (reference
    DreamBoothBilevelUnetFineTuner, trainer.py:3019-3398): every upper batch
    is [instance | prior] halves (the reference's DreamBoothDataset yields an
    instance/class pair per index, trainer.py:3073-3170) and the upper step
    adds ``prior_loss_weight * prior_loss`` (trainer.py:3382-3389). Class
    images are pre-generated with the current pruned student when
    ``class_data_dir`` holds fewer than ``num_class_images``
    (trainer.py:3039-3071, PromptDataset generation)."""

    def init_upper_dataset(self):
        cfg = self.config
        self.with_prior = bool(
            cfg.get_path("training.dreambooth.with_prior_preservation", True)
        )
        if isinstance(self.dataset, SyntheticDataset):
            # synthetic smoke path: pair random instance/class halves
            super().init_upper_dataset()
            if self.with_prior:
                base = self.upper_loader.collate

                def paired(indices):
                    return base(list(indices) + list(indices))

                self.upper_loader.collate = paired
            return
        from ..data.datasets import Record

        inst_dir = cfg.get_path("data.instance_data_dir")
        class_dir = cfg.get_path("data.class_data_dir")
        instance_prompt = cfg.get_path("data.instance_prompt", "a photo of sks thing")
        class_prompt = cfg.get_path("data.class_prompt", "a photo of a thing")

        instance = [
            Record(os.path.join(inst_dir, f), instance_prompt)
            for f in sorted(os.listdir(inst_dir))
        ]
        class_records = []
        if self.with_prior:
            if not class_dir:
                raise ValueError(
                    "dreambooth.with_prior_preservation requires data.class_data_dir"
                )
            self._ensure_class_images(class_dir, class_prompt)
            class_records = [
                Record(os.path.join(class_dir, f), class_prompt)
                for f in sorted(os.listdir(class_dir))
            ]
            if not class_records:
                raise ValueError(f"no class images in {class_dir}")

        records = instance + class_records
        self.upper_dataset = _ListDS(records)
        bs = int(cfg.get_path("data.dataloader.train_batch_size", 8))
        base = self._make_collate(self.upper_dataset)
        n_inst, n_class = len(instance), len(class_records)

        if self.with_prior:
            rng = np.random.default_rng(self.seed + 13)

            def collate(indices):
                # [instance | prior] halves of equal size (chunk(2) contract)
                ci = [n_inst + int(rng.integers(n_class)) for _ in indices]
                return base(list(indices) + ci)
        else:
            collate = base

        self.upper_loader = DataLoader(
            list(range(n_inst)), bs, collate, seed=self.seed + 7,
        )

    def _ensure_class_images(self, class_dir: str, class_prompt: str):
        """Generate missing class images with the current student pipeline
        (reference pre-generation loop, trainer.py:3039-3071)."""
        cfg = self.config
        os.makedirs(class_dir, exist_ok=True)
        want = int(cfg.get_path("training.dreambooth.num_class_images", 100))
        have = len(os.listdir(class_dir))
        if have >= want or self.text_params is None:
            return
        from ..pipelines import SDPipeline

        pipe = SDPipeline(
            self.student, jax.device_get(self.params), self.vae, self.vae_params,
            self.sched, scheduler_type="ddim", text_encoder=self.text_encoder,
            text_params=self.text_params,
        )
        from transformers import CLIPTokenizer

        root = str(cfg.get("pretrained_model_name_or_path", ""))
        pipe.tokenizer = CLIPTokenizer.from_pretrained(os.path.join(root, "tokenizer"))
        bs = int(cfg.get_path("training.dreambooth.sample_batch_size", 4))
        res = int(cfg.get_path("model.prediction_model.resolution", 512))
        steps = int(cfg.get_path("training.num_inference_steps", 25))
        pe = pipe.encode_prompts([class_prompt] * bs)
        empty = pipe.encode_prompts([""] * bs)
        from PIL import Image

        logger.info("generating %d class images into %s", want - have, class_dir)
        idx = have
        while idx < want:
            imgs = pipe.generate_samples(pe, empty, steps, 7.5, res, res,
                                         seed=self.seed + 1000 + idx,
                                         output_uint8=True)
            for img in imgs[: want - idx]:
                Image.fromarray(np.asarray(img)).save(
                    os.path.join(class_dir, f"class-{idx:05d}.png")
                )
                idx += 1

    def make_steps(self):
        # upper step = DDPM loss on the DreamBooth pairs + prior term
        from .steps import make_dreambooth_upper_step, make_packed_dreambooth_upper_step

        FineTuneTrainer.make_steps(self)
        if not hasattr(self, "upper_tx"):
            return
        plw = float(
            self.config.get_path("training.dreambooth.prior_loss_weight", 1.0))
        wpp = getattr(self, "with_prior", True)
        if getattr(self, "_packed", False):
            if "upper_opt" not in self._pk:  # idempotent across re-entry
                from ..utils.packing import make_pack_spec, pack

                thr = int(self.config.get_path(
                    "training.pack_threshold", 2 * 1024 * 1024) or 0)
                self._pk["upper_opt"] = make_pack_spec(
                    self.upper_opt_state, max_leaf_bytes=thr)
                self.upper_opt_state = jax.jit(
                    lambda t: pack(t, self._pk["upper_opt"]))(self.upper_opt_state)
            self._db_step = make_packed_dreambooth_upper_step(
                self.student, self.vae, self.sched, self.loss_cfg, self.upper_tx,
                self._pk["param"], self._pk["upper_opt"], self._pk["frozen"],
                prior_loss_weight=plw, with_prior_preservation=wpp,
            )
        else:
            self._db_step = make_dreambooth_upper_step(
                self.student, self.vae, self.sched, self.loss_cfg, self.upper_tx,
                prior_loss_weight=plw, with_prior_preservation=wpp,
            )

    def init_optimizers(self):
        super().init_optimizers()
        # rebuild the upper step now that upper_tx exists
        self.make_steps()

    def run_step(self, batch, rng):
        metrics = FineTuneTrainer.run_step(self, batch, rng)
        if (self.global_step + 1) % self.upper_step_freq == 0:
            upper_batch = self._next_batch(self._upper_it)
            upper_rng = jax.random.fold_in(rng, 0xDB)
            self.params, self.upper_opt_state, um = self._db_step(
                self.params, self.upper_opt_state, self.frozen, upper_batch, upper_rng
            )
            metrics = {**metrics, "upper_loss": um["upper_loss"],
                       "instance_loss": um["instance_loss"],
                       "prior_loss": um["prior_loss"]}
        return metrics
