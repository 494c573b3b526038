"""APTP pruning trainer (reference UnetPruner, trainer.py:759-1470): trains
the prompt hypernet + arch-codebook quantizer with contrastive / resource /
distillation / block losses; the U-Net stays frozen and is steered by gates.
"""
from __future__ import annotations

import os
from dataclasses import replace
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..data import DataLoader, get_dataset
from ..data.datasets import SyntheticDataset
from ..models import UNet2DConditionModel, build_unet_spec, gate_layout_for_config
from ..models.hypernet import HyperStructure
from ..models.quantizer import QuantizerConfig
from ..parallel import replicate
from ..utils import macs as macs_lib
from ..utils.logging_utils import logger
from .finetune import FineTuneTrainer
from .steps import make_pruner_step
from .trainer import host_init, load_diffusers_unet, unet_config_from


class PruningTrainer(FineTuneTrainer):
    def init_models(self):
        cfg = self.config
        self.unet_cfg = unet_config_from(cfg)
        self.full_spec = build_unet_spec(self.unet_cfg)
        self.layout = gate_layout_for_config(self.unet_cfg)
        self.unet = UNet2DConditionModel(
            self.full_spec, dtype=self.dtype,
            # same config keys as the fine-tune trainers; the 512px pruning
            # step backs two full-U-Net graphs, so checkpointing is usually
            # required on a 16GB chip
            remat=bool(cfg.get_path("training.gradient_checkpointing", False)),
            remat_policy=cfg.get_path("training.remat_policy", None),
        )
        self.student = self.teacher = self.unet
        self.student_spec = self.full_spec
        self.arch_vector = None

        root = str(cfg.get("pretrained_model_name_or_path", ""))
        unet_dir = os.path.join(root, "unet")
        key = jax.random.PRNGKey(self.seed)
        sample = jnp.zeros((1, self.unet_cfg.sample_size, self.unet_cfg.sample_size,
                            self.unet_cfg.in_channels))
        ctx = jnp.zeros((1, 7, self.unet_cfg.cross_attention_dim))
        init_kwargs = {}
        if self.full_spec.addition_embed_type == "text_time":
            pooled_dim = (
                self.full_spec.projection_class_embeddings_input_dim
                - 6 * self.full_spec.addition_time_embed_dim
            )
            init_kwargs["added_cond"] = {
                "text_embeds": jnp.zeros((1, pooled_dim)),
                "time_ids": jnp.zeros((1, 6)),
            }
        if os.path.isdir(unet_dir):
            unet_params = load_diffusers_unet(unet_dir, self.full_spec)
        else:
            unet_params = host_init(
                self.unet.init, key, sample, jnp.array([0]), ctx, **init_kwargs
            )["params"]

        g = cfg.get_path
        self.hypernet = HyperStructure(
            self.layout,
            input_dim=int(g("model.hypernet.input_dim", 768)),
            wn_flag=bool(g("model.hypernet.weight_norm", True)),
            linear_bias=bool(g("model.hypernet.linear_bias", False)),
            single_arch_param=bool(g("model.hypernet.single_arch_param", False)),
            dtype=self.dtype,
        )
        hkey = jax.random.PRNGKey(self.seed + 2)
        if self.hypernet.single_arch_param:
            hparams = host_init(self.hypernet.init, hkey)["params"]
        else:
            hparams = host_init(
                self.hypernet.init, hkey, jnp.zeros((1, self.hypernet.input_dim))
            )["params"]

        self.qcfg = QuantizerConfig(
            layout=self.layout,
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
        qparams = host_init(self.qcfg.init_params, jax.random.PRNGKey(self.seed + 3))
        qstate = self.qcfg.init_state(qparams)

        # prunable-MACs template + pruning-target rescale (count_macs /
        # update_pruning_target, trainer.py:1323-1373)
        table = macs_lib.unet_macs(self.full_spec)
        norm = table["prunable"]
        prunable_list = [
            [v / norm for v in sub] for sub in table["per_submodule_prunable"]
        ]
        qstate = self.qcfg.set_prunable_macs_template(qstate, prunable_list)
        ones = self.layout.ones(1)
        full_cur = float(
            macs_lib.calc_macs(self.full_spec, ones, static_table=table)["cur_prunable"][0]
        )
        p = self.loss_cfg.resource_target
        p_actual = 1.0 - (1.0 - p) * table["total"] / full_cur
        self.loss_cfg = replace(self.loss_cfg, resource_target=float(p_actual))
        logger.info("pruning target rescaled: %.3f -> %.3f", p, p_actual)

        self.build_frozen_towers()

        self.trainable = replicate({"hypernet": hparams, "quantizer": qparams}, self.mesh)
        self.qstate = replicate(qstate, self.mesh)
        self.frozen = self.place_frozen(
            {"unet": jax.tree.map(jnp.asarray, unet_params), "vae": self.vae_params}
        )

    def init_optimizers(self):
        g = self.config.get_path
        from .optim import make_optimizer

        self.tx = make_optimizer(
            learning_rate=float(g("training.optim.hypernet_learning_rate", 1e-3)),
            weight_decay=float(g("training.optim.hypernet_weight_decay", 0.0) or 0.0),
            beta1=float(g("training.optim.adam_beta1", 0.9)),
            beta2=float(g("training.optim.adam_beta2", 0.999)),
            eps=float(g("training.optim.adam_epsilon", 1e-8)),
            lr_scheduler=g("training.optim.lr_scheduler", "constant_with_warmup"),
            warmup_steps=int(g("training.optim.lr_warmup_steps", 0) or 0),
            total_steps=g("training.max_train_steps"),
        )
        self.opt_state = replicate(
            self.tx.init(jax.tree.map(np.asarray, jax.device_get(self.trainable))),
            self.mesh,
        )

    def make_steps(self):
        # packed dispatch: only the frozen towers are worth packing here —
        # the trainable hypernet/quantizer trees are a few dozen leaves, the
        # frozen gated U-Net ~900 (see steps.make_pruner_step frozen_spec)
        self._frozen_spec = None
        self._frozen_packed = self.frozen
        if self.config.get_path("training.packed_dispatch", False):
            if self.config.get_path("parallel.shard_frozen", False):
                raise ValueError(
                    "training.packed_dispatch is incompatible with "
                    "parallel.shard_frozen: packing flattens the frozen "
                    "towers into replicated buffers, defeating the sharding"
                )
            from ..utils.packing import make_pack_spec, pack

            thr = int(self.config.get_path(
                "training.pack_threshold", 2 * 1024 * 1024) or 0)
            self._frozen_spec = make_pack_spec(self.frozen, max_leaf_bytes=thr)
            spec = self._frozen_spec
            self._frozen_packed = jax.jit(lambda t: pack(t, spec))(self.frozen)
            # don't hold a second full copy of the frozen towers in HBM —
            # validation unpacks transiently via _frozen_tree()
            self.frozen = None
        self.step_fn = make_pruner_step(
            self.unet, self.hypernet, self.qcfg, self.vae, self.layout, self.full_spec,
            self.sched, self.loss_cfg, self.tx,
            seq_kv=int(self.config.get_path("data.synthetic_seq_len", 77)),
            pretrain=bool(self.config.get_path("training.hypernet_pretraining", False)),
            grad_accum=self.grad_accum,
            frozen_spec=self._frozen_spec,
        )

    def _frozen_tree(self):
        """Device tree view of the frozen towers (packed-aware, transient).
        SDXL/Flux subclasses keep their own make_steps (tree frozen) — fall
        back to self.frozen there."""
        if getattr(self, "_frozen_spec", None) is None:
            return getattr(self, "_frozen_packed", None) or self.frozen
        from ..utils.packing import unpack

        spec = self._frozen_spec
        if not hasattr(self, "_frozen_unpack_fn"):
            self._frozen_unpack_fn = jax.jit(lambda f: unpack(f, spec))
        return self._frozen_unpack_fn(self._frozen_packed)

    def run_step(self, batch, rng) -> Dict:
        self.trainable, self.opt_state, self.qstate, metrics = self.step_fn(
            self.trainable, self.opt_state, self.qstate, self._frozen_packed, batch, rng
        )
        return {
            k: v for k, v in metrics.items()
            if k not in ("batch_resource_ratios", "expert_indices")
        }

    def validate(self):
        """Validation losses over the val split (reference UnetPruner.validate,
        trainer.py:1093-1147: val diff/distill/block/contrastive/resource on
        the quantizer's eval hard path), then quantizer codebook pairwise
        similarity + per-expert resource ratios as heatmaps (reference
        trainer.py:1037-1068, 1411-1417), plus expert sample grids and routed
        samples when `data.prompts` is set (generate_samples_from_prompts /
        log_quantizer_embedding_samples, trainer.py:1375-1470)."""
        self._validate_losses()
        if not self.tracker.primary_host:
            return  # heatmaps/samples are host-local file writes
        emb_gs = np.asarray(jax.device_get(self.qstate["embedding_gs"]))
        hard = (emb_gs >= 0.5).astype(np.float32)
        self._log_codebook_similarity(hard)
        ratios = self._expert_resource_ratios(hard)
        self.tracker.log(
            {f"expert_{e}_resource_ratio": r for e, r in enumerate(ratios)},
            step=self.global_step,
        )
        logger.info("expert resource ratios: %s", [f"{r:.3f}" for r in ratios])
        self.log_expert_samples()

    def _validate_losses(self):
        """Mean val losses over (up to max_validation_batches of) the val
        split, logged as val_* (reference trainer.py:1136-1147 reduces the
        same way with accelerator.reduce(..., 'mean'))."""
        if getattr(self, "val_loader", None) is None:
            return
        if not hasattr(self, "_eval_step"):
            self._eval_step = self._make_eval_step()
        if self._eval_step is None:
            return
        from ..parallel import shard_batch

        max_batches = int(
            self.config.get_path("training.max_validation_batches", 0) or 8
        )
        frozen = getattr(self, "_frozen_packed", None)
        if frozen is None:
            frozen = self.frozen
        sums: Dict = {}
        n = 0
        for i, batch in enumerate(self.val_loader):
            if i >= max_batches:
                break
            batch = shard_batch(batch, self.mesh)
            m = self._eval_step(
                self.trainable, self.qstate, frozen, batch,
                jax.random.PRNGKey(2000 + i),
            )
            # families share the core losses; flux has no teacher distill
            for k in ("loss", "diff_loss", "distill_loss", "block_loss",
                      "contrastive_loss", "resource_loss", "resource_ratio"):
                if k in m:
                    sums[k] = sums.get(k, 0.0) + float(m[k])
            n += 1
        if n:
            logs = {f"val_{k}": v / n for k, v in sums.items()}
            self.tracker.log(logs, step=self.global_step)
            logger.info(
                "validation | %s",
                " ".join(f"{k}={v:.4f}" for k, v in sorted(logs.items())),
            )

    def _make_eval_step(self):
        """Family-specific eval-loss step; SDXL/Flux subclasses override
        (their step functions carry different conditioning)."""
        from .steps import make_pruner_eval_step

        return make_pruner_eval_step(
            self.unet, self.hypernet, self.qcfg, self.vae, self.layout,
            self.full_spec, self.sched, self.loss_cfg,
            seq_kv=int(self.config.get_path("data.synthetic_seq_len", 77)),
            pretrain=bool(self.config.get_path(
                "training.hypernet_pretraining", False)),
            frozen_spec=getattr(self, "_frozen_spec", None),
        )

    def log_samples(self):
        # image_logging_steps cadence (reference trainer.py:1375-1470)
        self.log_expert_samples()

    def _log_codebook_similarity(self, hard: np.ndarray):
        from ..utils.logging_utils import create_heatmap

        norm = hard / np.clip(np.linalg.norm(hard, axis=-1, keepdims=True), 1e-9, None)
        sim = norm @ norm.T
        create_heatmap(
            sim, os.path.join(self.logging_dir, f"codebook_sim_{self.global_step}"),
            "codebook pairwise similarity",
        )

    def _expert_resource_ratios(self, hard: np.ndarray):
        """Hard-thresholded per-expert MACs ratios (U-Net variant; the Flux
        trainer overrides with flux_macs)."""
        table = macs_lib.unet_macs(self.full_spec)
        ones = self.layout.ones(1)
        full = float(macs_lib.calc_macs(self.full_spec, ones, static_table=table)[
            "cur_prunable"][0])
        ratios = []
        for e in range(hard.shape[0]):
            s = self.layout.split(jnp.asarray(hard[e : e + 1]))
            cur = float(macs_lib.calc_macs(self.full_spec, s, static_table=table)[
                "cur_prunable"][0])
            ratios.append(cur / full)
        return ratios

    def _build_pipeline(self):
        """Construct the family-specific PruningPipeline, or None when the
        required towers aren't loaded (synthetic smoke runs). Subclasses
        override this; get_pipeline handles caching + param refresh."""
        if self.text_params is None:
            return None
        if self.full_spec.addition_embed_type == "text_time":
            # SDXL added_cond sampling lives in SDXLPruningTrainer; the base
            # single-tower pipeline can't feed the micro-conditioning
            logger.warning("sample logging skipped: use SDXLPruningTrainer for "
                           "SDXL specs")
            return None
        from transformers import CLIPTokenizer

        from ..pipelines import PruningPipeline

        root = str(self.config.get("pretrained_model_name_or_path", ""))
        try:
            tokenizer = CLIPTokenizer.from_pretrained(os.path.join(root, "tokenizer"))
        except Exception:
            return None
        return PruningPipeline(
            self.unet, None, self.vae, self.vae_params, self.sched,
            scheduler_type="ddim", text_encoder=self.text_encoder,
            text_params=self.text_params, tokenizer=tokenizer,
            hypernet=self.hypernet, quantizer_cfg=self.qcfg,
            layout=self.layout, mpnet=self.mpnet,
            mpnet_params=self.mpnet_params,
        )

    def get_pipeline(self):
        """PruningPipeline over the live (frozen U-Net, training hypernet/
        quantizer) state — the reference's Trainer.get_pipeline
        (trainer.py:653). Cached: the jitted denoise loop compiles once and
        later validations reuse it (only the routing params refresh)."""
        if not hasattr(self, "_pipeline"):
            self._pipeline = self._build_pipeline()
        pipe = self._pipeline
        if pipe is None:
            return None
        # refresh the pieces that train
        pipe.unet_params = self._frozen_tree()["unet"]
        trainable = self.trainable
        pipe.hypernet_params = trainable["hypernet"]
        pipe.qparams = trainable["quantizer"]
        pipe.qstate = self.qstate
        return pipe

    def log_expert_samples(self):
        """Save (a) per-expert sample grids from the codebook architectures
        and (b) hypernet-routed samples for `data.prompts` under the run dir
        (reference trainer.py:1375-1470)."""
        if not self.tracker.primary_host:
            return  # the pipeline is host-local (no mesh): skip entirely
        prompts = self.sample_prompts()
        if not prompts:
            return
        pipe = self.get_pipeline()
        if pipe is None:
            return
        from ..utils.image_io import save_image

        g = self.config.get_path
        res = int(g("model.prediction_model.resolution", 512))
        steps = int(g("training.num_inference_steps", 10))
        out_dir = os.path.join(self.logging_dir, f"pruning-samples-{self.global_step}")
        os.makedirs(out_dir, exist_ok=True)

        pe = pipe.encode_prompts(list(prompts))
        empty = pipe.encode_prompts([""] * len(prompts))
        n_e = np.asarray(self.qstate["embedding_gs"]).shape[0]
        max_e = int(g("training.logging.max_sample_experts", 4) or 4)
        samples = pipe.quantizer_samples(
            pe, empty, expert_ids=range(min(n_e, max_e)),
            num_inference_steps=steps, height=res, width=res,
        )
        for e, imgs in samples.items():
            for i, img in enumerate(np.asarray(imgs)):
                save_image(img, os.path.join(out_dir, f"expert{e}_{i}.png"))
        # routed samples need MPNet embeddings for the hypernet input
        if self.mpnet_params is not None:
            encode = self._mpnet_encoder()
            emb = jnp.asarray(encode(list(prompts)))
            images, idx, ratios = pipe(
                emb, pe, empty, num_inference_steps=steps, height=res, width=res,
            )
            for i, img in enumerate(np.asarray(images)):
                save_image(img, os.path.join(out_dir, f"routed{i}_expert{int(idx[i])}.png"))
            self.tracker.log(
                {"routed_resource_ratio": float(np.mean(ratios))}, step=self.global_step
            )
        logger.info("logged pruning sample images to %s", out_dir)

    def save_checkpoint(self):
        tree = {
            "trainable": jax.device_get(self.trainable),
            "opt_state": jax.device_get(self.opt_state),
            "qstate_embedding_gs": jax.device_get(self.qstate["embedding_gs"]),
            "step": self.global_step,
        }
        # the artifact every downstream stage consumes (trainer.py:2159-2161)
        # rides through extra_files so it lands atomically with the orbax
        # tree and inherits the primary-host write gating
        import io

        buf = io.BytesIO()
        np.save(buf, np.asarray(jax.device_get(self.qstate["embedding_gs"])))
        self.ckpt.save(
            self.global_step, tree,
            extra_files={"quantizer_embeddings.npy": buf.getvalue()},
        )
        logger.info("saved pruning checkpoint-%d", self.global_step)

    def maybe_resume(self):
        mode = self.config.get_path("training.logging.resume_from_checkpoint")
        if not mode:
            return
        step = self.ckpt.latest_step()
        if step is None:
            return
        tree = {
            "trainable": jax.device_get(self.trainable),
            "opt_state": jax.device_get(self.opt_state),
            "qstate_embedding_gs": jax.device_get(self.qstate["embedding_gs"]),
            "step": 0,
        }
        restored = self.ckpt.restore(step, tree)
        self.trainable = replicate(restored["trainable"], self.mesh)
        self.opt_state = replicate(restored["opt_state"], self.mesh)
        self.qstate = replicate(
            dict(jax.device_get(self.qstate), embedding_gs=restored["qstate_embedding_gs"]),
            self.mesh,
        )
        self.global_step = int(restored["step"])
        logger.info("resumed from checkpoint-%d", step)
