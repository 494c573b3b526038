"""Flux APTP pruning trainer (reference FluxPruner, trainer.py:1596-2113):
flow-matching loss + contrastive + resource over the gated Flux MMDiT, with
hypernet/quantizer as the only trainables.

Text conditioning (T5 prompt embeddings + CLIP pooled) is precomputed
host-side into the batch ('prompt_embeds', 'pooled_prompt_embeds') by the
in-framework towers (models/t5.py, models/clip_text.py; reference
FluxPruner.init_models loads T5EncoderModel + CLIPTextModel,
trainer.py:1604-1740) when the model root provides text_encoder/
text_encoder_2 dirs; packed latents come from the 16-channel Flux VAE when
``vae/`` is present. Synthetic mode generates matching random tensors.
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
from ..models.flux import (
    FluxConfig,
    GatedFluxTransformer2DModel,
    flux_gate_layout,
    make_image_ids,
    pack_latents,
)
from ..models.hypernet import HyperStructure
from ..models.quantizer import QuantizerConfig
from ..parallel import replicate
from ..schedulers import FlowMatchSchedule
from ..utils import flux_macs as fm
from ..utils.logging_utils import logger
from .pruner import PruningTrainer
from .trainer import host_init
from .steps import make_flux_pruner_step


class FluxPruningTrainer(PruningTrainer):
    def init_models(self):
        cfg = self.config
        g = cfg.get_path
        fc = cfg.model.prediction_model.get("flux_config") or {}
        root = str(cfg.get("pretrained_model_name_or_path", ""))
        transformer_dir = os.path.join(root, "transformer") if root else ""
        if transformer_dir and os.path.isdir(transformer_dir):
            # reference loads config + weights via from_pretrained
            # (trainer.py:1604-1630); yaml flux_config keys override on top
            from dataclasses import asdict

            from ..models.convert import flux_config_from_dir

            base = asdict(flux_config_from_dir(transformer_dir))
            base.update(fc)
            fc = base
        self.flux_cfg = FluxConfig(**{
            k: tuple(v) if isinstance(v, list) else v for k, v in fc.items()
        })
        self.layout = flux_gate_layout(self.flux_cfg)
        self.flux = GatedFluxTransformer2DModel(
            self.flux_cfg, dtype=self.dtype,
            remat=bool(g("training.gradient_checkpointing", False)),
            remat_policy=g("training.remat_policy", None),
        )
        self.fm_sched = FlowMatchSchedule(
            shift=float(g("model.prediction_model.flow_shift", 1.0))
        )

        # shapes
        self.l_img = int(g("data.flux_image_tokens", 64))
        self.l_txt = int(g("data.flux_text_tokens", 8))
        b = 1
        key = jax.random.PRNGKey(self.seed)
        hidden = jnp.zeros((b, self.l_img, self.flux_cfg.in_channels))
        ctx = jnp.zeros((b, self.l_txt, self.flux_cfg.joint_attention_dim))
        pooled = jnp.zeros((b, self.flux_cfg.pooled_projection_dim))
        t = jnp.zeros((b,))
        side = int(2 * np.sqrt(self.l_img))
        img_ids = jnp.asarray(make_image_ids(side, side, b))
        txt_ids = jnp.zeros((b, self.l_txt, 3))
        guidance = jnp.zeros((b,)) if self.flux_cfg.guidance_embeds else None
        if transformer_dir and os.path.isdir(transformer_dir):
            try:
                from ..models.convert import convert_flux, load_torch_state_dict_dir

                flux_params = convert_flux(
                    load_torch_state_dict_dir(transformer_dir), self.flux_cfg
                )
                logger.info("loaded Flux transformer weights from %s", transformer_dir)
            except FileNotFoundError:
                # config.json without weights (tiny test fixtures): random init
                flux_params = host_init(
                    self.flux.init, key, hidden, ctx, pooled, t, img_ids,
                    txt_ids, guidance,
                )["params"]
        else:
            flux_params = host_init(
                self.flux.init, key, hidden, ctx, pooled, t, img_ids,
                txt_ids, guidance,
            )["params"]

        self.hypernet = HyperStructure(
            self.layout, input_dim=int(g("model.hypernet.input_dim", 768)),
            dtype=self.dtype,
        )
        hparams = host_init(
            self.hypernet.init,
            jax.random.PRNGKey(self.seed + 2), jnp.zeros((1, self.hypernet.input_dim)),
        )["params"]
        self.qcfg = QuantizerConfig(
            layout=self.layout,
            n_e=int(g("model.quantizer.num_arch_vq_codebook_embeddings", 8)),
        )
        qparams = host_init(self.qcfg.init_params, jax.random.PRNGKey(self.seed + 3))
        qstate = self.qcfg.init_state(qparams)

        table = fm.flux_macs(self.flux_cfg, self.l_img, self.l_txt)
        norm = table["prunable"]
        qstate = self.qcfg.set_prunable_macs_template(
            qstate, [[v / norm for v in sub] for sub in table["per_submodule_prunable"]]
        )
        ones = self.layout.ones(1)
        full_cur = float(fm.flux_calc_macs(
            self.flux_cfg, self.layout, ones, self.l_img, self.l_txt, table
        )["cur_prunable"][0])
        p = self.loss_cfg.resource_target
        p_actual = 1.0 - (1.0 - p) * table["total"] / full_cur
        self.loss_cfg = replace(self.loss_cfg, resource_target=float(p_actual))
        logger.info("flux pruning target rescaled: %.3f -> %.3f", p, p_actual)

        self.student_spec = None
        self.arch_vector = None
        self.trainable = replicate({"hypernet": hparams, "quantizer": qparams}, self.mesh)
        self.qstate = replicate(qstate, self.mesh)
        # parallel.shard_frozen: full-scale Flux-dev's 11.8B frozen tower
        # exceeds one 16GB chip — FSDP-shard it over dp (place_frozen)
        self.frozen = self.place_frozen({"flux": jax.tree.map(jnp.asarray, flux_params)})
        self._init_flux_towers()

    def _init_flux_towers(self):
        """CLIP (pooled) + T5 (sequence) text towers and the 16-channel Flux
        VAE from the model root, when present (reference trainer.py:1604-1740).
        Tests may instead pin tiny configs via model.text_encoder_config /
        text_encoder_2_config / vae_config."""
        cfg = self.config
        root = str(cfg.get("pretrained_model_name_or_path", ""))
        from ..models.clip_text import CLIPTextConfig, CLIPTextModel
        from ..models.t5 import T5Config, T5EncoderModel
        from ..models.vae import AutoencoderKL, VAEConfig

        self.text_encoder = self.text_params = None
        self.t5 = self.t5_params = None
        self.vae = self.vae_params = None

        te_dir = os.path.join(root, "text_encoder")
        te_cfg = cfg.model.get("text_encoder_config")
        if te_cfg or os.path.isdir(te_dir):
            # Flux conditions pooled on CLIP ViT-L's EOS hidden state
            clip_cfg = CLIPTextConfig(**(te_cfg or dict(
                hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
                intermediate_size=3072, hidden_act="quick_gelu",
            )))
            self.text_encoder = CLIPTextModel(clip_cfg, dtype=self.dtype)
            if os.path.isdir(te_dir):
                from ..models.convert import convert_clip_text, load_torch_state_dict_dir

                self.text_params = convert_clip_text(
                    load_torch_state_dict_dir(te_dir), clip_cfg.num_hidden_layers
                )
            else:  # explicit tiny config, no weights: random init (tests)
                self.text_params = host_init(
                    self.text_encoder.init,
                    jax.random.PRNGKey(1), jnp.zeros((1, 4), jnp.int32),
                )["params"]

        t5_dir = os.path.join(root, "text_encoder_2")
        t5_cfg_dict = cfg.model.get("text_encoder_2_config")
        if t5_cfg_dict or os.path.isdir(t5_dir):
            t5_cfg = T5Config(**(t5_cfg_dict or {}))
            self.t5 = T5EncoderModel(t5_cfg, dtype=self.dtype)
            if os.path.isdir(t5_dir):
                from ..models.convert import convert_t5_encoder, load_torch_state_dict_dir

                self.t5_params = convert_t5_encoder(
                    load_torch_state_dict_dir(t5_dir), t5_cfg.num_layers
                )
            else:
                self.t5_params = host_init(
                    self.t5.init,
                    jax.random.PRNGKey(2), jnp.zeros((1, 4), jnp.int32),
                )["params"]

        vae_dir = os.path.join(root, "vae")
        vae_cfg_dict = cfg.model.get("vae_config")
        if vae_cfg_dict or os.path.isdir(vae_dir):
            vae_cfg = VAEConfig(**{
                k: tuple(v) if isinstance(v, list) else v
                for k, v in (vae_cfg_dict or dict(
                    latent_channels=16, scaling_factor=0.3611, shift_factor=0.1159,
                )).items()
            })
            self.vae = AutoencoderKL(vae_cfg, dtype=self.dtype)
            if os.path.isdir(vae_dir):
                from ..models.convert import convert_vae, load_torch_state_dict

                for name in ("diffusion_pytorch_model.safetensors",
                             "diffusion_pytorch_model.bin"):
                    p = os.path.join(vae_dir, name)
                    if os.path.exists(p):
                        self.vae_params = convert_vae(
                            load_torch_state_dict(p), vae_cfg.block_out_channels,
                            vae_cfg.layers_per_block,
                        )
                        break
            else:
                res = 2 ** (len(vae_cfg.block_out_channels) - 1) * 2
                key = jax.random.PRNGKey(3)
                self.vae_params = host_init(
                    self.vae.init, key, jnp.zeros((1, res * 4, res * 4, 3)), key
                )["params"]

        self._load_mpnet()

    def _encode_flux_prompts(self, captions):
        """T5 sequence embeddings + CLIP pooled (diffusers FluxPipeline
        encode_prompt semantics the reference inherits; T5 capped at
        max_sequence_length = l_txt, reference trainer.py:1708-1710)."""
        from transformers import AutoTokenizer, CLIPTokenizer

        root = str(self.config.get("pretrained_model_name_or_path", ""))
        tok1 = CLIPTokenizer.from_pretrained(os.path.join(root, "tokenizer"))
        tok2 = AutoTokenizer.from_pretrained(os.path.join(root, "tokenizer_2"))

        enc1, t5 = self.text_encoder, self.t5

        @jax.jit
        def encode(ids1, ids2, mask2):
            _, pooled = enc1.apply({"params": self.text_params}, ids1)
            seq = t5.apply({"params": self.t5_params}, ids2, mask2)
            return seq, pooled

        out_pe, out_pool = [], []
        bs = 64
        for i in range(0, len(captions), bs):
            chunk = list(captions[i : i + bs])
            ids1 = tok1(chunk, padding="max_length", truncation=True,
                        max_length=tok1.model_max_length, return_tensors="np").input_ids
            t = tok2(chunk, padding="max_length", truncation=True,
                     max_length=self.l_txt, return_tensors="np")
            pe, pool = encode(
                jnp.asarray(ids1), jnp.asarray(t.input_ids), jnp.asarray(t.attention_mask)
            )
            out_pe.append(np.asarray(pe, np.float32))
            out_pool.append(np.asarray(pool, np.float32))
        return np.concatenate(out_pe), np.concatenate(out_pool)

    def _make_flux_collate(self, ds, train: bool = True):
        rng = np.random.default_rng(self.seed if train else self.seed + 1)
        fc, l_img, l_txt = self.flux_cfg, self.l_img, self.l_txt
        side = int(2 * np.sqrt(l_img))

        if isinstance(ds, SyntheticDataset):
            def collate(indices):
                b = len(indices)
                return {
                    "latents": rng.standard_normal((b, l_img, fc.in_channels)).astype(np.float32),
                    "prompt_embeds": rng.standard_normal(
                        (b, l_txt, fc.joint_attention_dim)
                    ).astype(np.float32),
                    "pooled_prompt_embeds": rng.standard_normal(
                        (b, fc.pooled_projection_dim)
                    ).astype(np.float32),
                    "img_ids": np.asarray(make_image_ids(side, side, b)),
                    "txt_ids": np.zeros((b, l_txt, 3), np.float32),
                    "mpnet_embeddings": rng.standard_normal((b, 768)).astype(np.float32),
                }

            return collate

        # real dataset: in-framework towers must be loadable
        if self.t5_params is None or self.text_params is None:
            raise ValueError(
                "Flux pruning on a real dataset needs text_encoder/ (CLIP) and "
                "text_encoder_2/ (T5) under pretrained_model_name_or_path"
            )
        if self.vae_params is None:
            raise ValueError("Flux pruning on a real dataset needs vae/ weights")
        captions = [r.caption for r in ds.records]
        pe, pooled = self._encode_flux_prompts(captions)
        mpnet = self._encode_mpnet_prompts(captions)
        # latent side -> pixel resolution via the VAE's downsample factor
        res = side * 2 ** (len(self.vae.cfg.block_out_channels) - 1)
        moments = self._precompute_latent_moments(ds, res)
        lat_c = self.vae.cfg.latent_channels
        shift, scale = self.vae.cfg.shift_factor, self.vae.cfg.scaling_factor

        def collate(indices):
            b = len(indices)
            mom = np.stack([moments[i] for i in indices]).astype(np.float32)
            mean, logvar = np.split(mom, 2, axis=-1)
            z = mean + np.exp(0.5 * np.clip(logvar, -30, 20)) * rng.standard_normal(
                mean.shape
            ).astype(np.float32)
            z = (z - shift) * scale
            packed = pack_latents(z)
            assert packed.shape[1:] == (l_img, lat_c * 4), packed.shape
            return {
                "latents": packed.astype(np.float32),
                "prompt_embeds": pe[list(indices)],
                "pooled_prompt_embeds": pooled[list(indices)],
                "img_ids": np.asarray(make_image_ids(side, side, b)),
                "txt_ids": np.zeros((b, l_txt, 3), np.float32),
                "mpnet_embeddings": mpnet[list(indices)],
            }

        return collate

    def init_datasets(self):
        cfg = self.config
        ds = get_dataset(cfg, "train")
        self.dataset = ds
        bs = int(cfg.get_path("data.dataloader.train_batch_size", 8))
        self.train_loader = DataLoader(
            list(range(len(ds))), bs, self._make_flux_collate(ds, train=True),
            seed=self.seed,
            num_shards=jax.process_count(), shard_index=jax.process_index(),
        )
        # held-out split for _validate_losses (reference FluxPruner inherits
        # UnetPruner's validation loaders)
        try:
            val_ds = get_dataset(cfg, "validation")
        except Exception:
            val_ds = None
        self.val_dataset = val_ds
        self.val_loader = None
        if val_ds is not None and len(val_ds):
            vbs = int(cfg.get_path("data.dataloader.validation_batch_size", bs))
            self.val_loader = DataLoader(
                list(range(len(val_ds))), vbs,
                self._make_flux_collate(val_ds, train=False), seed=self.seed + 1,
                num_shards=jax.process_count(), shard_index=jax.process_index(),
            )

    def _encode_mpnet_prompts(self, captions):
        if self.mpnet_params is None:
            raise ValueError("Flux pruning on a real dataset needs mpnet_model weights")
        from transformers import AutoTokenizer

        from ..models.mpnet import mean_pool

        tok = AutoTokenizer.from_pretrained(str(self.config.get("mpnet_model")))

        @jax.jit
        def encode(ids, mask):
            h = self.mpnet.apply({"params": self.mpnet_params}, ids, mask)
            return mean_pool(h, mask)

        out = []
        for i in range(0, len(captions), 64):
            t = tok(captions[i : i + 64], padding="max_length", truncation=True,
                    max_length=tok.model_max_length, return_tensors="np")
            out.append(np.asarray(
                encode(jnp.asarray(t.input_ids), jnp.asarray(t.attention_mask)),
                np.float32,
            ))
        return np.concatenate(out)

    def make_steps(self):
        g = self.config.get_path
        self.step_fn = make_flux_pruner_step(
            self.flux, self.hypernet, self.qcfg, self.layout, self.flux_cfg,
            self.fm_sched, self.loss_cfg, self.tx, self.l_img, self.l_txt,
            weighting_scheme=g("model.prediction_model.weighting_scheme", "logit_normal"),
            guidance_scale=g("model.prediction_model.guidance_scale"),
            grad_accum=self.grad_accum,
        )

    def _make_eval_step(self):
        from .steps import make_flux_pruner_eval_step

        g = self.config.get_path
        return make_flux_pruner_eval_step(
            self.flux, self.hypernet, self.qcfg, self.layout, self.flux_cfg,
            self.fm_sched, self.loss_cfg, self.l_img, self.l_txt,
            weighting_scheme=g("model.prediction_model.weighting_scheme",
                               "logit_normal"),
            guidance_scale=g("model.prediction_model.guidance_scale"),
        )

    def validate(self):
        """Validation losses over the val split (reference FluxPruner inherits
        UnetPruner.validate, trainer.py:1093-1147), then codebook similarity
        heatmap + per-expert hard resource ratios (resource ratios from the
        analytic flux_macs tables)."""
        self._validate_losses()
        if not self.tracker.primary_host:
            return
        emb_gs = np.asarray(jax.device_get(self.qstate["embedding_gs"]))
        hard = (emb_gs >= 0.5).astype(np.float32)
        self._log_codebook_similarity(hard)
        ratios = self._expert_resource_ratios(hard)
        self.tracker.log(
            {f"expert_{e}_resource_ratio": r for e, r in enumerate(ratios)},
            step=self.global_step,
        )
        logger.info("flux expert resource ratios: %s", [f"{r:.3f}" for r in ratios])
        self.log_expert_samples()

    def log_expert_samples(self):
        """Per-expert Flux sample images for `data.prompts` (the Flux
        counterpart of quantizer_samples; reference FluxPruningPipeline
        routing, pruning_pipelines.py:1613-1914). Needs the in-framework
        T5/CLIP towers + VAE — silently skipped on synthetic runs."""
        prompts = self.config.get_path("data.prompts")
        if (not prompts or self.t5_params is None or self.text_params is None
                or self.vae_params is None):
            return
        import numpy as np

        from ..pipelines import FluxPipeline
        from ..utils.estimation import hard_concrete
        from ..utils.image_io import save_image

        # cached like PruningTrainer.get_pipeline: the jitted Euler denoise
        # loop keys its compile cache on pipeline identity, so rebuilding per
        # validation would recompile the whole sampling loop every time
        if not hasattr(self, "_flux_pipeline"):
            self._flux_pipeline = FluxPipeline(
                self.flux, self.frozen["flux"], self.fm_sched,
                vae=self.vae, vae_params=self.vae_params,
                hypernet=self.hypernet, hypernet_params=self.trainable["hypernet"],
                quantizer_cfg=self.qcfg, quantizer_params=self.trainable["quantizer"],
                quantizer_state=self.qstate, layout=self.layout,
            )
        pipe = self._flux_pipeline
        pipe.flux_params = self.frozen["flux"]
        pipe.hypernet_params = self.trainable["hypernet"]
        pipe.qparams = self.trainable["quantizer"]
        pipe.qstate = self.qstate
        g = self.config.get_path
        steps = int(g("training.num_inference_steps", 4))
        # pixel size consistent with the training token grid; only exact for
        # square even grids (side latent pixels = 2 * sqrt(tokens))
        import math

        side = 2 * math.isqrt(self.l_img)
        if side * side != 4 * self.l_img:
            logger.warning(
                "flux sample logging skipped: flux_image_tokens=%d is not a "
                "square grid (pass square token counts to sample)", self.l_img,
            )
            return
        res = side * 2 ** (len(self.vae.cfg.block_out_channels) - 1)
        pe, pooled = self._encode_flux_prompts(list(prompts))
        out_dir = os.path.join(self.logging_dir, f"pruning-samples-{self.global_step}")
        os.makedirs(out_dir, exist_ok=True)
        emb_gs = self.qstate["embedding_gs"]
        max_e = int(g("training.logging.max_sample_experts", 4) or 4)
        for e in range(min(int(np.asarray(emb_gs).shape[0]), max_e)):
            z = hard_concrete(jnp.asarray(emb_gs)[e : e + 1])
            z = jnp.repeat(z, len(prompts), axis=0)
            imgs, _ = pipe(
                jnp.asarray(pe), jnp.asarray(pooled), height=res, width=res,
                num_inference_steps=steps,
                guidance_scale=float(g("model.prediction_model.guidance_scale", 3.5) or 3.5),
                structure=self.layout.split(z),
            )
            for i, img in enumerate(np.asarray(imgs)):
                save_image(img, os.path.join(out_dir, f"expert{e}_{i}.png"))
        logger.info("logged Flux pruning sample images to %s", out_dir)

    def _expert_resource_ratios(self, hard: np.ndarray):
        table = fm.flux_macs(self.flux_cfg, self.l_img, self.l_txt)
        full = float(fm.flux_calc_macs(
            self.flux_cfg, self.layout, self.layout.ones(1), self.l_img, self.l_txt,
            table,
        )["cur_prunable"][0])
        ratios = []
        for e in range(hard.shape[0]):
            s = self.layout.split(jnp.asarray(hard[e : e + 1]))
            cur = float(fm.flux_calc_macs(
                self.flux_cfg, self.layout, s, self.l_img, self.l_txt, table
            )["cur_prunable"][0])
            ratios.append(cur / full)
        return ratios

    def run_step(self, batch, rng) -> Dict:
        self.trainable, self.opt_state, self.qstate, metrics = self.step_fn(
            self.trainable, self.opt_state, self.qstate, self.frozen, batch, rng
        )
        return {k: v for k, v in metrics.items() if k != "expert_indices"}
