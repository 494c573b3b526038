"""End-to-end trainer smoke tests on synthetic data + tiny models."""
import os
import tempfile

import numpy as np
import pytest

from unlearn_ft_tpu.utils.config import load_config

CFG_PATH = os.path.join(os.path.dirname(__file__), "..", "configs", "tests", "tiny_synthetic.yaml")


def _config(tmp, small=False, **overrides):
    cfg = load_config(CFG_PATH)
    cfg.training.logging.logging_dir = tmp
    cfg.merge({"seed": 43, "wandb_run_name": "t", "pruning_type": "multi-expert"})
    if small:
        # halve the U-Net for mechanism-equivalence tests (each pays every
        # compile TWICE — tree vs packed, fused vs sequential); multi-layer
        # gate-plumbing coverage keeps layers_per_block=2 elsewhere.
        # Equal block_out_channels keep every depth-gated resnet
        # channel-preserving, which the unet_spec validator requires at
        # layers_per_block=1 (the depth lerp needs an identity path).
        cfg.model.prediction_model.unet_config.layers_per_block = 1
        cfg.model.prediction_model.unet_config.block_out_channels = [16, 16]
        cfg.model.prediction_model.unet_config.num_attention_heads = [2, 2]
    cfg.merge(overrides)
    return cfg


def _read_metrics(logdir):
    import json

    path = os.path.join(logdir, "t", "metrics.jsonl")
    with open(path) as f:
        return [json.loads(line) for line in f]


def test_finetune_trainer_runs():
    from unlearn_ft_tpu.training.finetune import FineTuneTrainer

    with tempfile.TemporaryDirectory() as tmp:
        t = FineTuneTrainer(_config(tmp))
        # random_pruning_ratio=0.6 => materialized student smaller than teacher
        assert t.arch_vector is not None
        t.train()
        rows = _read_metrics(tmp)
        assert len(rows) == 3
        assert all(np.isfinite(r["loss"]) for r in rows)


def test_bilevel_trainer_upper_steps_fire():
    from unlearn_ft_tpu.training.bilevel import BilevelFineTuneTrainer

    with tempfile.TemporaryDirectory() as tmp:
        cfg = _config(tmp)
        cfg.training.max_train_steps = 4
        t = BilevelFineTuneTrainer(cfg)
        t.train()
        rows = _read_metrics(tmp)
        # upper_step_freq=2 => steps 2 and 4 carry upper metrics
        upper_rows = [r for r in rows if "upper_loss" in r]
        assert len(upper_rows) == 2
        assert all(np.isfinite(r["upper_loss"]) for r in upper_rows)


def test_dreambooth_bilevel_prior_preservation():
    """DreamBooth upper steps carry both the instance and the weighted prior
    term (reference trainer.py:3382-3389); prior_loss must be nonzero and the
    batch must be [instance | prior] halves."""
    from unlearn_ft_tpu.training.bilevel import DreamBoothBilevelFineTuneTrainer

    with tempfile.TemporaryDirectory() as tmp:
        cfg = _config(tmp)
        cfg.training.max_train_steps = 4
        cfg.merge({"training": {"dreambooth": {
            "with_prior_preservation": True, "prior_loss_weight": 0.7,
        }}})
        t = DreamBoothBilevelFineTuneTrainer(cfg)
        t.train()
        rows = _read_metrics(tmp)
        upper_rows = [r for r in rows if "prior_loss" in r]
        assert len(upper_rows) == 2
        for r in upper_rows:
            assert np.isfinite(r["prior_loss"]) and r["prior_loss"] > 0
            assert np.isfinite(r["instance_loss"])
            np.testing.assert_allclose(
                r["upper_loss"], r["instance_loss"] + 0.7 * r["prior_loss"], rtol=1e-5
            )


def test_checkpoint_save_and_resume():
    from unlearn_ft_tpu.training.finetune import FineTuneTrainer

    with tempfile.TemporaryDirectory() as tmp:
        cfg = _config(tmp)
        cfg.training.max_train_steps = 2
        cfg.training.checkpoint_steps = 2
        t = FineTuneTrainer(cfg)
        t.train()
        assert t.ckpt.latest_step() == 2
        assert t.ckpt.load_arch_vector(2) is not None
        assert t.ckpt.load_spec_json(2) is not None

        # resume continues from step 2
        cfg2 = _config(tmp)
        cfg2.training.max_train_steps = 3
        cfg2.training.logging.resume_from_checkpoint = "latest"
        t2 = FineTuneTrainer(cfg2)
        t2.ckpt = t.ckpt
        t2.maybe_resume()
        assert t2.global_step == 2


def test_pruning_trainer_runs():
    from unlearn_ft_tpu.training.pruner import PruningTrainer

    with tempfile.TemporaryDirectory() as tmp:
        cfg = _config(tmp)
        cfg.training.max_train_steps = 2
        cfg.training.checkpoint_steps = 2
        cfg.training.validation_steps = 2
        cfg.training.max_validation_batches = 1
        t = PruningTrainer(cfg)
        t.train()
        rows = _read_metrics(tmp)
        train_rows = [r for r in rows if "loss" in r]
        assert train_rows and all(np.isfinite(r["loss"]) for r in train_rows)
        assert "resource_ratio" in train_rows[-1]
        # pruning-stage validation losses (reference trainer.py:1093-1147)
        val_rows = [r for r in rows if "val_diff_loss" in r]
        assert val_rows, "validation losses were not logged"
        for k in ("val_loss", "val_diff_loss", "val_distill_loss",
                  "val_block_loss", "val_contrastive_loss",
                  "val_resource_loss", "val_resource_ratio"):
            assert np.isfinite(val_rows[-1][k])
        # pruning checkpoint exposes the quantizer embeddings artifact
        step = t.ckpt.latest_step()
        emb_path = os.path.join(t.ckpt.path(step), "quantizer_embeddings.npy")
        assert os.path.exists(emb_path)
        emb = np.load(emb_path)
        assert emb.shape == (4, t.layout.total_dim)


def test_finetune_from_pruning_checkpoint():
    """The fine-tuner consumes a pruning checkpoint's quantizer embeddings
    (multi-expert contract, trainer.py:2159-2163)."""
    from unlearn_ft_tpu.training.finetune import FineTuneTrainer
    from unlearn_ft_tpu.models import gate_layout_for_config
    from unlearn_ft_tpu.training.trainer import unet_config_from

    with tempfile.TemporaryDirectory() as tmp:
        cfg = _config(tmp)
        layout = gate_layout_for_config(unet_config_from(cfg))
        # fake pruning checkpoint with 4 experts
        rng = np.random.default_rng(0)
        emb = rng.uniform(0.0, 1.0, size=(4, layout.total_dim)).astype(np.float32)
        emb[:, :] = np.where(emb > 0.45, 0.9, 0.1)
        pruning_dir = os.path.join(tmp, "pruning_ckpt")
        os.makedirs(pruning_dir)
        np.save(os.path.join(pruning_dir, "quantizer_embeddings.npy"), emb)

        cfg.model.prediction_model.random_pruning_ratio = None
        cfg.merge({"pruning_ckpt_dir": pruning_dir, "expert_id": 2})
        cfg.training.max_train_steps = 1
        t = FineTuneTrainer(cfg)
        np.testing.assert_allclose(t.arch_vector[0], emb[2])
        t.train()


def test_finetune_from_reference_torch_checkpoint():
    """Interop: the reference's pruning artifact is a torch .pt of
    embedding_gs (trainer.py:2159-2161); loading it must work unchanged."""
    import pytest

    torch = pytest.importorskip("torch")
    from unlearn_ft_tpu.training.finetune import load_arch_vector_from_pruning_ckpt

    with tempfile.TemporaryDirectory() as tmp:
        emb = np.random.default_rng(0).uniform(0, 1, (8, 50)).astype(np.float32)
        torch.save(torch.tensor(emb), os.path.join(tmp, "quantizer_embeddings.pt"))
        v = load_arch_vector_from_pruning_ckpt(tmp, 5)
        np.testing.assert_allclose(v[0], emb[5])

        # reference layout variant: quantizer/ subfolder
        sub = os.path.join(tmp, "sub", "quantizer")
        os.makedirs(sub)
        torch.save(torch.tensor(emb), os.path.join(sub, "quantizer_embeddings.pt"))
        v2 = load_arch_vector_from_pruning_ckpt(os.path.join(tmp, "sub"), 3)
        np.testing.assert_allclose(v2[0], emb[3])


def test_bilevel_trainer_fused_cadence():
    """training.fused_cadence=true: each upper_step_freq window is one
    dispatch; observable state at checkpoint boundaries is exact (partial
    buffers are flushed with plain lower steps)."""
    from unlearn_ft_tpu.training.bilevel import BilevelFineTuneTrainer

    with tempfile.TemporaryDirectory() as tmp:
        cfg = _config(tmp, small=True)
        cfg.training.max_train_steps = 5  # 2 full windows + 1 buffered step
        cfg.training.checkpoint_steps = 5
        cfg.merge({"training": {"fused_cadence": True}})
        t = BilevelFineTuneTrainer(cfg)
        t.train()
        assert t._buffer == []  # final save_checkpoint flushed the tail
        assert t.ckpt.latest_step() == 5
        rows = _read_metrics(tmp)
        upper_rows = [r for r in rows if "upper_loss" in r]
        assert upper_rows and all(np.isfinite(r["upper_loss"]) for r in upper_rows)
        assert any("loss" in r and np.isfinite(r["loss"]) for r in rows)


def test_bilevel_fused_cadence_survives_unaligned_checkpoints():
    """A checkpoint boundary that is NOT a multiple of upper_step_freq forces
    a partial flush; the upper step must still fire every freq lower steps
    (neither starved nor drifted)."""
    from unlearn_ft_tpu.training.bilevel import BilevelFineTuneTrainer

    with tempfile.TemporaryDirectory() as tmp:
        cfg = _config(tmp, small=True)
        cfg.training.max_train_steps = 6
        cfg.training.checkpoint_steps = 3  # misaligned with freq=2
        cfg.merge({"training": {"fused_cadence": True, "upper_step_freq": 2}})
        t = BilevelFineTuneTrainer(cfg)
        calls = {"cadence": 0, "upper": 0}
        orig_c, orig_u = t.cadence_fn, t.upper_step_fn

        def counting_cadence(*a, **k):
            calls["cadence"] += 1
            return orig_c(*a, **k)

        def counting_upper(*a, **k):
            calls["upper"] += 1
            return orig_u(*a, **k)

        t.cadence_fn = counting_cadence
        t.upper_step_fn = counting_upper
        t.train()
        # 6 lowers at freq 2 -> 3 uppers total: cadence flushes carry one
        # upper each, the misaligned window fires one standalone upper
        assert calls["cadence"] + calls["upper"] == 3, calls
        assert calls["upper"] >= 1, calls  # the partial-flush path fired
        assert t._buffer == [] and t._lower_since_upper == 0


def test_finetune_trainer_gradient_accumulation():
    """training.gradient_accumulation_steps=2 (reference: accelerate
    accumulate, trainer.py:124): one optimizer update per 2 loader batches;
    global_step still counts updates."""
    from unlearn_ft_tpu.training.finetune import FineTuneTrainer

    with tempfile.TemporaryDirectory() as tmp:
        cfg = _config(tmp, small=True)
        cfg.merge({"training": {"gradient_accumulation_steps": 2}})
        t = FineTuneTrainer(cfg)
        assert t.grad_accum == 2
        consumed = {"n": 0}
        orig = t.train_loader.collate

        def counting(indices):
            consumed["n"] += 1
            return orig(indices)

        t.train_loader.collate = counting
        t.train()
        rows = _read_metrics(tmp)
        assert len(rows) == 3 and all(np.isfinite(r["loss"]) for r in rows)
        # prefetch may have pulled a few extra batches; at least 2/update
        assert consumed["n"] >= 2 * 3


def test_bilevel_fused_cadence_with_gradient_accumulation():
    """Fused cadence composes with accumulation: [freq, accum, batch, ...]
    windows, upper steps still firing on schedule."""
    from unlearn_ft_tpu.training.bilevel import BilevelFineTuneTrainer

    with tempfile.TemporaryDirectory() as tmp:
        cfg = _config(tmp, small=True)
        cfg.training.max_train_steps = 4
        cfg.merge({"training": {
            "fused_cadence": True, "upper_step_freq": 2,
            "gradient_accumulation_steps": 2,
        }})
        t = BilevelFineTuneTrainer(cfg)
        t.train()
        rows = _read_metrics(tmp)
        upper_rows = [r for r in rows if "upper_loss" in r]
        assert upper_rows and all(np.isfinite(r["upper_loss"]) for r in upper_rows)
        assert all(np.isfinite(r["loss"]) for r in rows if "loss" in r)


def test_image_logging_steps_cadence():
    """training.image_logging_steps fires sample logging on its own cadence
    (reference image_logging_steps, trainer.py:2543), independent of
    validation_steps."""
    from unlearn_ft_tpu.training.finetune import FineTuneTrainer

    with tempfile.TemporaryDirectory() as tmp:
        cfg = _config(tmp)
        cfg.training.max_train_steps = 4
        cfg.merge({"training": {"image_logging_steps": 2, "validation_steps": 4}})
        t = FineTuneTrainer(cfg)
        calls = {"samples": 0, "validate": 0}
        orig_v = t.validate

        def counting_samples():
            calls["samples"] += 1

        def counting_validate():
            calls["validate"] += 1
            orig_v()

        t.log_samples = counting_samples
        t.validate = counting_validate
        t.train()
        # step 2 -> standalone log_samples; step 4 -> validate (which calls
        # log_samples itself — the standalone image log is skipped at 4)
        assert calls["samples"] == 2, calls
        assert calls["validate"] == 1, calls


def test_resolve_learning_rate_keys_and_scale_lr():
    """Reference config-key parity: the bilevel upper LR reads
    prediction_model_upper_learning_rate (trainer.py:2688) with our legacy
    unet_unlearning_learning_rate spelling as fallback; scale_lr applies the
    sqrt rule over grad_accum x batch x world (trainer.py:870-884)."""
    from unlearn_ft_tpu.training.trainer import resolve_learning_rate
    from unlearn_ft_tpu.utils.config import Config

    ref = Config.wrap({"training": {"optim": {
        "prediction_model_upper_learning_rate": 5e-6,
    }}})
    keys = ("prediction_model_upper_learning_rate", "unet_unlearning_learning_rate")
    assert resolve_learning_rate(ref, keys) == 5e-6
    legacy = Config.wrap({"training": {"optim": {
        "unet_unlearning_learning_rate": 7e-6,
    }}})
    assert resolve_learning_rate(legacy, keys) == 7e-6
    # first key wins when both are present
    both = Config.wrap({"training": {"optim": {
        "prediction_model_upper_learning_rate": 5e-6,
        "unet_unlearning_learning_rate": 7e-6,
    }}})
    assert resolve_learning_rate(both, keys) == 5e-6
    # default when neither is present
    assert resolve_learning_rate(Config.wrap({}), keys) == 1e-6

    scaled = Config.wrap({
        "training": {"optim": {"prediction_model_learning_rate": 1e-4,
                               "scale_lr": True}},
        "data": {"dataloader": {"train_batch_size": 8}},
    })
    got = resolve_learning_rate(scaled, "prediction_model_learning_rate", grad_accum=2)
    np.testing.assert_allclose(got, 1e-4 * np.sqrt(2 * 8 * 1), rtol=1e-12)


def test_derive_max_train_steps_from_epochs():
    """training.num_train_epochs fills in max_train_steps from the loader
    length / grad_accum (reference update_config_params, trainer.py:445-450)."""
    from unlearn_ft_tpu.training.trainer import BaseTrainer
    from unlearn_ft_tpu.utils.config import Config

    class FakeLoader:
        def __len__(self):
            return 7  # batches per epoch

    t = BaseTrainer.__new__(BaseTrainer)
    t.config = Config.wrap({"training": {"num_train_epochs": 3}})
    t.grad_accum = 2
    t.train_loader = FakeLoader()
    t._derive_max_train_steps()
    assert t.config.training.max_train_steps == 3 * 4  # ceil(7/2) = 4

    # explicit max_train_steps wins
    t.config = Config.wrap({"training": {"num_train_epochs": 3,
                                         "max_train_steps": 5}})
    t._derive_max_train_steps()
    assert t.config.training.max_train_steps == 5


def test_sample_prompts_cap():
    """data.max_generated_samples caps the sample-logging prompt list
    (reference trainer.py:432-434)."""
    from unlearn_ft_tpu.training.trainer import BaseTrainer
    from unlearn_ft_tpu.utils.config import Config

    t = BaseTrainer.__new__(BaseTrainer)
    t.config = Config.wrap({"data": {"prompts": ["a", "b", "c"],
                                     "max_generated_samples": 2}})
    assert t.sample_prompts() == ["a", "b"]
    t.config = Config.wrap({"data": {"prompts": ["a", "b", "c"]}})
    assert t.sample_prompts() == ["a", "b", "c"]


def test_bilevel_trainer_packed_dispatch_matches_tree():
    """training.packed_dispatch must be a pure dispatch-layer change: the
    packed bilevel run reproduces the tree run's losses exactly (same seed,
    same synthetic batches). Threshold forces MIXED packing (flat + rest)."""
    from unlearn_ft_tpu.training.bilevel import BilevelFineTuneTrainer

    rows = {}
    for mode in ("tree", "packed"):
        with tempfile.TemporaryDirectory() as tmp:
            cfg = _config(tmp, small=True)
            cfg.training.max_train_steps = 4
            if mode == "packed":
                cfg.merge({"training": {"packed_dispatch": True,
                                        "pack_threshold": 4096}})
            t = BilevelFineTuneTrainer(cfg)
            if mode == "packed":
                assert t._packed and t._pk["param"].n_rest > 0
                assert t._pk["param"].sizes  # genuinely mixed
            t.train()
            rows[mode] = _read_metrics(tmp)
    assert len(rows["tree"]) == len(rows["packed"])
    for a, b in zip(rows["tree"], rows["packed"]):
        np.testing.assert_allclose(a["loss"], b["loss"], rtol=1e-6)
        if "upper_loss" in a:
            np.testing.assert_allclose(a["upper_loss"], b["upper_loss"], rtol=1e-6)


def test_packed_dispatch_checkpoint_resume():
    """Checkpoints written from a packed run hold plain param trees (same
    on-disk format), and resume re-packs."""
    from unlearn_ft_tpu.training.bilevel import BilevelFineTuneTrainer

    with tempfile.TemporaryDirectory() as tmp:
        cfg = _config(tmp, small=True)
        cfg.training.max_train_steps = 2
        cfg.training.checkpoint_steps = 2
        cfg.merge({"training": {"packed_dispatch": True, "pack_threshold": 4096}})
        t = BilevelFineTuneTrainer(cfg)
        t.train()
        assert t.ckpt.latest_step() == 2

        cfg2 = _config(tmp, small=True)
        cfg2.training.max_train_steps = 3
        cfg2.training.logging.resume_from_checkpoint = "latest"
        cfg2.merge({"training": {"packed_dispatch": True, "pack_threshold": 4096}})
        t2 = BilevelFineTuneTrainer(cfg2)
        t2.ckpt = t.ckpt
        t2.maybe_resume()
        assert t2.global_step == 2
        # packed state round-tripped: params tree matches the checkpoint
        a = t._host_tree(t.params, "param")
        b = t2._host_tree(t2.params, "param")
        import jax as _jax

        for x, y in zip(_jax.tree.leaves(a), _jax.tree.leaves(b)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_packed_dispatch_rejects_explicit_zero1():
    """packed_dispatch + explicit ZeRO-1 moment sharding is a config error
    (sharding a flat buffer would split unpack slices across shards)."""
    from unlearn_ft_tpu.training.finetune import FineTuneTrainer

    with tempfile.TemporaryDirectory() as tmp:
        cfg = _config(tmp)
        cfg.merge({"training": {"packed_dispatch": True,
                                "optim": {"shard_optimizer_states": True}}})
        with pytest.raises(ValueError, match="mutually exclusive"):
            FineTuneTrainer(cfg)


def test_pruning_trainer_packed_dispatch_matches_tree():
    """packed_dispatch on the pruning trainer (frozen-tower packing only)
    reproduces the tree run's losses."""
    from unlearn_ft_tpu.training.pruner import PruningTrainer

    rows = {}
    for mode in ("tree", "packed"):
        with tempfile.TemporaryDirectory() as tmp:
            cfg = _config(tmp, small=True)
            cfg.training.max_train_steps = 2
            if mode == "packed":
                cfg.merge({"training": {"packed_dispatch": True,
                                        "pack_threshold": 4096}})
            t = PruningTrainer(cfg)
            if mode == "packed":
                assert t._frozen_spec is not None and t._frozen_spec.n_rest > 0
            t.train()
            rows[mode] = _read_metrics(tmp)
    for a, b in zip(rows["tree"], rows["packed"]):
        np.testing.assert_allclose(a["loss"], b["loss"], rtol=1e-6)
        np.testing.assert_allclose(a["resource_ratio"], b["resource_ratio"], rtol=1e-6)


def test_async_checkpointing_config_wiring():
    """training.async_checkpointing reaches the CheckpointManager, and a
    trained run's final checkpoint is complete after train() returns (the
    loop joins the writer thread before finishing)."""
    import jax

    from unlearn_ft_tpu.training.finetune import FineTuneTrainer

    with tempfile.TemporaryDirectory() as tmp:
        cfg = _config(tmp)
        cfg.training.max_train_steps = 2
        cfg.training.checkpoint_steps = 1
        cfg.merge({"training": {"async_checkpointing": True}})
        t = FineTuneTrainer(cfg)
        assert t.ckpt.async_save
        t.train()
        assert t.ckpt.latest_step() == 2
        restored = t.ckpt.restore(2, {
            "params": jax.device_get(t.params),
            "opt_state": jax.device_get(t.opt_state),
            "step": 0,
        })
        assert int(restored["step"]) == 2
