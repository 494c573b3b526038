"""End-to-end real-data pipeline tests, fully offline: tiny COCO-layout
dataset + hand-built tokenizers + converted tiny towers.

Covers the round-2 wiring the synthetic tests can't reach:
- MPNet weights load from a local dir (reference trainer.py:790-800) and the
  real-data collate emits `mpnet_embeddings` (data_utils.py:231-244);
- text/latent precompute streams to on-disk memmaps (bounded memory);
- train/validation splits (reference trainer.py:89-93, 252-258);
- the APTP pruning stage runs on a real dataset;
- expert dataset filtering consumes this framework's own pruning checkpoint
  (trainer.py:2200-2231 + filter_dataset, data_utils.py:322-350).
"""
import glob
import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from unlearn_ft_tpu.utils.config import load_config  # noqa: E402

from tiny_assets import make_tiny_coco, make_tiny_mpnet_dir, make_tiny_sd_root  # noqa: E402

CFG_PATH = os.path.join(os.path.dirname(__file__), "..", "configs", "tests",
                        "tiny_synthetic.yaml")


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    root = tmp_path_factory.mktemp("real_data")
    coco = make_tiny_coco(str(root / "coco"), n_images=16)
    te_cfg = make_tiny_sd_root(str(root / "sd"))
    mp_cfg = make_tiny_mpnet_dir(str(root / "mpnet"))
    return {
        "root": str(root), "coco": coco, "sd": str(root / "sd"),
        "mpnet": str(root / "mpnet"), "te_cfg": te_cfg, "mp_cfg": mp_cfg,
    }


def _real_config(assets, tmp, **overrides):
    cfg = load_config(CFG_PATH)
    cfg.merge({
        "seed": 43, "wandb_run_name": "t", "pruning_type": "multi-expert",
        "pretrained_model_name_or_path": assets["sd"],
        "mpnet_model": assets["mpnet"],
        "cache_dir": os.path.join(tmp, "cache"),
        "num_devices": 2,  # batch 2 must shard evenly over the mesh
    })
    cfg.training.logging.logging_dir = tmp
    cfg.data.data_dir = assets["coco"]
    cfg.data.max_train_samples = 16
    cfg.data.max_validation_samples = 8
    cfg.data.synthetic_seq_len = 16  # = tokenizer model_max_length
    cfg.data.dataloader.train_batch_size = 2
    cfg.data.dataloader.validation_batch_size = 2
    cfg.model.prediction_model.resolution = 16
    # text tower: cross-attention dim must match the tiny CLIP hidden size
    cfg.model.prediction_model.unet_config["cross_attention_dim"] = (
        assets["te_cfg"]["hidden_size"]
    )
    cfg.model.merge({
        "text_encoder_config": assets["te_cfg"],
        "mpnet_config": assets["mp_cfg"],
    })
    cfg.model.hypernet.input_dim = assets["mp_cfg"]["hidden_size"]
    cfg.training.max_train_steps = 2
    cfg.merge(overrides)
    return cfg


def test_finetune_real_data_end_to_end(assets, tmp_path):
    from unlearn_ft_tpu.training.finetune import FineTuneTrainer

    tmp = str(tmp_path)
    cfg = _real_config(assets, tmp)
    cfg.training.validation_steps = 2
    t = FineTuneTrainer(cfg)

    assert t.mpnet_params is not None, "MPNet weights must load from mpnet_model dir"
    assert t.val_loader is not None and len(t.val_dataset) > 0

    batch = next(iter(t.train_loader))
    assert set(batch) >= {"pixel_values", "prompt_embeds", "empty_prompt_embeds",
                          "mpnet_embeddings"}
    assert batch["mpnet_embeddings"].shape == (2, assets["mp_cfg"]["hidden_size"])
    assert batch["pixel_values"].shape == (2, 16, 16, 3)

    t.train()

    # precompute streamed to on-disk memmap caches (bounded memory)
    clip_caches = glob.glob(os.path.join(tmp, "cache", "text_emb_*_clip.npy"))
    mpnet_caches = glob.glob(os.path.join(tmp, "cache", "text_emb_*_mpnet.npy"))
    assert clip_caches and mpnet_caches
    arr = np.load(clip_caches[0], mmap_mode="r")
    assert arr.shape[1:] == (16, assets["te_cfg"]["hidden_size"])

    # val_loss logged from the held-out split
    with open(os.path.join(tmp, "t", "metrics.jsonl")) as f:
        rows = [json.loads(line) for line in f]
    assert any("val_loss" in r for r in rows)
    assert all(np.isfinite(r["val_loss"]) for r in rows if "val_loss" in r)


def test_precompute_latents_real_data(assets, tmp_path):
    from unlearn_ft_tpu.training.finetune import FineTuneTrainer

    tmp = str(tmp_path)
    cfg = _real_config(assets, tmp)
    cfg.data.merge({"precompute_latents": True})
    t = FineTuneTrainer(cfg)
    batch = next(iter(t.train_loader))
    assert "latent_moments" in batch and "pixel_values" not in batch
    # moments cache is a reopened read-only memmap
    caches = glob.glob(os.path.join(tmp, "cache", "latent_moments_*.npy"))
    assert caches
    t.train()


def test_pruner_real_data_and_own_ckpt_filtering(assets, tmp_path):
    from unlearn_ft_tpu.training.finetune import FineTuneTrainer
    from unlearn_ft_tpu.training.pruner import PruningTrainer

    tmp = str(tmp_path)
    cfg = _real_config(assets, str(tmp_path / "prune"))
    cfg.training.checkpoint_steps = 2
    pt = PruningTrainer(cfg)
    assert pt.mpnet_params is not None
    pt.train()
    ckpts = sorted(glob.glob(os.path.join(str(tmp_path / "prune"), "t", "checkpoint-*")))
    assert ckpts, "pruning checkpoint must exist"
    ckpt = ckpts[-1]
    assert os.path.exists(os.path.join(ckpt, "quantizer_embeddings.npy"))

    # stage 2: fine-tune with dataset filtering from OUR checkpoint. With a
    # barely-trained codebook the cosine assignment may collapse onto one
    # expert, so pick the first expert that owns any captions (empty experts
    # raise a clear ValueError).
    ft = None
    for eid in range(4):
        cfg2 = _real_config(assets, str(tmp_path / f"ft{eid}"))
        cfg2.merge({"pruning_ckpt_dir": ckpt, "expert_id": eid})
        cfg2.data.merge({"filter_dataset": True})
        # reuse one text-embedding cache across attempts
        cfg2.cache_dir = os.path.join(str(tmp_path), "shared_cache")
        try:
            ft = FineTuneTrainer(cfg2)
            break
        except ValueError as e:
            assert "assigned 0/" in str(e)
    assert ft is not None, "no expert owned any captions"
    assert ft.arch_vector is not None
    # filtering ran: dataset is the routed subset, not the raw record list
    assert 1 <= len(ft.dataset) <= 16
    assert type(ft.dataset).__name__ == "_Filtered"
