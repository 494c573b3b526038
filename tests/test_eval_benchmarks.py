"""Offline end-to-end drives of the unlearning benchmark drivers
(scripts/metrics/nudity_eval.py, artist_erasure.py) — the reference's
self-contained generate-then-score chains
(baselines/concept_prune/nudity_eval.py:71-177, artist_erasure.py:70-115)
on the tiny expert checkpoint, with a stubbed NudeNet detector and a tiny
local CLIP classifier."""
import importlib.util
import json
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from tiny_assets import (  # noqa: E402
    make_tiny_clip_classifier,
    make_tiny_sd_root,
    make_tiny_vae,
)

METRICS = os.path.join(os.path.dirname(__file__), "..", "scripts", "metrics")


def _load_cli(name):
    spec = importlib.util.spec_from_file_location(
        f"cli_metrics_{name}", os.path.join(METRICS, f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def eval_env(tmp_path_factory):
    from unlearn_ft_tpu.models import UNet2DConditionModel, UNetConfig, build_unet_spec
    from unlearn_ft_tpu.training.checkpoint import CheckpointManager, spec_to_json

    root = tmp_path_factory.mktemp("eval")
    sd_root = str(root / "sd_root")
    make_tiny_sd_root(sd_root)
    make_tiny_vae(sd_root)

    cfg = UNetConfig(
        sample_size=8,
        block_out_channels=(16, 16),
        layers_per_block=1,
        num_attention_heads=(2, 4),
        cross_attention_dim=32,
        norm_num_groups=4,
        ff_gate_width=4,
        upcast_attention=False,
        down_block_types=("CrossAttnDownBlock2DHalfGated", "DownBlock2DHalfGated"),
        up_block_types=("UpBlock2DHalfGated", "CrossAttnUpBlock2DHalfGated"),
    )
    spec = build_unet_spec(cfg)
    unet = UNet2DConditionModel(spec)
    params = unet.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 16, 32)),
    )["params"]
    ck_root = str(root / "ckpts")
    CheckpointManager(ck_root).save(
        100, {"params": jax.tree.map(np.asarray, params), "step": 100},
        spec_json=spec_to_json(spec),
    )
    return {
        "sd_root": sd_root,
        "checkpoint_dir": os.path.join(ck_root, "checkpoint-100"),
        "root": str(root),
    }


class _StubDetector:
    """Fixed detections: one strong v3 label, one v2-alias label, one
    below-threshold label."""

    def detect(self, path):
        return [
            {"class": "FEMALE_BREAST_EXPOSED", "score": 0.9},
            {"class": "EXPOSED_BELLY", "score": 0.6},  # v2 alias
            {"class": "FEET_EXPOSED", "score": 0.3},  # below 0.5 threshold
            {"class": "FACE_FEMALE", "score": 0.99},  # not harmful
        ]


@pytest.fixture()
def stub_nudenet(monkeypatch):
    mod = types.ModuleType("nudenet")
    mod.NudeDetector = _StubDetector
    monkeypatch.setitem(sys.modules, "nudenet", mod)
    return mod


def test_load_prompts_csv_branches(tmp_path):
    ne = _load_cli("nudity_eval")
    headered = tmp_path / "p.csv"
    headered.write_text("prompt,other\nfirst prompt,x\nsecond prompt,y\n")
    assert ne.load_prompts(str(headered), 10) == ["first prompt", "second prompt"]
    assert ne.load_prompts(str(headered), 1) == ["first prompt"]
    # raw one-prompt-per-line (ring-a-bell layout, nudity_eval.py:80-88)
    raw = tmp_path / "r.csv"
    raw.write_text("a raw line\nanother raw line\n\n")
    assert ne.load_prompts(str(raw), 10) == ["a raw line", "another raw line"]


def test_score_directory_npy_and_thresholds(tmp_path, stub_nudenet):
    """.npy images (FID layout) are converted and scored; v2 labels alias to
    v3 names; sub-threshold and non-harmful detections are not counted."""
    ne = _load_cli("nudity_eval")
    np.save(tmp_path / "00000.npy", np.zeros((8, 8, 3), np.uint8))
    np.save(tmp_path / "00001.npy", np.zeros((8, 8, 3), np.uint8))
    result = ne.score_directory(str(tmp_path))
    # re-scoring the same dir must not double-count via our own .npy->png
    # conversions left behind by pass 1
    again = ne.score_directory(str(tmp_path))
    assert again == result
    assert result["images"] == 2
    assert result["stats_per_label"]["FEMALE_BREAST_EXPOSED"] == 2
    assert result["stats_per_label"]["BELLY_EXPOSED"] == 2  # v2 alias counted
    assert result["stats_per_label"]["FEET_EXPOSED"] == 0  # below threshold
    assert result["total_harmful"] == 4
    assert len(result["images_with_nudity"]) == 2


def test_nudity_eval_end_to_end(eval_env, tmp_path, stub_nudenet):
    """ONE command: checkpoint -> generate for CSV prompts -> NudeNet counts
    JSON (VERDICT r2 missing #1)."""
    prompts_csv = tmp_path / "prompts.csv"
    prompts_csv.write_text("prompt\na cat on a table\na dog in the sky\na red car\n")
    out = tmp_path / "results.json"
    _load_cli("nudity_eval").main([
        "--checkpoint_dir", eval_env["checkpoint_dir"],
        "--pretrained_root", eval_env["sd_root"],
        "--prompts", str(prompts_csv),
        "--max_prompts", "3",
        "--save_dir", str(tmp_path / "imgs"),
        "--batch_size", "2",
        "--num_inference_steps", "2",
        "--resolution", "16",
        "--out", str(out),
    ])
    pngs = [f for f in os.listdir(tmp_path / "imgs") if f.endswith(".png")]
    assert len(pngs) == 3
    assert os.path.exists(tmp_path / "imgs" / "prompts.json")
    result = json.loads(out.read_text())
    assert result["images"] == 3
    assert result["total_harmful"] == 6  # 2 counted labels x 3 images
    # flagged files attribute back to their prompts via the manifest
    assert set(result["images_with_nudity"]) == {
        "a cat on a table", "a dog in the sky", "a red car"
    }


def test_nudity_eval_erasure_overlay_changes_images(eval_env, tmp_path, stub_nudenet):
    """--erasure_ckpt_path rides an overlay over the expert params (the
    eval_nudity.sh method switchboard)."""
    from unlearn_ft_tpu.baselines.overlay import save_overlay
    from unlearn_ft_tpu.loading import load_unet_from_checkpoint

    _, _, params, _ = load_unet_from_checkpoint(eval_env["checkpoint_dir"])
    # perturb one cross-attn projection as a fake erasure edit
    leaf = params["mid_block"]["attentions_0"]["transformer_blocks_0"]["attn2"]["to_k"]
    overlay = {"mid_block": {"attentions_0": {"transformer_blocks_0": {"attn2": {
        "to_k": {"kernel": np.asarray(leaf["kernel"]) + 1.0}}}}}}
    opath = str(tmp_path / "edit.npz")
    save_overlay(overlay, opath)

    prompts_csv = tmp_path / "prompts.csv"
    prompts_csv.write_text("prompt\na cat on a table\n")
    ne = _load_cli("nudity_eval")
    for tag, extra in (("plain", []), ("overlaid", ["--erasure_ckpt_path", opath])):
        ne.main([
            "--checkpoint_dir", eval_env["checkpoint_dir"],
            "--pretrained_root", eval_env["sd_root"],
            "--prompts", str(prompts_csv),
            "--save_dir", str(tmp_path / tag),
            "--batch_size", "1", "--num_inference_steps", "2",
            "--resolution", "16", "--skip_scoring",
        ] + extra)
    from PIL import Image

    a = np.asarray(Image.open(tmp_path / "plain" / "00000.png"))
    b = np.asarray(Image.open(tmp_path / "overlaid" / "00000.png"))
    assert a.shape == b.shape == (16, 16, 3)
    assert not np.array_equal(a, b)


def test_artist_erasure_end_to_end(eval_env, tmp_path):
    """checkpoint + per-artist CSV (prompt/evaluation_seed/guidance columns)
    -> generated images -> CLIP style-similarity JSON."""
    clip_dir = str(tmp_path / "clip")
    make_tiny_clip_classifier(clip_dir)
    csv_path = tmp_path / "test_artist.csv"
    csv_path.write_text(
        ",prompt,evaluation_seed,evaluation_guidance\n"
        "0,a wheatfield by the artist,2219,7.5\n"
        "1,almond blossoms by the artist,4965,7.5\n"
    )
    out = tmp_path / "artist.json"
    _load_cli("artist_erasure").main([
        "--checkpoint_dir", eval_env["checkpoint_dir"],
        "--pretrained_root", eval_env["sd_root"],
        "--prompts_csv", str(csv_path),
        "--artist", "the artist",
        "--save_dir", str(tmp_path / "imgs"),
        "--batch_size", "2", "--num_inference_steps", "2",
        "--resolution", "16",
        "--clip_model", clip_dir,
        "--out", str(out),
    ])
    result = json.loads(out.read_text())
    assert result["images"] == 2
    assert np.isfinite(result["style_similarity"])
    assert -1.0 <= result["style_similarity"] <= 1.0


def test_artist_per_row_guidance_groups(eval_env, tmp_path):
    """Rows with different evaluation_guidance generate in separate compiled
    groups (CFG scale is compile-time static) but keep filenames and the
    merged prompts.json keyed by the ORIGINAL csv row index."""
    clip_dir = str(tmp_path / "clip")
    make_tiny_clip_classifier(clip_dir)
    csv_path = tmp_path / "mixed.csv"
    csv_path.write_text(
        ",prompt,evaluation_seed,evaluation_guidance\n"
        "0,first prompt,1,7.5\n"
        "1,second prompt,2,9.0\n"
    )
    _load_cli("artist_erasure").main([
        "--checkpoint_dir", eval_env["checkpoint_dir"],
        "--pretrained_root", eval_env["sd_root"],
        "--prompts_csv", str(csv_path),
        "--artist", "someone",
        "--save_dir", str(tmp_path / "imgs"),
        "--batch_size", "1", "--num_inference_steps", "2",
        "--resolution", "16",
        "--clip_model", clip_dir,
    ])
    files = sorted(os.listdir(tmp_path / "imgs"))
    assert "00000.png" in files and "00001.png" in files
    import json as _json

    with open(tmp_path / "imgs" / "prompts.json") as f:
        manifest = _json.load(f)
    assert manifest == {"0": "first prompt", "1": "second prompt"}


def test_load_prompts_i2p_and_mma_branches(monkeypatch):
    """The HF-dataset branches, driven offline by stubbing datasets
    .load_dataset: i2p filters to 'sexual' categories (reference
    nudity_eval.py:71-74), mma reads adv_prompt."""
    ne = _load_cli("nudity_eval")

    class _FakeDS:
        def __init__(self, rows):
            self.rows = rows

        def filter(self, fn):
            return _FakeDS([r for r in self.rows if fn(r)])

        def __iter__(self):
            return iter(self.rows)

        def __getitem__(self, key):  # column access (mma branch)
            return [r[key] for r in self.rows]

    def fake_load_dataset(name, split=None):
        if "i2p" in name:
            assert split == "train"
            return _FakeDS([
                {"prompt": "bad one", "categories": "sexual, violence"},
                {"prompt": "fine one", "categories": "violence"},
                {"prompt": "bad two", "categories": "sexual"},
            ])
        return _FakeDS([{"adv_prompt": "adv a"}, {"adv_prompt": "adv b"}])

    fake_mod = types.ModuleType("datasets")
    fake_mod.load_dataset = fake_load_dataset
    monkeypatch.setitem(sys.modules, "datasets", fake_mod)
    assert ne.load_prompts("i2p", 10) == ["bad one", "bad two"]
    assert ne.load_prompts("i2p", 1) == ["bad one"]
    assert ne.load_prompts("mma", 10) == ["adv a", "adv b"]


def test_load_pruning_pipeline_dispatches_all_families():
    """The loader routes sd/sdxl/flux configs to the matching pipeline class
    (end-to-end checkpoint analysis is covered in test_real_data_pipeline);
    a missing checkpoint must surface as a file error, not a family guard."""
    from unlearn_ft_tpu.eval_gen import load_pruning_pipeline
    from unlearn_ft_tpu.utils.config import load_config

    for name in ("tiny_sdxl_synthetic.yaml", "tiny_flux_synthetic.yaml"):
        cfg = load_config(os.path.join(
            os.path.dirname(__file__), "..", "configs", "tests", name
        ))
        with pytest.raises(Exception) as ei:
            load_pruning_pipeline(cfg, "/nonexistent/checkpoint-0")
        assert not isinstance(ei.value, NotImplementedError), ei.value


def test_artist_csv_loader(tmp_path):
    ae = _load_cli("artist_erasure")
    csv_path = tmp_path / "a.csv"
    csv_path.write_text(
        ",prompt,evaluation_seed,evaluation_guidance\n0,p one,5,9.0\n1,p two,,\n"
    )
    prompts, seeds, guidance = ae.load_artist_csv(str(csv_path))
    assert prompts == ["p one", "p two"]
    assert seeds == [5, 0]
    assert guidance == [9.0, 7.5]


def test_generate_fid_images_stem_naming_and_config_defaults(eval_env, tmp_path):
    """FID-image chain protocol: outputs are named by the COCO image stem so
    they pair with save_captions.py/clip_features.py keys (the reference's
    convention, generate_fid_images.py:146-150), and --base_config_path
    supplies data_dir / num_inference_steps (reference :35-56)."""
    coco = tmp_path / "coco"
    (coco / "annotations").mkdir(parents=True)
    ann = {
        "images": [
            {"id": 1, "file_name": "000000000001.jpg"},
            {"id": 2, "file_name": "000000000002.jpg"},
            {"id": 3, "file_name": "000000000003.jpg"},
        ],
        "annotations": [
            {"image_id": 1, "caption": "a cat"},
            {"image_id": 1, "caption": "another cat caption"},  # deduped
            {"image_id": 2, "caption": "a dog"},
            {"image_id": 3, "caption": "a bird"},
        ],
    }
    (coco / "annotations" / "captions_val2017.json").write_text(json.dumps(ann))

    img_cfg = tmp_path / "img.yaml"
    img_cfg.write_text(
        "data:\n  data_dir: %s\n  year: 2017\ntraining:\n  num_inference_steps: 2\n"
        % coco
    )

    _load_cli("generate_fid_images").main([
        "--finetuning_ckpt_dir", eval_env["checkpoint_dir"],  # reference alias
        "--pretrained_root", eval_env["sd_root"],
        "--base_config_path", str(img_cfg),
        "--resolution", "16",
        "--batch_size", "2",
    ])
    # default save_dir: <checkpoint_dir>/coco_fid_images_<steps>
    out_dir = os.path.join(eval_env["checkpoint_dir"], "coco_fid_images_2")
    files = sorted(os.listdir(out_dir))
    assert files == [
        "000000000001.npy", "000000000002.npy", "000000000003.npy"
    ]
    img = np.load(os.path.join(out_dir, files[0]))
    assert img.dtype == np.uint8 and img.shape == (16, 16, 3)
