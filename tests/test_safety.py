"""Safety checker (host-side torch reimplementation of diffusers'
StableDiffusionSafetyChecker — reference pipelines inherit it,
pruning_pipelines.py:179-187, run_safety_checker :840-848)."""
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.fast  # sub-minute unit subset (pre-commit gate)

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def model_root(tmp_path_factory):
    from transformers import CLIPImageProcessor, CLIPVisionConfig, CLIPVisionModelWithProjection

    root = tmp_path_factory.mktemp("sd_root")
    sc_dir = root / "safety_checker"
    sc_dir.mkdir()
    vis_cfg = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=16, projection_dim=16,
    )
    torch.manual_seed(0)
    model = CLIPVisionModelWithProjection(vis_cfg)
    sd = {}
    for k, v in model.state_dict().items():
        # diffusers layout: the checker wraps CLIPVisionModel under
        # `vision_model.`, so vision keys gain one more prefix level
        key = "vision_model." + k if k.startswith("vision_model.") else k
        sd[key] = v
    rng = np.random.default_rng(0)
    sd["concept_embeds"] = torch.as_tensor(
        rng.standard_normal((17, 16)).astype(np.float32))
    sd["special_care_embeds"] = torch.as_tensor(
        rng.standard_normal((3, 16)).astype(np.float32))
    sd["concept_embeds_weights"] = torch.zeros(17)
    sd["special_care_embeds_weights"] = torch.zeros(3)
    torch.save(sd, sc_dir / "pytorch_model.bin")
    with open(sc_dir / "config.json", "w") as f:
        json.dump({"vision_config": vis_cfg.to_dict()}, f)
    CLIPImageProcessor(size={"shortest_edge": 32}, crop_size={"height": 32, "width": 32}
                       ).save_pretrained(root / "feature_extractor")
    return str(root)


def test_missing_safety_checker_returns_none(tmp_path):
    from unlearn_ft_tpu.pipelines import SafetyChecker

    assert SafetyChecker.from_pretrained_root(str(tmp_path)) is None


def test_thresholds_control_flagging(model_root):
    from unlearn_ft_tpu.pipelines import SafetyChecker

    checker = SafetyChecker.from_pretrained_root(model_root)
    assert checker is not None
    imgs = np.random.default_rng(1).integers(0, 255, (2, 32, 32, 3), np.uint8)

    # thresholds far above any cosine: nothing flagged, images untouched
    checker.concept_embeds_weights = np.full(17, 2.0, np.float32)
    checker.special_care_embeds_weights = np.full(3, 2.0, np.float32)
    out, flags = checker(imgs)
    assert flags == [False, False]
    np.testing.assert_array_equal(out, imgs)

    # thresholds below -1: every image flagged and blacked out
    checker.concept_embeds_weights = np.full(17, -2.0, np.float32)
    out, flags = checker(imgs)
    assert flags == [True, True]
    assert (out == 0).all()
    # the caller's copy is untouched
    assert (imgs != 0).any()


def test_adjustment_shifts_scores(model_root):
    from unlearn_ft_tpu.pipelines import SafetyChecker

    checker = SafetyChecker.from_pretrained_root(model_root)
    imgs = np.random.default_rng(2).integers(0, 255, (1, 32, 32, 3), np.uint8)
    checker.concept_embeds_weights = np.full(17, 1.5, np.float32)
    checker.special_care_embeds_weights = np.full(3, 1.5, np.float32)
    _, strict = checker(imgs, adjustment=2.0)  # +2 pushes scores positive
    _, lax_ = checker(imgs, adjustment=0.0)
    assert strict == [True] and lax_ == [False]
