"""Builders for tiny on-disk assets that exercise the real-data paths fully
offline: a COCO-layout image/caption dataset, an SD-style model root with a
hand-built CLIP tokenizer + tiny converted text encoder, and an MPNet dir
(wordpiece tokenizer + tiny converted weights).

These mirror the artifact layouts the reference consumes from the HF hub
(pdm/training/trainer.py:2126-2144 model subfolders; trainer.py:790-800
MPNet), so trainers run end-to-end against them in tests.
"""
import json
import os

import numpy as np

TINY_CLIP = dict(
    vocab_size=64, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
    intermediate_size=64, max_position_embeddings=16, hidden_act="gelu",
    eos_token_id=1, bos_token_id=0,
)
TINY_MPNET = dict(
    vocab_size=64, hidden_size=24, num_hidden_layers=2, num_attention_heads=3,
    intermediate_size=48, max_position_embeddings=64,
)


def make_tiny_coco(root: str, n_images: int = 8, resolution: int = 24,
                   year: int = 2017) -> str:
    """COCO-layout dir: {root}/annotations/captions_{split}{year}.json +
    {root}/{split}{year}/*.jpg for train and val."""
    from PIL import Image

    rng = np.random.default_rng(0)
    words = ["red", "cat", "dog", "on", "a", "table", "blue", "car", "tree", "sky"]
    for split, n in (("train", n_images), ("val", max(2, n_images // 2))):
        img_dir = os.path.join(root, f"{split}{year}")
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
        images, annotations = [], []
        for i in range(n):
            fn = f"{split}_{i:04d}.jpg"
            arr = rng.integers(0, 255, (resolution, resolution, 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(img_dir, fn))
            images.append({"id": i, "file_name": fn})
            cap = " ".join(rng.choice(words, size=4))
            annotations.append({"image_id": i, "caption": cap, "id": 1000 + i})
        with open(os.path.join(root, "annotations", f"captions_{split}{year}.json"), "w") as f:
            json.dump({"images": images, "annotations": annotations}, f)
    return root


def _write_clip_tokenizer(tok_dir: str, vocab_size: int):
    """Minimal CLIP BPE tokenizer: specials + single chars (+ '</w>' forms).
    Unknown chars fall back to the unk token, so any caption tokenizes."""
    os.makedirs(tok_dir, exist_ok=True)
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    for ch in "abcdefghijklmnopqrstuvwxyz":
        if len(vocab) >= vocab_size - 1:
            break
        vocab[ch] = len(vocab)
        vocab[ch + "</w>"] = len(vocab)
    with open(os.path.join(tok_dir, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(tok_dir, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    with open(os.path.join(tok_dir, "tokenizer_config.json"), "w") as f:
        json.dump({"tokenizer_class": "CLIPTokenizer", "model_max_length": 16}, f)
    with open(os.path.join(tok_dir, "special_tokens_map.json"), "w") as f:
        json.dump({
            "bos_token": "<|startoftext|>", "eos_token": "<|endoftext|>",
            "unk_token": "<|endoftext|>", "pad_token": "<|endoftext|>",
        }, f)


def make_tiny_sd_root(root: str) -> dict:
    """SD-layout model root with tokenizer/ + text_encoder/ (tiny HF CLIP
    weights in safetensors, loadable by models/convert.convert_clip_text).
    Returns the matching text_encoder_config dict for the YAML config."""
    import torch
    from safetensors.torch import save_file
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel as HFModel

    _write_clip_tokenizer(os.path.join(root, "tokenizer"), TINY_CLIP["vocab_size"])

    torch.manual_seed(0)
    hf = HFModel(HFConfig(**TINY_CLIP)).eval()
    te_dir = os.path.join(root, "text_encoder")
    os.makedirs(te_dir, exist_ok=True)
    save_file({k: v.contiguous() for k, v in hf.state_dict().items()},
              os.path.join(te_dir, "model.safetensors"))
    cfg = {k: v for k, v in TINY_CLIP.items() if k != "bos_token_id"}
    return cfg


def make_tiny_mpnet_dir(root: str) -> dict:
    """MPNet model dir: wordpiece tokenizer + tiny HF MPNet safetensors.
    Returns the matching mpnet_config dict."""
    import torch
    from safetensors.torch import save_file
    from transformers import MPNetConfig as HFConfig
    from transformers import MPNetModel as HFModel

    os.makedirs(root, exist_ok=True)
    # vocab order fixes ids: <s>=0 <pad>=1 </s>=2 [UNK]=3 <mask>=4 then chars
    tokens = ["<s>", "<pad>", "</s>", "[UNK]", "<mask>"]
    tokens += list("abcdefghijklmnopqrstuvwxyz")
    tokens += ["##" + c for c in "abcdefghijklmnopqrstuvwxyz"]
    tokens = tokens[: TINY_MPNET["vocab_size"]]
    with open(os.path.join(root, "vocab.txt"), "w") as f:
        f.write("\n".join(tokens) + "\n")
    with open(os.path.join(root, "tokenizer_config.json"), "w") as f:
        json.dump({"tokenizer_class": "MPNetTokenizer", "model_max_length": 16}, f)

    torch.manual_seed(1)
    hf = HFModel(HFConfig(**TINY_MPNET)).eval()
    save_file({k: v.contiguous() for k, v in hf.state_dict().items()},
              os.path.join(root, "model.safetensors"))
    return dict(TINY_MPNET)


TINY_CLIP2 = dict(
    vocab_size=64, hidden_size=16, num_hidden_layers=2, num_attention_heads=2,
    intermediate_size=32, max_position_embeddings=16, hidden_act="gelu",
    eos_token_id=1, bos_token_id=0, projection_dim=16,
)
TINY_T5 = dict(
    vocab_size=64, d_model=16, d_kv=4, num_heads=2, d_ff=32, num_layers=2,
    relative_attention_num_buckets=8, relative_attention_max_distance=16,
)
TINY_FLUX_CLIP = dict(
    vocab_size=64, hidden_size=12, num_hidden_layers=2, num_attention_heads=2,
    intermediate_size=24, max_position_embeddings=16, hidden_act="gelu",
    eos_token_id=1, bos_token_id=0,
)


def make_tiny_sdxl_root(root: str) -> tuple:
    """SDXL-layout model root: tokenizer[_2]/ + text_encoder/ (ViT-L stand-in)
    + text_encoder_2/ (WithProjection stand-in). Returns (te_cfg, te2_cfg)."""
    import torch
    from safetensors.torch import save_file
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModelWithProjection

    te_cfg = make_tiny_sd_root(root)
    _write_clip_tokenizer(os.path.join(root, "tokenizer_2"), TINY_CLIP2["vocab_size"])
    torch.manual_seed(5)
    hf2 = CLIPTextModelWithProjection(HFConfig(**TINY_CLIP2)).eval()
    te2_dir = os.path.join(root, "text_encoder_2")
    os.makedirs(te2_dir, exist_ok=True)
    save_file({k: v.contiguous() for k, v in hf2.state_dict().items()},
              os.path.join(te2_dir, "model.safetensors"))
    te2_cfg = {k: v for k, v in TINY_CLIP2.items() if k != "bos_token_id"}
    return te_cfg, te2_cfg


def make_tiny_flux_root(root: str) -> tuple:
    """Flux-layout model root: tokenizer/ (CLIP) + text_encoder/ (CLIP pooled)
    + tokenizer_2/ + text_encoder_2/ (tiny T5). The VAE stays an explicit
    tiny config (random init) — no diffusers in this image to fabricate one.
    Returns (te_cfg, t5_cfg)."""
    import torch
    from safetensors.torch import save_file
    from transformers import CLIPTextConfig as HFCLIPConfig
    from transformers import CLIPTextModel as HFCLIPModel
    from transformers import T5Config as HFT5Config
    from transformers import T5EncoderModel as HFT5Model

    _write_clip_tokenizer(os.path.join(root, "tokenizer"), TINY_FLUX_CLIP["vocab_size"])
    # tokenizer_2 is whatever AutoTokenizer can load; a CLIP tokenizer with
    # ids < the T5 vocab keeps the test fully offline
    _write_clip_tokenizer(os.path.join(root, "tokenizer_2"), TINY_T5["vocab_size"])

    torch.manual_seed(6)
    hf1 = HFCLIPModel(HFCLIPConfig(**TINY_FLUX_CLIP)).eval()
    te_dir = os.path.join(root, "text_encoder")
    os.makedirs(te_dir, exist_ok=True)
    save_file({k: v.contiguous() for k, v in hf1.state_dict().items()},
              os.path.join(te_dir, "model.safetensors"))

    torch.manual_seed(7)
    hf2 = HFT5Model(HFT5Config(
        **TINY_T5, feed_forward_proj="gated-gelu", dropout_rate=0.0, use_cache=False,
    )).eval()
    t5_dir = os.path.join(root, "text_encoder_2")
    os.makedirs(t5_dir, exist_ok=True)
    # shared.weight aliases encoder.embed_tokens.weight; keep one copy
    save_file({k: v.contiguous().clone() for k, v in hf2.state_dict().items()
               if k != "encoder.embed_tokens.weight"},
              os.path.join(t5_dir, "model.safetensors"))

    te_cfg = {k: v for k, v in TINY_FLUX_CLIP.items() if k != "bos_token_id"}
    return te_cfg, dict(TINY_T5)
