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
    with open(os.path.join(te_dir, "config.json"), "w") as f:
        json.dump({**cfg, "architectures": ["CLIPTextModel"]}, f)
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
    with open(os.path.join(te2_dir, "config.json"), "w") as f:
        json.dump({**te2_cfg, "architectures": ["CLIPTextModelWithProjection"]}, f)
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


# ---------------------------------------------------------------------------
# Tiny diffusers-format VAE (inverse of models/convert.convert_vae) — lets
# CLI entry points that load `vae/diffusion_pytorch_model.safetensors` run
# fully offline. Roundtrip-tested in test_cli_baselines.py.
# ---------------------------------------------------------------------------

def _t_conv(out, p, tree):
    # ascontiguousarray: safetensors.numpy.save_file silently writes the
    # *underlying buffer* of non-contiguous views (data corruption)
    out[p + ".weight"] = np.ascontiguousarray(
        np.transpose(np.asarray(tree["kernel"]), (3, 2, 0, 1))
    )
    if "bias" in tree:
        out[p + ".bias"] = np.asarray(tree["bias"])


def _t_norm(out, p, tree):
    out[p + ".weight"] = np.asarray(tree["scale"])
    out[p + ".bias"] = np.asarray(tree["bias"])


def _t_linear(out, p, tree):
    out[p + ".weight"] = np.ascontiguousarray(np.asarray(tree["kernel"]).T)
    if "bias" in tree:
        out[p + ".bias"] = np.asarray(tree["bias"])


def _t_resnet(out, p, tree):
    _t_norm(out, p + ".norm1", tree["norm1"])
    _t_conv(out, p + ".conv1", tree["conv1"])
    _t_norm(out, p + ".norm2", tree["norm2"])
    _t_conv(out, p + ".conv2", tree["conv2"])
    if "conv_shortcut" in tree:
        _t_conv(out, p + ".conv_shortcut", tree["conv_shortcut"])


def _t_mid(out, p, tree):
    _t_resnet(out, p + ".resnets.0", tree["resnets_0"])
    attn = tree["attentions_0"]
    _t_norm(out, p + ".attentions.0.group_norm", attn["group_norm"])
    for n in ("to_q", "to_k", "to_v"):
        _t_linear(out, p + f".attentions.0.{n}", attn[n])
    _t_linear(out, p + ".attentions.0.to_out.0", attn["to_out_0"])
    _t_resnet(out, p + ".resnets.1", tree["resnets_1"])


def export_vae_state_dict(flax_params: dict, block_out_channels, layers_per_block) -> dict:
    """Flax VAE param tree -> diffusers torch-naming state dict (numpy)."""
    n = len(block_out_channels)
    out: dict = {}
    enc = flax_params["encoder"]
    _t_conv(out, "encoder.conv_in", enc["conv_in"])
    _t_norm(out, "encoder.conv_norm_out", enc["conv_norm_out"])
    _t_conv(out, "encoder.conv_out", enc["conv_out"])
    _t_mid(out, "encoder.mid_block", enc["mid_block"])
    for i in range(n):
        for j in range(layers_per_block):
            _t_resnet(out, f"encoder.down_blocks.{i}.resnets.{j}",
                      enc[f"down_blocks_{i}_resnets_{j}"])
        if i < n - 1:
            _t_conv(out, f"encoder.down_blocks.{i}.downsamplers.0.conv",
                    enc[f"down_blocks_{i}_downsampler"])
    dec = flax_params["decoder"]
    _t_conv(out, "decoder.conv_in", dec["conv_in"])
    _t_norm(out, "decoder.conv_norm_out", dec["conv_norm_out"])
    _t_conv(out, "decoder.conv_out", dec["conv_out"])
    _t_mid(out, "decoder.mid_block", dec["mid_block"])
    for i in range(n):
        for j in range(layers_per_block + 1):
            _t_resnet(out, f"decoder.up_blocks.{i}.resnets.{j}",
                      dec[f"up_blocks_{i}_resnets_{j}"])
        if i < n - 1:
            _t_conv(out, f"decoder.up_blocks.{i}.upsamplers.0.conv",
                    dec[f"up_blocks_{i}_upsampler"])
    _t_conv(out, "quant_conv", flax_params["quant_conv"])
    _t_conv(out, "post_quant_conv", flax_params["post_quant_conv"])
    return out


def make_tiny_vae(root: str, block_out_channels=(8, 16), layers_per_block=1,
                  norm_num_groups=4, latent_channels=4, seed: int = 11) -> dict:
    """Write {root}/vae/{diffusion_pytorch_model.safetensors,config.json}
    for a tiny random-init VAE. Returns the matching VAEConfig kwargs."""
    import jax
    import jax.numpy as jnp
    from safetensors.numpy import save_file as np_save_file

    from unlearn_ft_tpu.models.vae import AutoencoderKL, VAEConfig

    kw = dict(block_out_channels=tuple(block_out_channels),
              layers_per_block=layers_per_block, norm_num_groups=norm_num_groups,
              latent_channels=latent_channels)
    vae = AutoencoderKL(VAEConfig(**kw))
    x = jnp.zeros((1, 16, 16, 3))
    params = vae.init(jax.random.PRNGKey(seed), x, jax.random.PRNGKey(seed + 1))["params"]
    sd = export_vae_state_dict(
        jax.tree.map(lambda a: np.asarray(a, np.float32), params),
        block_out_channels, layers_per_block,
    )
    vae_dir = os.path.join(root, "vae")
    os.makedirs(vae_dir, exist_ok=True)
    np_save_file(sd, os.path.join(vae_dir, "diffusion_pytorch_model.safetensors"))
    with open(os.path.join(vae_dir, "config.json"), "w") as f:
        json.dump({"_class_name": "AutoencoderKL", "in_channels": 3,
                   "out_channels": 3, "scaling_factor": 0.18215, **kw,
                   "block_out_channels": list(block_out_channels)}, f)
    return kw


def make_tiny_clip_classifier(root: str) -> str:
    """Tiny full CLIP (text+vision) model dir loadable with
    CLIPModel/CLIPProcessor.from_pretrained — stands in for the
    openai/clip-vit-base-patch32 zero-shot classifier the reference's
    debias loop downloads (train_debias.py:126-168)."""
    import torch
    from transformers import (
        CLIPConfig,
        CLIPImageProcessor,
        CLIPModel,
        CLIPProcessor,
        CLIPTokenizer,
    )

    os.makedirs(root, exist_ok=True)
    _write_clip_tokenizer(root, TINY_CLIP["vocab_size"])
    tok = CLIPTokenizer.from_pretrained(root)
    image_processor = CLIPImageProcessor(
        size={"shortest_edge": 32}, crop_size={"height": 32, "width": 32}
    )
    CLIPProcessor(image_processor=image_processor, tokenizer=tok).save_pretrained(root)
    torch.manual_seed(9)
    cfg = CLIPConfig(
        text_config={**{k: v for k, v in TINY_CLIP.items()}, "projection_dim": 16},
        vision_config=dict(hidden_size=16, num_hidden_layers=2, num_attention_heads=2,
                           intermediate_size=32, image_size=32, patch_size=8,
                           projection_dim=16),
        projection_dim=16,
    )
    CLIPModel(cfg).eval().save_pretrained(root)
    return root
