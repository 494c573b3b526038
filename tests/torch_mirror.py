"""Minimal torch NCHW reference forward for the SD U-Net and VAE, driven
directly by HF state-dict naming.

Golden anchor for convert.convert_unet / convert_vae and the Flax NHWC
forwards (VERDICT r3 gap #2): diffusers is not installed in this image, so
this module re-implements the diffusers forward semantics (reference
behavior: pdm/models/unet/unet_2d_conditional.py:1417-1730 forward,
:2185-2495 loading) as pure torch functions over an HF-named state dict.
It deliberately shares NO code with unlearn_ft_tpu — an independent
enumeration of the architecture, so a transposed kernel, wrong GroupNorm
group slicing, or NHWC/NCHW mix-up in the converter or the Flax model
fails the comparison instead of cancelling out.

Also provides synth_unet_state_dict / synth_vae_state_dict: random HF-named
state dicts for a given spec/config (torch shapes: Linear [out, in],
Conv2d [out, in, kh, kw]).
"""
from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# State-dict synthesis (HF torch naming + shapes)
# ---------------------------------------------------------------------------

class _Synth:
    def __init__(self, seed: int, scale: float = 0.05):
        self.rng = np.random.default_rng(seed)
        self.scale = scale
        self.sd = {}

    def add(self, key, *shape):
        self.sd[key] = (self.rng.standard_normal(shape) * self.scale).astype(np.float32)

    def linear(self, p, out_f, in_f, bias=True):
        self.add(p + ".weight", out_f, in_f)
        if bias:
            self.add(p + ".bias", out_f)

    def conv(self, p, out_c, in_c, k):
        self.add(p + ".weight", out_c, in_c, k, k)
        self.add(p + ".bias", out_c)

    def norm(self, p, c):
        # offset-from-1 scale so a dropped scale/bias changes the output
        self.sd[p + ".weight"] = (
            1.0 + self.rng.standard_normal(c) * self.scale
        ).astype(np.float32)
        self.add(p + ".bias", c)


def _synth_resnet(s: _Synth, p, rspec, temb_dim):
    s.norm(p + ".norm1", rspec.in_channels)
    s.conv(p + ".conv1", rspec.hidden_channels, rspec.in_channels, 3)
    s.linear(p + ".time_emb_proj", rspec.hidden_channels, temb_dim)
    s.norm(p + ".norm2", rspec.hidden_channels)
    s.conv(p + ".conv2", rspec.out_channels, rspec.hidden_channels, 3)
    if rspec.use_shortcut:
        s.conv(p + ".conv_shortcut", rspec.out_channels, rspec.in_channels, 1)


def _synth_transformer(s: _Synth, p, tspec):
    c, inner = tspec.in_channels, tspec.in_channels
    s.norm(p + ".norm", c)
    if tspec.use_linear_projection:
        s.linear(p + ".proj_in", inner, c)
        s.linear(p + ".proj_out", c, inner)
    else:
        s.conv(p + ".proj_in", inner, c, 1)
        s.conv(p + ".proj_out", c, inner, 1)
    for li in range(tspec.num_layers):
        tb = f"{p}.transformer_blocks.{li}"
        d1 = tspec.heads[li] * tspec.head_dim
        d2 = tspec.heads2[li] * tspec.head_dim
        for n in ("norm1", "norm2", "norm3"):
            s.norm(f"{tb}.{n}", inner)
        s.linear(tb + ".attn1.to_q", d1, inner, bias=False)
        s.linear(tb + ".attn1.to_k", d1, inner, bias=False)
        s.linear(tb + ".attn1.to_v", d1, inner, bias=False)
        s.linear(tb + ".attn1.to_out.0", inner, d1)
        s.linear(tb + ".attn2.to_q", d2, inner, bias=False)
        s.linear(tb + ".attn2.to_k", d2, tspec.cross_attention_dim, bias=False)
        s.linear(tb + ".attn2.to_v", d2, tspec.cross_attention_dim, bias=False)
        s.linear(tb + ".attn2.to_out.0", inner, d2)
        s.linear(tb + ".ff.net.0.proj", 2 * tspec.ff_inner[li], inner)
        s.linear(tb + ".ff.net.2", inner, tspec.ff_inner[li])


def synth_unet_state_dict(spec, seed=0):
    s = _Synth(seed)
    temb = spec.time_embed_dim
    s.conv("conv_in", spec.block_out_channels[0], spec.in_channels, 3)
    s.linear("time_embedding.linear_1", temb, spec.block_out_channels[0])
    s.linear("time_embedding.linear_2", temb, temb)
    if spec.addition_embed_type == "text_time":
        s.linear("add_embedding.linear_1", temb,
                 spec.projection_class_embeddings_input_dim)
        s.linear("add_embedding.linear_2", temb, temb)

    def block(prefix, b):
        for j, r in enumerate(b.resnets):
            _synth_resnet(s, f"{prefix}.resnets.{j}", r, temb)
        for j, t in enumerate(b.transformers):
            _synth_transformer(s, f"{prefix}.attentions.{j}", t)
        if b.add_sampler:
            if b.kind == "down":
                s.conv(f"{prefix}.downsamplers.0.conv",
                       b.sampler_out_channels, b.sampler_out_channels, 3)
            else:
                s.conv(f"{prefix}.upsamplers.0.conv",
                       b.sampler_out_channels, b.sampler_out_channels, 3)

    for i, b in enumerate(spec.down):
        block(f"down_blocks.{i}", b)
    block("mid_block", spec.mid)
    for i, b in enumerate(spec.up):
        block(f"up_blocks.{i}", b)
    s.norm("conv_norm_out", spec.block_out_channels[0])
    s.conv("conv_out", spec.out_channels, spec.block_out_channels[0], 3)
    return s.sd


# ---------------------------------------------------------------------------
# Torch forward helpers
# ---------------------------------------------------------------------------

def _t(sd, k):
    return torch.from_numpy(np.asarray(sd[k])).float()


def _lin(sd, p, x):
    b = _t(sd, p + ".bias") if p + ".bias" in sd else None
    return F.linear(x, _t(sd, p + ".weight"), b)


def _cv(sd, p, x, stride=1, padding=1):
    return F.conv2d(x, _t(sd, p + ".weight"), _t(sd, p + ".bias"),
                    stride=stride, padding=padding)


def _gn(sd, p, x, groups, eps):
    return F.group_norm(x, groups, _t(sd, p + ".weight"), _t(sd, p + ".bias"), eps)


def _ln(sd, p, x):
    return F.layer_norm(x, x.shape[-1:], _t(sd, p + ".weight"), _t(sd, p + ".bias"), 1e-5)


def torch_timestep_embedding(t, dim, flip_sin_to_cos=True, shift=0.0):
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / (half - shift)
    emb = t.float()[:, None] * torch.exp(exponent)[None, :]
    sin, cos = torch.sin(emb), torch.cos(emb)
    out = torch.cat([cos, sin], -1) if flip_sin_to_cos else torch.cat([sin, cos], -1)
    if dim % 2 == 1:
        out = F.pad(out, (0, 1))
    return out


def _resnet(sd, p, x, temb, rspec):
    h = F.silu(_gn(sd, p + ".norm1", x, rspec.norm1_groups, rspec.eps))
    h = _cv(sd, p + ".conv1", h)
    t = _lin(sd, p + ".time_emb_proj", F.silu(temb))
    h = h + t[:, :, None, None]
    h = F.silu(_gn(sd, p + ".norm2", h, rspec.norm2_groups, rspec.eps))
    h = _cv(sd, p + ".conv2", h)
    sc = _cv(sd, p + ".conv_shortcut", x, padding=0) if rspec.use_shortcut else x
    return sc + h


def _attention(sd, p, x, ctx, heads):
    q = _lin(sd, p + ".to_q", x)
    k = _lin(sd, p + ".to_k", ctx)
    v = _lin(sd, p + ".to_v", ctx)
    b, lq, inner = q.shape
    d = inner // heads
    q = q.view(b, lq, heads, d).transpose(1, 2)
    k = k.view(b, ctx.shape[1], heads, d).transpose(1, 2)
    v = v.view(b, ctx.shape[1], heads, d).transpose(1, 2)
    scores = (q @ k.transpose(-1, -2)) / math.sqrt(d)
    probs = scores.float().softmax(dim=-1)
    out = (probs @ v).transpose(1, 2).reshape(b, lq, inner)
    return _lin(sd, p + ".to_out.0", out)


def _transformer(sd, p, x, ctx, tspec):
    b, c, hh, ww = x.shape
    residual = x
    inner = tspec.in_channels
    h = _gn(sd, p + ".norm", x, tspec.norm_groups, 1e-6)
    if tspec.use_linear_projection:
        h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        h = _lin(sd, p + ".proj_in", h)
    else:
        h = _cv(sd, p + ".proj_in", h, padding=0)
        h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, inner)
    for li in range(tspec.num_layers):
        tb = f"{p}.transformer_blocks.{li}"
        # self-attention
        n1 = _ln(sd, tb + ".norm1", h)
        h = h + _attention(sd, tb + ".attn1", n1, n1, tspec.heads[li])
        # cross-attention
        n2 = _ln(sd, tb + ".norm2", h)
        h = h + _attention(sd, tb + ".attn2", n2, ctx, tspec.heads2[li])
        # GEGLU feed-forward
        n3 = _ln(sd, tb + ".norm3", h)
        proj = _lin(sd, tb + ".ff.net.0.proj", n3)
        a, g = proj.chunk(2, dim=-1)
        h = h + _lin(sd, tb + ".ff.net.2", a * F.gelu(g))
    if tspec.use_linear_projection:
        h = _lin(sd, p + ".proj_out", h)
        h = h.reshape(b, hh, ww, c).permute(0, 3, 1, 2)
    else:
        h = h.reshape(b, hh, ww, inner).permute(0, 3, 1, 2)
        h = _cv(sd, p + ".proj_out", h, padding=0)
    return h + residual


def torch_unet_forward(sd, spec, sample, timesteps, context, added_cond=None):
    """NCHW forward of the (ungated) U-Net from an HF state dict.

    sample [B, C, H, W]; timesteps [B]; context [B, L, D]; added_cond
    optionally {'text_embeds' [B, P], 'time_ids' [B, 6]} (SDXL text_time).
    """
    t_emb = torch_timestep_embedding(
        timesteps, spec.block_out_channels[0], spec.flip_sin_to_cos, spec.freq_shift
    )
    temb = _lin(sd, "time_embedding.linear_1", t_emb)
    temb = _lin(sd, "time_embedding.linear_2", F.silu(temb))
    if spec.addition_embed_type == "text_time":
        time_ids = added_cond["time_ids"]
        t_flat = torch_timestep_embedding(
            time_ids.reshape(-1), spec.addition_time_embed_dim,
            spec.flip_sin_to_cos, spec.freq_shift,
        ).reshape(time_ids.shape[0], -1)
        aug = torch.cat([added_cond["text_embeds"], t_flat], dim=-1)
        add = _lin(sd, "add_embedding.linear_1", aug)
        temb = temb + _lin(sd, "add_embedding.linear_2", F.silu(add))

    h = _cv(sd, "conv_in", sample)
    res_stack = [h]
    for i, b in enumerate(spec.down):
        p = f"down_blocks.{i}"
        for j, r in enumerate(b.resnets):
            h = _resnet(sd, f"{p}.resnets.{j}", h, temb, r)
            if b.transformers:
                h = _transformer(sd, f"{p}.attentions.{j}", h, context, b.transformers[j])
            res_stack.append(h)
        if b.add_sampler:
            h = _cv(sd, f"{p}.downsamplers.0.conv", h, stride=2)
            res_stack.append(h)

    h = _resnet(sd, "mid_block.resnets.0", h, temb, spec.mid.resnets[0])
    h = _transformer(sd, "mid_block.attentions.0", h, context, spec.mid.transformers[0])
    h = _resnet(sd, "mid_block.resnets.1", h, temb, spec.mid.resnets[1])

    for i, b in enumerate(spec.up):
        p = f"up_blocks.{i}"
        for j, r in enumerate(b.resnets):
            skip = res_stack.pop()
            h = torch.cat([h, skip], dim=1)
            h = _resnet(sd, f"{p}.resnets.{j}", h, temb, r)
            if b.transformers:
                h = _transformer(sd, f"{p}.attentions.{j}", h, context, b.transformers[j])
        if b.add_sampler:
            h = F.interpolate(h, scale_factor=2.0, mode="nearest")
            h = _cv(sd, f"{p}.upsamplers.0.conv", h)

    h = F.silu(_gn(sd, "conv_norm_out", h, spec.norm_num_groups, 1e-5))
    return _cv(sd, "conv_out", h)


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------

def _synth_vae_resnet(s: _Synth, p, in_c, out_c):
    s.norm(p + ".norm1", in_c)
    s.conv(p + ".conv1", out_c, in_c, 3)
    s.norm(p + ".norm2", out_c)
    s.conv(p + ".conv2", out_c, out_c, 3)
    if in_c != out_c:
        s.conv(p + ".conv_shortcut", out_c, in_c, 1)


def _synth_vae_attention(s: _Synth, p, c):
    s.norm(p + ".group_norm", c)
    for n in ("to_q", "to_k", "to_v"):
        s.linear(f"{p}.{n}", c, c)
    s.linear(p + ".to_out.0", c, c)


def synth_vae_state_dict(cfg, seed=0):
    s = _Synth(seed)
    boc, lpb = cfg.block_out_channels, cfg.layers_per_block
    s.conv("encoder.conv_in", boc[0], cfg.in_channels, 3)
    prev = boc[0]
    for i, ch in enumerate(boc):
        for j in range(lpb):
            _synth_vae_resnet(s, f"encoder.down_blocks.{i}.resnets.{j}",
                              prev if j == 0 else ch, ch)
        if i < len(boc) - 1:
            s.conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", ch, ch, 3)
        prev = ch
    _synth_vae_resnet(s, "encoder.mid_block.resnets.0", boc[-1], boc[-1])
    _synth_vae_attention(s, "encoder.mid_block.attentions.0", boc[-1])
    _synth_vae_resnet(s, "encoder.mid_block.resnets.1", boc[-1], boc[-1])
    s.norm("encoder.conv_norm_out", boc[-1])
    s.conv("encoder.conv_out", 2 * cfg.latent_channels, boc[-1], 3)

    rev = tuple(reversed(boc))
    s.conv("decoder.conv_in", rev[0], cfg.latent_channels, 3)
    _synth_vae_resnet(s, "decoder.mid_block.resnets.0", rev[0], rev[0])
    _synth_vae_attention(s, "decoder.mid_block.attentions.0", rev[0])
    _synth_vae_resnet(s, "decoder.mid_block.resnets.1", rev[0], rev[0])
    prev = rev[0]
    for i, ch in enumerate(rev):
        for j in range(lpb + 1):
            _synth_vae_resnet(s, f"decoder.up_blocks.{i}.resnets.{j}",
                              prev if j == 0 else ch, ch)
        if i < len(rev) - 1:
            s.conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", ch, ch, 3)
        prev = ch
    s.norm("decoder.conv_norm_out", rev[-1])
    s.conv("decoder.conv_out", cfg.out_channels, rev[-1], 3)
    s.conv("quant_conv", 2 * cfg.latent_channels, 2 * cfg.latent_channels, 1)
    s.conv("post_quant_conv", cfg.latent_channels, cfg.latent_channels, 1)
    return s.sd


def _vae_resnet(sd, p, x, groups):
    h = F.silu(_gn(sd, p + ".norm1", x, groups, 1e-6))
    h = _cv(sd, p + ".conv1", h)
    h = F.silu(_gn(sd, p + ".norm2", h, groups, 1e-6))
    h = _cv(sd, p + ".conv2", h)
    if p + ".conv_shortcut.weight" in sd:
        x = _cv(sd, p + ".conv_shortcut", x, padding=0)
    return x + h


def _vae_attention(sd, p, x, groups):
    b, c, hh, ww = x.shape
    h = _gn(sd, p + ".group_norm", x, groups, 1e-6)
    h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
    q, k, v = (_lin(sd, f"{p}.{n}", h) for n in ("to_q", "to_k", "to_v"))
    probs = ((q @ k.transpose(-1, -2)) / math.sqrt(c)).float().softmax(dim=-1)
    out = _lin(sd, p + ".to_out.0", probs @ v)
    return x + out.reshape(b, hh, ww, c).permute(0, 3, 1, 2)


def torch_vae_encode_moments(sd, cfg, x):
    """pixels NCHW -> (mean, clipped logvar), diffusers AutoencoderKL.encode."""
    g = cfg.norm_num_groups
    h = _cv(sd, "encoder.conv_in", x)
    for i in range(len(cfg.block_out_channels)):
        for j in range(cfg.layers_per_block):
            h = _vae_resnet(sd, f"encoder.down_blocks.{i}.resnets.{j}", h, g)
        if i < len(cfg.block_out_channels) - 1:
            h = F.pad(h, (0, 1, 0, 1))
            h = _cv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv", h,
                    stride=2, padding=0)
    h = _vae_resnet(sd, "encoder.mid_block.resnets.0", h, g)
    h = _vae_attention(sd, "encoder.mid_block.attentions.0", h, g)
    h = _vae_resnet(sd, "encoder.mid_block.resnets.1", h, g)
    h = F.silu(_gn(sd, "encoder.conv_norm_out", h, g, 1e-6))
    h = _cv(sd, "encoder.conv_out", h)
    moments = _cv(sd, "quant_conv", h, padding=0)
    mean, logvar = moments.chunk(2, dim=1)
    return mean, logvar.clamp(-30.0, 20.0)


def torch_vae_decode(sd, cfg, z, scaling_factor=None, shift_factor=None):
    """latents NCHW -> pixels, diffusers AutoencoderKL.decode semantics."""
    g = cfg.norm_num_groups
    if scaling_factor is not None:
        z = z / scaling_factor + (shift_factor or 0.0)
    h = _cv(sd, "post_quant_conv", z, padding=0)
    h = _cv(sd, "decoder.conv_in", h)
    h = _vae_resnet(sd, "decoder.mid_block.resnets.0", h, g)
    h = _vae_attention(sd, "decoder.mid_block.attentions.0", h, g)
    h = _vae_resnet(sd, "decoder.mid_block.resnets.1", h, g)
    n = len(cfg.block_out_channels)
    for i in range(n):
        for j in range(cfg.layers_per_block + 1):
            h = _vae_resnet(sd, f"decoder.up_blocks.{i}.resnets.{j}", h, g)
        if i < n - 1:
            h = F.interpolate(h, scale_factor=2.0, mode="nearest")
            h = _cv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv", h)
    h = F.silu(_gn(sd, "decoder.conv_norm_out", h, g, 1e-6))
    return _cv(sd, "decoder.conv_out", h)
