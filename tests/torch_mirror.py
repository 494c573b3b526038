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
    if rspec.dropped:
        # the reference's prune() swaps a depth-dropped resnet for
        # parameterless Identities (blocks.py:651-663); up-block variants
        # discard the concat skip tail and pass the hidden part through
        # (blocks.py:502-510). NCHW: concat is [hidden, skip] on dim 1.
        if rspec.is_input_concatenated and rspec.skip_channels:
            return x[:, : x.shape[1] - rspec.skip_channels]
        return x
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
    if tspec.dropped:  # depth-dropped Transformer2D -> Identity (blocks.py:1324-1336)
        return x
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


# ---------------------------------------------------------------------------
# Flux transformer (MMDiT) — diffusers FluxTransformer2DModel semantics
# (reference pdm/models/transformers/transformer_flux.py:22-451 forward,
#  loaded via from_pretrained at pdm/training/trainer.py:1604-1729)
# ---------------------------------------------------------------------------

def synth_flux_state_dict(cfg, seed=0):
    """Random HF-named FluxTransformer2DModel state dict for a FluxConfig."""
    s = _Synth(seed)
    inner = cfg.num_attention_heads * cfg.attention_head_dim
    mlp = int(inner * cfg.mlp_ratio)
    head_dim = cfg.attention_head_dim

    def rms(p, d):
        s.sd[p + ".weight"] = (
            1.0 + s.rng.standard_normal(d) * s.scale
        ).astype(np.float32)

    s.linear("x_embedder", inner, cfg.in_channels)
    s.linear("context_embedder", inner, cfg.joint_attention_dim)
    s.linear("time_text_embed.timestep_embedder.linear_1", inner, 256)
    s.linear("time_text_embed.timestep_embedder.linear_2", inner, inner)
    s.linear("time_text_embed.text_embedder.linear_1", inner, cfg.pooled_projection_dim)
    s.linear("time_text_embed.text_embedder.linear_2", inner, inner)
    if cfg.guidance_embeds:
        s.linear("time_text_embed.guidance_embedder.linear_1", inner, 256)
        s.linear("time_text_embed.guidance_embedder.linear_2", inner, inner)
    for i in range(cfg.num_layers):
        p = f"transformer_blocks.{i}"
        s.linear(p + ".norm1.linear", 6 * inner, inner)
        s.linear(p + ".norm1_context.linear", 6 * inner, inner)
        for n in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj"):
            s.linear(f"{p}.attn.{n}", inner, inner)
        for n in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            rms(f"{p}.attn.{n}", head_dim)
        s.linear(p + ".attn.to_out.0", inner, inner)
        s.linear(p + ".attn.to_add_out", inner, inner)
        s.linear(p + ".ff.net.0.proj", mlp, inner)
        s.linear(p + ".ff.net.2", inner, mlp)
        s.linear(p + ".ff_context.net.0.proj", mlp, inner)
        s.linear(p + ".ff_context.net.2", inner, mlp)
    for i in range(cfg.num_single_layers):
        p = f"single_transformer_blocks.{i}"
        s.linear(p + ".norm.linear", 3 * inner, inner)
        s.linear(p + ".proj_mlp", mlp, inner)
        for n in ("to_q", "to_k", "to_v"):
            s.linear(f"{p}.attn.{n}", inner, inner)
        rms(p + ".attn.norm_q", head_dim)
        rms(p + ".attn.norm_k", head_dim)
        s.linear(p + ".proj_out", inner, inner + mlp)
    s.linear("norm_out.linear", 2 * inner, inner)
    s.linear("proj_out", cfg.patch_size * cfg.patch_size * cfg.in_channels, inner)
    return s.sd


def _flux_rope(ids, axes_dims, theta=10000.0):
    """diffusers FluxPosEmbed / get_1d_rotary_pos_embed(use_real=True,
    repeat_interleave_real=True): per-axis cos/sin repeated-interleaved to
    full dim, concatenated over axes. ids [B, L, n_axes] ->
    (cos, sin) each [B, L, sum(dims)]."""
    cos_parts, sin_parts = [], []
    for i, dim in enumerate(axes_dims):
        pos = ids[..., i].float()
        freqs = 1.0 / (theta ** (torch.arange(0, dim, 2, dtype=torch.float32) / dim))
        angles = pos[..., None] * freqs[None, None, :]
        cos_parts.append(torch.repeat_interleave(torch.cos(angles), 2, dim=-1))
        sin_parts.append(torch.repeat_interleave(torch.sin(angles), 2, dim=-1))
    return torch.cat(cos_parts, -1), torch.cat(sin_parts, -1)


def _flux_apply_rope(x, cos, sin):
    """diffusers apply_rotary_emb(use_real=True, use_real_unbind_dim=-1):
    x [B, H, L, D], cos/sin [B, L, D] interleave-repeated."""
    x_real = x[..., 0::2]
    x_imag = x[..., 1::2]
    x_rot = torch.stack([-x_imag, x_real], dim=-1).reshape(x.shape)
    return x * cos[:, None] + x_rot * sin[:, None]


def _flux_rmsnorm(sd, p, x, eps=1e-6):
    var = x.float().pow(2).mean(-1, keepdim=True)
    return x * torch.rsqrt(var + eps) * _t(sd, p + ".weight")


def _flux_lnz(x):
    return F.layer_norm(x, x.shape[-1:], eps=1e-6)


def _flux_sdpa(sd, p, q_src, kv_ctx, rope, heads, head_dim):
    """Joint dual-stream attention: q/k/v from image stream, add_*_proj from
    text stream, text-first concat, RoPE over the joint sequence, SDPA."""
    b, li, _ = q_src.shape
    lt = kv_ctx.shape[1]

    def split_heads(t):
        return t.view(b, -1, heads, head_dim).transpose(1, 2)

    q = _flux_rmsnorm(sd, p + ".norm_q", split_heads(_lin(sd, p + ".to_q", q_src)))
    k = _flux_rmsnorm(sd, p + ".norm_k", split_heads(_lin(sd, p + ".to_k", q_src)))
    v = split_heads(_lin(sd, p + ".to_v", q_src))
    cq = _flux_rmsnorm(sd, p + ".norm_added_q",
                       split_heads(_lin(sd, p + ".add_q_proj", kv_ctx)))
    ck = _flux_rmsnorm(sd, p + ".norm_added_k",
                       split_heads(_lin(sd, p + ".add_k_proj", kv_ctx)))
    cv = split_heads(_lin(sd, p + ".add_v_proj", kv_ctx))
    q = torch.cat([cq, q], dim=2)
    k = torch.cat([ck, k], dim=2)
    v = torch.cat([cv, v], dim=2)
    cos, sin = rope
    q = _flux_apply_rope(q, cos, sin)
    k = _flux_apply_rope(k, cos, sin)
    out = F.scaled_dot_product_attention(q, k, v)
    out = out.transpose(1, 2).reshape(b, lt + li, heads * head_dim)
    return out[:, lt:], out[:, :lt]


def torch_flux_forward(sd, cfg, hidden, encoder_hidden, pooled, timestep,
                       img_ids, txt_ids, guidance=None):
    """diffusers FluxTransformer2DModel.forward over an HF-named state dict.

    hidden [B, L_img, in_channels] packed latents, timestep in [0, 1]
    (x1000 applied here, as in diffusers), ids [B, L, 3].
    """
    inner = cfg.num_attention_heads * cfg.attention_head_dim
    h = _lin(sd, "x_embedder", hidden)
    temb = _lin(sd, "time_text_embed.timestep_embedder.linear_2", F.silu(
        _lin(sd, "time_text_embed.timestep_embedder.linear_1",
             torch_timestep_embedding(timestep * 1000.0, 256))))
    if cfg.guidance_embeds:
        temb = temb + _lin(sd, "time_text_embed.guidance_embedder.linear_2", F.silu(
            _lin(sd, "time_text_embed.guidance_embedder.linear_1",
                 torch_timestep_embedding(guidance * 1000.0, 256))))
    temb = temb + _lin(sd, "time_text_embed.text_embedder.linear_2", F.silu(
        _lin(sd, "time_text_embed.text_embedder.linear_1", pooled)))
    ctx = _lin(sd, "context_embedder", encoder_hidden)

    rope = _flux_rope(torch.cat([txt_ids, img_ids], dim=1), cfg.axes_dims_rope)
    heads, head_dim = cfg.num_attention_heads, cfg.attention_head_dim

    for i in range(cfg.num_layers):
        p = f"transformer_blocks.{i}"
        ada = _lin(sd, p + ".norm1.linear", F.silu(temb))
        sh, sc, g_msa, sh_mlp, sc_mlp, g_mlp = ada.chunk(6, dim=-1)
        norm_h = _flux_lnz(h) * (1 + sc[:, None]) + sh[:, None]
        ada_c = _lin(sd, p + ".norm1_context.linear", F.silu(temb))
        csh, csc, cg_msa, csh_mlp, csc_mlp, cg_mlp = ada_c.chunk(6, dim=-1)
        norm_c = _flux_lnz(ctx) * (1 + csc[:, None]) + csh[:, None]

        attn_h, attn_c = _flux_sdpa(sd, p + ".attn", norm_h, norm_c, rope,
                                    heads, head_dim)
        h = h + g_msa[:, None] * _lin(sd, p + ".attn.to_out.0", attn_h)
        n2 = _flux_lnz(h) * (1 + sc_mlp[:, None]) + sh_mlp[:, None]
        ff = _lin(sd, p + ".ff.net.2",
                  F.gelu(_lin(sd, p + ".ff.net.0.proj", n2), approximate="tanh"))
        h = h + g_mlp[:, None] * ff

        ctx = ctx + cg_msa[:, None] * _lin(sd, p + ".attn.to_add_out", attn_c)
        cn2 = _flux_lnz(ctx) * (1 + csc_mlp[:, None]) + csh_mlp[:, None]
        ffc = _lin(sd, p + ".ff_context.net.2",
                   F.gelu(_lin(sd, p + ".ff_context.net.0.proj", cn2),
                          approximate="tanh"))
        ctx = ctx + cg_mlp[:, None] * ffc

    x = torch.cat([ctx, h], dim=1)
    b, l, _ = x.shape
    for i in range(cfg.num_single_layers):
        p = f"single_transformer_blocks.{i}"
        ada = _lin(sd, p + ".norm.linear", F.silu(temb))
        sh, sc, gate = ada.chunk(3, dim=-1)
        norm_x = _flux_lnz(x) * (1 + sc[:, None]) + sh[:, None]
        mlp = F.gelu(_lin(sd, p + ".proj_mlp", norm_x), approximate="tanh")

        def sh_(t):
            return t.view(b, l, heads, head_dim).transpose(1, 2)

        q = _flux_rmsnorm(sd, f"{p}.attn.norm_q", sh_(_lin(sd, f"{p}.attn.to_q", norm_x)))
        k = _flux_rmsnorm(sd, f"{p}.attn.norm_k", sh_(_lin(sd, f"{p}.attn.to_k", norm_x)))
        v = sh_(_lin(sd, f"{p}.attn.to_v", norm_x))
        cos, sin = rope
        q = _flux_apply_rope(q, cos, sin)
        k = _flux_apply_rope(k, cos, sin)
        attn = F.scaled_dot_product_attention(q, k, v)
        attn = attn.transpose(1, 2).reshape(b, l, heads * head_dim)
        x = x + gate[:, None] * _lin(sd, p + ".proj_out",
                                     torch.cat([attn, mlp], dim=2))

    h = x[:, encoder_hidden.shape[1]:]
    ada = _lin(sd, "norm_out.linear", F.silu(temb))
    sc, sh = ada.chunk(2, dim=-1)
    h = _flux_lnz(h) * (1 + sc[:, None]) + sh[:, None]
    return _lin(sd, "proj_out", h)
