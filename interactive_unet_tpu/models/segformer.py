"""SegFormer: MiT (mix transformer) encoder + all-MLP decode head
(capability of smp.Segformer with mit_b0 encoder, reference unet.py:53-54 and
the trainer default encoder_name='mit_b0', trainer.py:16).

Attention uses spatial-reduction (SRA) so 512^2 inputs stay MXU-friendly:
queries at full token count, keys/values pooled by the sr_ratio."""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import resize_to
from .unet import SegmentationHead


class OverlapPatchEmbed(nn.Module):
    dim: int
    patch: int = 3
    stride: int = 2
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.stride, self.stride), padding="SAME",
                    dtype=self.dtype)(x)
        return nn.LayerNorm(dtype=self.dtype)(x)


class EfficientSelfAttention(nn.Module):
    dim: int
    heads: int
    sr_ratio: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        q = nn.Dense(self.dim, dtype=self.dtype)(x).reshape(b, h * w, self.heads, -1)
        kv_in = x
        if self.sr_ratio > 1:
            kv_in = nn.Conv(self.dim, (self.sr_ratio, self.sr_ratio),
                            strides=(self.sr_ratio, self.sr_ratio),
                            dtype=self.dtype)(x)
            kv_in = nn.LayerNorm(dtype=self.dtype)(kv_in)
        hk, wk = kv_in.shape[1:3]
        k = nn.Dense(self.dim, dtype=self.dtype)(kv_in).reshape(b, hk * wk, self.heads, -1)
        v = nn.Dense(self.dim, dtype=self.dtype)(kv_in).reshape(b, hk * wk, self.heads, -1)
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                         preferred_element_type=jnp.float32)
        att = nn.softmax(att / jnp.sqrt(q.shape[-1]), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, h, w, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype)(out)


class MixFFN(nn.Module):
    dim: int
    expand: int = 4
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim * self.expand, dtype=self.dtype)(x)
        # depthwise 3x3 mixes local position information (the "Mix" in MixFFN)
        h = nn.Conv(self.dim * self.expand, (3, 3), padding="SAME",
                    feature_group_count=self.dim * self.expand,
                    dtype=self.dtype)(h)
        h = nn.gelu(h)
        return nn.Dense(self.dim, dtype=self.dtype)(h)


class MiTBlock(nn.Module):
    dim: int
    heads: int
    sr_ratio: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = x + EfficientSelfAttention(self.dim, self.heads, self.sr_ratio,
                                       dtype=self.dtype)(
            nn.LayerNorm(dtype=self.dtype)(x))
        x = x + MixFFN(self.dim, dtype=self.dtype)(
            nn.LayerNorm(dtype=self.dtype)(x))
        return x


class MiTEncoder(nn.Module):
    """mit_b0-scale hierarchy; emits strides (2,4,8,16,32) for decoder reuse
    (feats[0] is a lightweight stride-2 patch embed; the four transformer
    stages sit at strides 4..32 like the torch mit_b0)."""

    dims: Sequence[int] = (32, 64, 160, 256)
    depths: Sequence[int] = (2, 2, 2, 2)
    heads: Sequence[int] = (1, 2, 5, 8)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = OverlapPatchEmbed(16, patch=3, stride=2, dtype=self.dtype)(x)
        feats = [x]                                            # stride 2
        for i, (dim, depth, heads, sr) in enumerate(
                zip(self.dims, self.depths, self.heads, self.sr_ratios)):
            x = OverlapPatchEmbed(dim, patch=7 if i == 0 else 3, stride=2,
                                  dtype=self.dtype)(x)
            for _ in range(depth):
                x = MiTBlock(dim, heads, sr, dtype=self.dtype)(x)
            x = nn.LayerNorm(dtype=self.dtype)(x)
            feats.append(x)
        return feats


class TorchMiTAttention(nn.Module):
    """Official SegFormer attention layout (mix_transformer.py Attention):
    separate ``q`` and fused ``kv`` linears, spatial-reduction conv + LN for
    sr_ratio > 1, scale applied to q.k before softmax."""

    dim: int
    heads: int
    sr_ratio: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        hd = self.dim // self.heads
        q = nn.Dense(self.dim, dtype=self.dtype, name="q")(x)
        q = q.reshape(b, h * w, self.heads, hd)
        kv_in = x
        if self.sr_ratio > 1:
            kv_in = nn.Conv(self.dim, (self.sr_ratio, self.sr_ratio),
                            strides=(self.sr_ratio, self.sr_ratio),
                            padding="VALID", dtype=self.dtype, name="sr")(x)
            kv_in = nn.LayerNorm(dtype=self.dtype, name="norm")(kv_in)
        n_kv = kv_in.shape[1] * kv_in.shape[2]
        kv = nn.Dense(2 * self.dim, dtype=self.dtype, name="kv")(kv_in)
        kv = kv.reshape(b, n_kv, 2, self.heads, hd)
        k, v = kv[:, :, 0], kv[:, :, 1]
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                         preferred_element_type=jnp.float32)
        att = nn.softmax(att * hd ** -0.5, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, h, w, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class TorchMixFFN(nn.Module):
    """Official Mlp: fc1 -> 3x3 depthwise (mlp.dwconv.dwconv) -> exact GELU
    -> fc2 (torch nn.GELU is erf-exact; flax defaults to tanh-approx)."""

    dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        hdim = self.dim * 4
        h = nn.Dense(hdim, dtype=self.dtype, name="fc1")(x)
        h = nn.Conv(hdim, (3, 3), padding=((1, 1), (1, 1)),
                    feature_group_count=hdim, dtype=self.dtype,
                    name="dwconv")(h)
        h = nn.gelu(h, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)


class TorchMiTBlock(nn.Module):
    dim: int
    heads: int
    sr_ratio: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + TorchMiTAttention(self.dim, self.heads, self.sr_ratio,
                                  dtype=self.dtype, name="attn")(h)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        return x + TorchMixFFN(self.dim, dtype=self.dtype, name="mlp")(h)


class TorchMiTEncoder(nn.Module):
    """EXACT torch mit_b0 geometry (official SegFormer mix_transformer.py;
    what smp loads for encoder_name='mit_b0', reference unet.py:28-31) for
    name-mapped pretrained import (utils/torch_import.mit_to_flax):
    4 stages at strides (4,8,16,32) — patch_embed1 is 7x7/stride-4/pad-3
    from the raw image with explicit symmetric padding, stage LNs at
    eps=1e-6, erf GELU.  To keep the repo's 5-level pyramid contract
    (decoders read feats[1] as the stride-4 skip), feats[0] is a small
    fresh stride-2 patch embed that is NOT part of the import."""

    dims: Sequence[int] = (32, 64, 160, 256)
    depths: Sequence[int] = (2, 2, 2, 2)
    heads: Sequence[int] = (1, 2, 5, 8)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        feats = [OverlapPatchEmbed(16, patch=3, stride=2, dtype=self.dtype,
                                   name="stem")(x)]          # stride 2, fresh
        h = x
        for i, (dim, depth, heads, sr) in enumerate(
                zip(self.dims, self.depths, self.heads, self.sr_ratios)):
            p, s, pad = (7, 4, 3) if i == 0 else (3, 2, 1)
            h = nn.Conv(dim, (p, p), strides=(s, s),
                        padding=((pad, pad), (pad, pad)), dtype=self.dtype,
                        name=f"patch_embed{i + 1}_proj")(h)
            h = nn.LayerNorm(dtype=self.dtype,
                             name=f"patch_embed{i + 1}_norm")(h)
            for j in range(depth):
                h = TorchMiTBlock(dim, heads, sr, dtype=self.dtype,
                                  name=f"block{i + 1}_{j}")(h)
            h = nn.LayerNorm(dtype=self.dtype, name=f"norm{i + 1}")(h)
            feats.append(h)                                  # strides 4..32
        return feats


class Segformer(nn.Module):
    encoder: nn.Module
    num_classes: int = 2
    decoder_dim: int = 256
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        full_hw = x.shape[1:3]
        feats = self.encoder(x.astype(self.dtype))
        # all-MLP head over transformer stages (skip the stride-1 stem)
        hw = feats[1].shape[1:3]
        proj = [resize_to(nn.Dense(self.decoder_dim, dtype=self.dtype)(f),
                          hw, "bilinear")
                for f in feats[1:]]
        h = jnp.concatenate(proj, axis=-1)
        h = nn.Dense(self.decoder_dim, dtype=self.dtype)(h)
        h = nn.gelu(h)
        h = resize_to(h, full_hw, "bilinear")
        return SegmentationHead(self.num_classes)(h)
