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
