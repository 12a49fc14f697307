"""LinkNet and MA-Net decoders (capability of smp.Linknet / smp.MAnet,
reference unet.py:45-48)."""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvNormAct, SCSE, pair_handoff, upsample, upsample_to, resize_to
from .unet import SegmentationHead


class LinkNetDecoderBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = ConvNormAct(max(c // 4, 8), kernel=1, dtype=self.dtype)(x)
        h = upsample(h, 2)
        h = ConvNormAct(max(c // 4, 8), dtype=self.dtype)(h)
        return ConvNormAct(self.features, kernel=1, dtype=self.dtype)(h)


class LinkNet(nn.Module):
    """Residual-add decoder: skips are summed, not concatenated."""

    encoder: nn.Module
    num_classes: int = 2
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        feats = self.encoder(x.astype(self.dtype))
        h = feats[-1]
        for skip in feats[-2::-1]:
            h = LinkNetDecoderBlock(skip.shape[-1], dtype=self.dtype)(h)
            if h.shape[1:3] != skip.shape[1:3]:
                h = resize_to(h, skip.shape[1:3], "nearest")
            h = h + skip.astype(h.dtype)
        # stride 2 -> 1 (smp's final TransposeX2 block; no skip at stride 1)
        h = LinkNetDecoderBlock(32, dtype=self.dtype)(h)
        if h.shape[1:3] != x.shape[1:3]:
            h = resize_to(h, x.shape[1:3], "nearest")
        h = ConvNormAct(32, dtype=self.dtype)(h)
        return SegmentationHead(self.num_classes)(h)


class MAnet(nn.Module):
    """Multi-scale attention U-Net: PAB bottleneck + SCSE-fused decoder."""

    encoder: nn.Module
    num_classes: int = 2
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        feats = self.encoder(x.astype(self.dtype))
        deep = feats[-1]
        # position-attention bottleneck (low-rank spatial attention)
        b, hh, ww, c = deep.shape
        q = nn.Conv(c // 8, (1, 1), dtype=self.dtype)(deep).reshape(b, hh * ww, -1)
        k = nn.Conv(c // 8, (1, 1), dtype=self.dtype)(deep).reshape(b, hh * ww, -1)
        v = nn.Conv(c, (1, 1), dtype=self.dtype)(deep).reshape(b, hh * ww, -1)
        att = nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k,
                       preferred_element_type=jnp.float32) / jnp.sqrt(q.shape[-1]),
            axis=-1).astype(self.dtype)
        h = jnp.einsum("bqk,bkc->bqc", att, v).reshape(b, hh, ww, c) + deep

        widths = (256, 128, 64, 32)
        for w, skip in zip(widths, feats[-2::-1]):
            h = upsample_to(h, skip.shape[1:3])
            h = jnp.concatenate([h, skip.astype(h.dtype)], axis=-1)
            pk = pair_handoff(h)
            h = ConvNormAct(w, dtype=self.dtype, packed_out=pk)(h)
            h = ConvNormAct(w, dtype=self.dtype, packed_in=pk)(h)
            h = SCSE(dtype=self.dtype)(h)
        # final light block back to stride 1 (input as shallowest skip)
        h = upsample_to(h, x.shape[1:3])
        h = jnp.concatenate([h, x.astype(h.dtype)], axis=-1)
        pk = pair_handoff(h)
        h = ConvNormAct(16, dtype=self.dtype, packed_out=pk)(h)
        h = ConvNormAct(16, dtype=self.dtype, packed_in=pk)(h)
        h = SCSE(dtype=self.dtype)(h)
        return SegmentationHead(self.num_classes)(h)
