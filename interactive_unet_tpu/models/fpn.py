"""FPN and PAN decoders (capability of smp.FPN / smp.PAN, reference
unet.py:37-38, 49-50)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvNormAct, resize_to, upsample, upsample_to
from .unet import SegmentationHead


class FPNDecoder(nn.Module):
    pyramid_width: int = 256
    segmentation_width: int = 128
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats):
        # build laterals over strides 4..32 (feats[1:]) top-down, smp-style
        laterals = [nn.Conv(self.pyramid_width, (1, 1), dtype=self.dtype)(f)
                    for f in feats[1:]]
        outs = [laterals[-1]]
        for lat in laterals[-2::-1]:
            outs.append(lat + upsample_to(outs[-1], lat.shape[1:3]))
        outs = outs[::-1]  # stride 4 first
        # segmentation branches, all merged at stride-4 resolution
        hw = feats[1].shape[1:3]
        segs = []
        for o in outs:
            s = ConvNormAct(self.segmentation_width, dtype=self.dtype)(o)
            segs.append(resize_to(s, hw, "nearest"))
        return sum(segs)


class FPN(nn.Module):
    encoder: nn.Module
    num_classes: int = 2
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        full_hw = x.shape[1:3]
        feats = self.encoder(x.astype(self.dtype))
        h = FPNDecoder(dtype=self.dtype)(feats)
        h = resize_to(h, full_hw, "bilinear")  # stride 4 -> full resolution
        return SegmentationHead(self.num_classes)(h)


class PANDecoder(nn.Module):
    """Pyramid attention network: global-attention upsample + FPA bottleneck."""

    width: int = 128
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats):
        # FPA-style bottleneck on the deepest feature: multi-scale context
        deep = feats[-1]
        gp = jnp.mean(deep, axis=(1, 2), keepdims=True)
        gp = nn.Conv(self.width, (1, 1), dtype=self.dtype)(gp)
        mid = ConvNormAct(self.width, kernel=1, dtype=self.dtype)(deep)
        b7 = ConvNormAct(self.width, kernel=7, stride=2, dtype=self.dtype)(deep)
        b5 = ConvNormAct(self.width, kernel=5, stride=2, dtype=self.dtype)(b7)
        b3 = ConvNormAct(self.width, kernel=3, stride=2, dtype=self.dtype)(b5)
        # explicit resizes keep the ladder valid even for tiny deep features
        b5 = b5 + resize_to(b3, b5.shape[1:3], "bilinear")
        b7 = b7 + resize_to(b5, b7.shape[1:3], "bilinear")
        x = mid * resize_to(b7, deep.shape[1:3], "bilinear") + gp
        # global-attention-upsample ladder over remaining skips
        for skip in feats[-2::-1]:
            low = ConvNormAct(self.width, kernel=3, dtype=self.dtype)(skip)
            att = jax.nn.sigmoid(nn.Conv(self.width, (1, 1), dtype=self.dtype)(
                jnp.mean(x, axis=(1, 2), keepdims=True)))
            x = upsample_to(x, skip.shape[1:3], "bilinear") + low * att
        return x


class PAN(nn.Module):
    encoder: nn.Module
    num_classes: int = 2
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        full_hw = x.shape[1:3]
        feats = self.encoder(x.astype(self.dtype))
        h = PANDecoder(dtype=self.dtype)(feats)
        h = resize_to(h, full_hw, "bilinear")  # stride 2 -> full resolution
        return SegmentationHead(self.num_classes)(h)
