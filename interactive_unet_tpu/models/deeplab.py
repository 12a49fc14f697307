"""DeepLabV3 / DeepLabV3+ decoders (capability of smp.DeepLabV3 /
smp.DeepLabV3Plus, reference unet.py:41-44)."""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvNormAct, pair_handoff, resize_to
from .unet import SegmentationHead


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling."""

    width: int = 256
    rates: Sequence[int] = (2, 4, 6)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        hw = x.shape[1:3]
        outs = [ConvNormAct(self.width, kernel=1, dtype=self.dtype)(x)]
        for r in self.rates:
            outs.append(ConvNormAct(self.width, kernel=3, dilation=r,
                                    dtype=self.dtype)(x))
        gp = jnp.mean(x, axis=(1, 2), keepdims=True)
        gp = ConvNormAct(self.width, kernel=1, dtype=self.dtype)(gp)
        outs.append(resize_to(gp, hw, "nearest"))
        h = jnp.concatenate(outs, axis=-1)
        return ConvNormAct(self.width, kernel=1, dtype=self.dtype)(h)


class DeepLabV3(nn.Module):
    encoder: nn.Module
    num_classes: int = 2
    width: int = 256
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        full_hw = x.shape[1:3]
        feats = self.encoder(x.astype(self.dtype))
        h = ASPP(width=self.width, dtype=self.dtype)(feats[-1])
        h = resize_to(h, full_hw, "bilinear")
        return SegmentationHead(self.num_classes)(h)


class DeepLabV3Plus(nn.Module):
    encoder: nn.Module
    num_classes: int = 2
    width: int = 256
    low_width: int = 48
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        full_hw = x.shape[1:3]
        feats = self.encoder(x.astype(self.dtype))
        h = ASPP(width=self.width, dtype=self.dtype)(feats[-1])
        low = feats[1]  # stride-4 skip
        h = resize_to(h, low.shape[1:3], "bilinear")
        low = ConvNormAct(self.low_width, kernel=1, dtype=self.dtype)(low)
        h = jnp.concatenate([h, low], axis=-1)
        pk = pair_handoff(h)
        h = ConvNormAct(self.width, dtype=self.dtype, packed_out=pk)(h)
        h = ConvNormAct(self.width, dtype=self.dtype, packed_in=pk)(h)
        h = resize_to(h, full_hw, "bilinear")
        return SegmentationHead(self.num_classes)(h)
