"""PSPNet and UPerNet decoders (capability of smp.PSPNet / smp.UPerNet,
reference unet.py:39-40, 51-52; note the reference's `smp.PSPNetc` typo is a
defect we do not replicate)."""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvNormAct, resize_to, upsample_to
from .unet import SegmentationHead


class PPM(nn.Module):
    """Pyramid pooling module."""

    width: int = 128
    bins: Sequence[int] = (1, 2, 3, 6)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        hw = x.shape[1:3]
        outs = [x]
        for b in self.bins:
            # adaptive average pool to roughly (b, b); window clamped >= 1 so
            # tiny deepest features (e.g. 4x4 at 64^2 input) stay valid
            ph, pw = max(1, x.shape[1] // b), max(1, x.shape[2] // b)
            p = nn.avg_pool(x, (ph, pw), strides=(ph, pw))
            p = ConvNormAct(self.width, kernel=1, dtype=self.dtype)(p)
            outs.append(resize_to(p, hw, "bilinear"))
        return jnp.concatenate(outs, axis=-1)


class PSPNet(nn.Module):
    encoder: nn.Module
    num_classes: int = 2
    width: int = 256
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        full_hw = x.shape[1:3]
        feats = self.encoder(x.astype(self.dtype))
        h = PPM(width=self.width // 4, dtype=self.dtype)(feats[-1])
        h = ConvNormAct(self.width, dtype=self.dtype)(h)
        h = resize_to(h, full_hw, "bilinear")
        return SegmentationHead(self.num_classes)(h)


class UPerNet(nn.Module):
    """PPM on the deepest level + FPN fuse over all levels."""

    encoder: nn.Module
    num_classes: int = 2
    width: int = 128
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        full_hw = x.shape[1:3]
        feats = self.encoder(x.astype(self.dtype))
        top = PPM(width=self.width, dtype=self.dtype)(feats[-1])
        top = ConvNormAct(self.width, dtype=self.dtype)(top)
        laterals = [nn.Conv(self.width, (1, 1), dtype=self.dtype)(f)
                    for f in feats[1:-1]]
        outs = [top]
        for lat in laterals[::-1]:
            outs.append(lat + upsample_to(outs[-1], lat.shape[1:3],
                                          "bilinear"))
        outs = outs[::-1]
        hw = outs[0].shape[1:3]
        fused = jnp.concatenate(
            [resize_to(ConvNormAct(self.width, dtype=self.dtype)(o), hw, "bilinear")
             for o in outs], axis=-1)
        h = ConvNormAct(self.width, dtype=self.dtype)(fused)
        h = resize_to(h, full_hw, "bilinear")
        return SegmentationHead(self.num_classes)(h)
