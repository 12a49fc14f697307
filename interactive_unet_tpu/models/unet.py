"""U-Net and U-Net++ decoders (capability of smp.Unet / smp.UnetPlusPlus,
reference unet.py:33-36)."""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvNormAct, SCSE, pair_handoff, upsample, upsample_to


class SegmentationHead(nn.Module):
    """1x1 conv to class logits + softmax probabilities in float32
    (the loss suite consumes probabilities, reference unet.py:65-69)."""

    num_classes: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32)(
            x.astype(jnp.float32))
        return nn.softmax(x, axis=-1)


class UNetDecoder(nn.Module):
    """Walks the (2,4,8,16,32)-stride skip ladder, then a final light block
    back to stride 1 with the raw input as the shallowest skip — the smp
    decoder_channels=(256,128,64,32,16) structure.  Keeping full-resolution
    compute to one width-16 block is the TPU MFU fix (encoders.py docstring)."""

    widths: Sequence[int] = (256, 128, 64, 32)
    final_width: int = 16
    use_scse: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, image):
        x = feats[-1]
        skips = feats[:-1][::-1]  # deepest-first
        for w, skip in zip(self.widths, skips):
            x = upsample_to(x, skip.shape[1:3])
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
            pk = pair_handoff(x)
            x = ConvNormAct(w, dtype=self.dtype, packed_out=pk)(x)
            x = ConvNormAct(w, dtype=self.dtype, packed_in=pk)(x)
            if self.use_scse:
                x = SCSE(dtype=self.dtype)(x)
        x = upsample_to(x, image.shape[1:3])
        x = jnp.concatenate([x, image.astype(x.dtype)], axis=-1)
        pk = pair_handoff(x)
        x = ConvNormAct(self.final_width, dtype=self.dtype, packed_out=pk)(x)
        x = ConvNormAct(self.final_width, dtype=self.dtype, packed_in=pk)(x)
        if self.use_scse:
            x = SCSE(dtype=self.dtype)(x)
        return x


class UNet(nn.Module):
    encoder: nn.Module
    num_classes: int = 2
    decoder_widths: Sequence[int] = (256, 128, 64, 32)
    use_scse: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        feats = self.encoder(x.astype(self.dtype))
        h = UNetDecoder(self.decoder_widths, use_scse=self.use_scse,
                        dtype=self.dtype)(feats, x)
        return SegmentationHead(self.num_classes)(h)


class UNetPlusPlus(nn.Module):
    """Nested dense skip pathways (smp.UnetPlusPlus capability)."""

    encoder: nn.Module
    num_classes: int = 2
    decoder_widths: Sequence[int] = (256, 128, 64, 32)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        feats = self.encoder(x.astype(self.dtype))
        depth = len(feats)  # 5, at strides (2,4,8,16,32)
        # grid[i][j]: node at stride 2^(i+1), column j; column 0 = encoder feats
        grid = {(i, 0): feats[i] for i in range(depth)}
        # widths indexed by row, deepest rows use larger widths
        row_w = list(self.decoder_widths[::-1]) + [feats[-1].shape[-1]]
        for j in range(1, depth):
            for i in range(depth - j):
                up = upsample_to(grid[(i + 1, j - 1)],
                                 grid[(i, 0)].shape[1:3])
                cat = [grid[(i, k)].astype(up.dtype) for k in range(j)] + [up]
                h = jnp.concatenate(cat, axis=-1)
                pk = pair_handoff(h)
                h = ConvNormAct(row_w[i], dtype=self.dtype, packed_out=pk)(h)
                h = ConvNormAct(row_w[i], dtype=self.dtype, packed_in=pk)(h)
                grid[(i, j)] = h
        # final light block back to stride 1 (input as shallowest skip)
        h = upsample_to(grid[(0, depth - 1)], x.shape[1:3])
        h = jnp.concatenate([h, x.astype(h.dtype)], axis=-1)
        pk = pair_handoff(h)
        h = ConvNormAct(16, dtype=self.dtype, packed_out=pk)(h)
        h = ConvNormAct(16, dtype=self.dtype, packed_in=pk)(h)
        return SegmentationHead(self.num_classes)(h)
