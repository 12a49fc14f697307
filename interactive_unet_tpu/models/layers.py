"""Shared building blocks for the segmentation zoo (NHWC, bf16-friendly)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class ConvNormAct(nn.Module):
    """Conv + normalization + activation.

    ``norm="none"`` yields a biased conv with no normalization — the
    inference form of a BatchNorm'd torch block after BN folding, which is
    what pretrained-weight import produces (utils/torch_import.py).
    Padding is explicit symmetric (torch Conv2d convention) so stride-2
    convs align window-for-window with torch originals.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    act: bool = True
    groups: int = 1
    norm: str = "group"          # "group" | "none"
    act_name: str = "relu"       # "relu" | "relu6"

    @nn.compact
    def __call__(self, x):
        p = self.dilation * (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    kernel_dilation=(self.dilation, self.dilation),
                    feature_group_count=self.groups,
                    use_bias=(self.norm == "none"), dtype=self.dtype,
                    padding=((p, p), (p, p)))(x)
        if self.norm == "group":
            g = _num_groups(self.features)
            x = nn.GroupNorm(num_groups=g, dtype=self.dtype)(x)
        if self.act:
            x = jax.nn.relu6(x) if self.act_name == "relu6" else nn.relu(x)
        return x


def _num_groups(c: int, target: int = 8) -> int:
    g = min(target, c)
    while c % g:
        g -= 1
    return g


class ResidualBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = ConvNormAct(self.features, stride=self.stride, dtype=self.dtype)(x)
        h = ConvNormAct(self.features, act=False, dtype=self.dtype)(h)
        if x.shape[-1] != self.features or self.stride != 1:
            x = nn.Conv(self.features, (1, 1), strides=(self.stride, self.stride),
                        use_bias=False, dtype=self.dtype)(x)
            x = nn.GroupNorm(num_groups=_num_groups(self.features),
                             dtype=self.dtype)(x)
        return nn.relu(h + x)


class InvertedResidual(nn.Module):
    """MobileNetV2-style block (expand -> depthwise -> project), ReLU6
    activations like the torch original (enables weight import)."""

    features: int
    stride: int = 1
    expand: int = 6
    dtype: jnp.dtype = jnp.bfloat16
    norm: str = "group"

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        h = x
        mid = c_in * self.expand
        if self.expand != 1:
            h = ConvNormAct(mid, kernel=1, dtype=self.dtype, norm=self.norm,
                            act_name="relu6")(h)
        h = ConvNormAct(mid, kernel=3, stride=self.stride, groups=mid,
                        dtype=self.dtype, norm=self.norm, act_name="relu6")(h)
        h = ConvNormAct(self.features, kernel=1, act=False, dtype=self.dtype,
                        norm=self.norm)(h)
        if self.stride == 1 and c_in == self.features:
            h = h + x
        return h


def upsample(x, factor: int = 2, method: str = "nearest"):
    b, h, w, c = x.shape
    if method == "nearest":
        return jax.image.resize(x, (b, h * factor, w * factor, c), "nearest")
    return jax.image.resize(x, (b, h * factor, w * factor, c), "bilinear")


def upsample_to(x, hw, method: str = "nearest"):
    """Upsample to an exact target (h, w) — equals upsample(x, 2) on
    power-of-two ladders, and stays correct when odd input sizes make the
    encoder's floor-dividing pools misalign with the skip (e.g. 48 -> 3
    pools to 1, but the skip is 3)."""
    b, h, w, c = x.shape
    hw = tuple(int(v) for v in hw)
    if (h * 2, w * 2) == hw:
        return upsample(x, 2, method)
    return jax.image.resize(x, (b, hw[0], hw[1], c), method)


def resize_to(x, hw, method: str = "bilinear"):
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, hw[0], hw[1], c), method)


class SCSE(nn.Module):
    """Spatial & channel squeeze-excitation (used by MA-Net-style decoders)."""

    reduction: int = 8
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        # channel SE
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Dense(max(c // self.reduction, 4), dtype=self.dtype)(s)
        s = nn.relu(s)
        s = nn.Dense(c, dtype=self.dtype)(s)
        cse = x * jax.nn.sigmoid(s)
        # spatial SE
        q = nn.Conv(1, (1, 1), dtype=self.dtype)(x)
        sse = x * jax.nn.sigmoid(q)
        return cse + sse
