"""Feature-pyramid encoders.

Each encoder maps an NHWC input to five feature maps at strides
(1, 2, 4, 8, 16) — the skip ladder every decoder in the zoo consumes.
This covers the capability of smp's selectable encoders (reference
unet.py:56-61; UI default 'timm-tf_efficientnet_lite0', app.py:183) with a
native family: plain CNN ladders at three capacities, a MobileNetV2-style
inverted-residual encoder (the reference suggestor's encoder,
suggestor.py:22-26), an EfficientNet-lite-style encoder, and a ResNet-style
encoder.  ImageNet-pretrained weights have no TPU-native source (SURVEY hard
part #4) — encoders initialize randomly; `pretrained=True` is accepted and
recorded but does not fetch foreign weights.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvNormAct, InvertedResidual, ResidualBlock


class CNNEncoder(nn.Module):
    """Plain double-conv ladder (classic U-Net contracting path)."""

    widths: Sequence[int] = (32, 64, 128, 256, 512)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        feats = []
        for i, w in enumerate(self.widths):
            if i > 0:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = ConvNormAct(w, dtype=self.dtype)(x)
            x = ConvNormAct(w, dtype=self.dtype)(x)
            feats.append(x)
        return feats


class ResNetEncoder(nn.Module):
    """Residual ladder (resnet18-ish capacity)."""

    widths: Sequence[int] = (64, 64, 128, 256, 512)
    blocks: int = 2
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        feats = []
        x = ConvNormAct(self.widths[0], dtype=self.dtype)(x)
        feats.append(x)
        for i, w in enumerate(self.widths[1:]):
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for _ in range(self.blocks):
                x = ResidualBlock(w, dtype=self.dtype)(x)
            feats.append(x)
        return feats


class MobileNetV2Encoder(nn.Module):
    """Inverted-residual ladder (suggestor-grade, latency-optimized)."""

    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        feats = []
        x = ConvNormAct(16, dtype=self.dtype)(x)
        x = InvertedResidual(16, expand=1, dtype=self.dtype)(x)
        feats.append(x)                                        # stride 1
        x = InvertedResidual(24, stride=2, dtype=self.dtype)(x)
        x = InvertedResidual(24, dtype=self.dtype)(x)
        feats.append(x)                                        # stride 2
        x = InvertedResidual(32, stride=2, dtype=self.dtype)(x)
        x = InvertedResidual(32, dtype=self.dtype)(x)
        feats.append(x)                                        # stride 4
        x = InvertedResidual(64, stride=2, dtype=self.dtype)(x)
        x = InvertedResidual(64, dtype=self.dtype)(x)
        x = InvertedResidual(96, dtype=self.dtype)(x)
        feats.append(x)                                        # stride 8
        x = InvertedResidual(160, stride=2, dtype=self.dtype)(x)
        x = InvertedResidual(320, dtype=self.dtype)(x)
        feats.append(x)                                        # stride 16
        return feats


class EfficientNetLiteEncoder(nn.Module):
    """EfficientNet-lite0-style ladder (the reference UI default encoder)."""

    width_mult: float = 1.0
    dtype: jnp.dtype = jnp.bfloat16

    def _w(self, c):
        return max(8, int(c * self.width_mult))

    @nn.compact
    def __call__(self, x):
        feats = []
        x = ConvNormAct(self._w(32), dtype=self.dtype)(x)
        x = InvertedResidual(self._w(16), expand=1, dtype=self.dtype)(x)
        feats.append(x)                                        # stride 1
        x = InvertedResidual(self._w(24), stride=2, dtype=self.dtype)(x)
        x = InvertedResidual(self._w(24), dtype=self.dtype)(x)
        feats.append(x)                                        # stride 2
        x = InvertedResidual(self._w(40), stride=2, dtype=self.dtype)(x)
        x = InvertedResidual(self._w(40), dtype=self.dtype)(x)
        feats.append(x)                                        # stride 4
        x = InvertedResidual(self._w(80), stride=2, dtype=self.dtype)(x)
        x = InvertedResidual(self._w(80), dtype=self.dtype)(x)
        x = InvertedResidual(self._w(112), dtype=self.dtype)(x)
        feats.append(x)                                        # stride 8
        x = InvertedResidual(self._w(192), stride=2, dtype=self.dtype)(x)
        x = InvertedResidual(self._w(192), dtype=self.dtype)(x)
        x = InvertedResidual(self._w(320), dtype=self.dtype)(x)
        feats.append(x)                                        # stride 16
        return feats


ENCODER_BUILDERS = {
    "cnn_s": lambda dtype: CNNEncoder(widths=(16, 32, 64, 128, 256), dtype=dtype),
    "cnn_m": lambda dtype: CNNEncoder(widths=(32, 64, 128, 256, 512), dtype=dtype),
    "cnn_l": lambda dtype: CNNEncoder(widths=(64, 128, 256, 512, 1024), dtype=dtype),
    "resnet": lambda dtype: ResNetEncoder(dtype=dtype),
    "mobilenet_v2": lambda dtype: MobileNetV2Encoder(dtype=dtype),
    "efficientnet_lite0": lambda dtype: EfficientNetLiteEncoder(dtype=dtype),
    # aliases for reference encoder names so saved configs keep working
    "timm-tf_efficientnet_lite0": lambda dtype: EfficientNetLiteEncoder(dtype=dtype),
}
