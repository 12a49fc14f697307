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

from ..ops import packconv
from .layers import ConvNormAct, InvertedResidual, ResidualBlock, pair_handoff


class CNNEncoder(nn.Module):
    """Plain double-conv ladder (classic U-Net contracting path) with a
    stride-2 stem; widths apply to strides (2, 4, 8, 16, 32)."""

    widths: Sequence[int] = (32, 64, 128, 256, 512)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # Each stage's double conv exchanges packed tensors (layers.py
        # packed_in/packed_out) and the 2x2 pool consumes the packed stage
        # output as a lane-wise phase max — the only unpack per stage is
        # the skip tensor itself.
        feats = []
        pk = pair_handoff(x, stride=2)
        x = ConvNormAct(self.widths[0], stride=2, dtype=self.dtype,
                        packed_out=pk)(x)
        x = ConvNormAct(self.widths[0], dtype=self.dtype,
                        packed_in=pk, packed_out=pk)(x)
        feats.append(packconv.depth_to_space(x) if pk else x)  # stride 2
        for w in self.widths[1:]:
            x = packconv.phase_max_pool(x) if pk \
                else nn.max_pool(x, (2, 2), strides=(2, 2))
            pk = pair_handoff(x)
            x = ConvNormAct(w, dtype=self.dtype, packed_out=pk)(x)
            x = ConvNormAct(w, dtype=self.dtype,
                            packed_in=pk, packed_out=pk)(x)
            feats.append(packconv.depth_to_space(x) if pk else x)
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


# -- torch-layout mirror encoders (pretrained import targets) ----------------
# These mirror torchvision resnet18/34 and timm tf_efficientnet_lite0-2
# block-for-block in folded-BN form (norm="none"), so every conv has a unique
# NAME-mapped destination for ImageNet weight import (utils/torch_import.py;
# reference unet.py:28-31 gives every encoder pretrained weights).  They are
# selected by build_encoder when pretrained=True.


class TorchResNetEncoder(nn.Module):
    """torchvision resnet ``features`` geometry: 7x7/2 stem + maxpool,
    BasicBlocks (resnet18/34) or Bottlenecks (resnet50/101) with 1x1
    downsample shortcuts; folded-BN (biased convs) when norm="none".
    Pyramid at strides (2, 4, 8, 16, 32)."""

    layers: Sequence[int] = (2, 2, 2, 2)     # resnet18; (3,4,6,3) = 34/50
    block: str = "basic"                     # "basic" | "bottleneck"
    groups: int = 1                          # 32 for resnext
    base_width: int = 64                     # 4/8 resnext, 128 wide_resnet
    se_reduction: int = 0                    # 16 for se_resnet/se_resnext
    dtype: jnp.dtype = jnp.bfloat16
    norm: str = "none"

    @nn.compact
    def __call__(self, x):
        feats = []
        x = ConvNormAct(64, kernel=7, stride=2, dtype=self.dtype,
                        norm=self.norm)(x)                    # conv1+bn1+relu
        feats.append(x)                                       # stride 2
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        for stage, (blocks, planes) in enumerate(
                zip(self.layers, (64, 128, 256, 512))):
            for b in range(blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                if self.block == "bottleneck":
                    # torchvision Bottleneck width rule (resnet.py):
                    # int(planes * base_width/64) * groups; expansion x4
                    # on planes, NOT on width
                    width = int(planes * self.base_width / 64) * self.groups
                    x = TorchBottleneckBlock(width, out_features=planes * 4,
                                             stride=stride,
                                             groups=self.groups,
                                             se_reduction=self.se_reduction,
                                             dtype=self.dtype,
                                             norm=self.norm)(x)
                else:
                    x = TorchBasicBlock(planes, stride=stride,
                                        dtype=self.dtype, norm=self.norm)(x)
            feats.append(x)                   # strides 4, 8, 16, 32
        return feats


class TorchBasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    norm: str = "none"

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        h = ConvNormAct(self.features, stride=self.stride, dtype=self.dtype,
                        norm=self.norm)(x)                    # conv1+bn1+relu
        h = ConvNormAct(self.features, act=False, dtype=self.dtype,
                        norm=self.norm)(h)                    # conv2+bn2
        if self.stride != 1 or c_in != self.features:
            # downsample: 1x1 conv + bn (folded -> biased conv)
            x = nn.Conv(self.features, (1, 1),
                        strides=(self.stride, self.stride),
                        use_bias=(self.norm == "none"),
                        dtype=self.dtype)(x)
            if self.norm == "group":
                from .layers import _num_groups as _ng
                x = nn.GroupNorm(num_groups=_ng(self.features),
                                 dtype=self.dtype)(x)
        return nn.relu(h + x)


class TorchBottleneckBlock(nn.Module):
    """torchvision Bottleneck (resnet50/101, resnext, wide_resnet): 1x1
    reduce to ``width`` -> 3x3 grouped (stride here, torchvision's
    placement) -> 1x1 expand to ``out_features`` (planes*4); 1x1 downsample
    shortcut on shape change."""

    width: int
    out_features: int = 0        # 0 -> width * 4 (plain resnet50 rule)
    stride: int = 1
    groups: int = 1
    se_reduction: int = 0        # 16 -> senet.py SEModule after conv3
    dtype: jnp.dtype = jnp.bfloat16
    norm: str = "none"

    @nn.compact
    def __call__(self, x):
        c_out = self.out_features or self.width * 4
        c_in = x.shape[-1]
        h = ConvNormAct(self.width, kernel=1, dtype=self.dtype,
                        norm=self.norm)(x)                    # conv1+bn1+relu
        h = ConvNormAct(self.width, stride=self.stride, dtype=self.dtype,
                        groups=self.groups,
                        norm=self.norm)(h)                    # conv2+bn2+relu
        h = ConvNormAct(c_out, kernel=1, act=False, dtype=self.dtype,
                        norm=self.norm)(h)                    # conv3+bn3
        if self.se_reduction:
            # senet.py SEModule: fc1 (c/r) + ReLU -> fc2 (c) + sigmoid
            # scale, applied to the residual branch before the add
            h = SqueezeExcite(max(1, c_out // self.se_reduction),
                              act_name="relu", dtype=self.dtype)(h)
        if self.stride != 1 or c_in != c_out:
            x = nn.Conv(c_out, (1, 1),
                        strides=(self.stride, self.stride),
                        use_bias=(self.norm == "none"),
                        dtype=self.dtype)(x)
            if self.norm == "group":
                from .layers import _num_groups as _ng
                x = nn.GroupNorm(num_groups=_ng(c_out),
                                 dtype=self.dtype)(x)
        return nn.relu(h + x)


# timm tf_efficientnet_lite generation rules (timm efficientnet.py
# _gen_efficientnet_lite): base repeats/channels below; depth multiplier
# scales repeats with ceil EXCEPT the first and last stage (fix_first_last),
# width multiplier rounds channels to multiples of 8 (round_channels), and
# the stem is fixed at 32 (fix_stem).  lite0 = (1.0, 1.0), lite1 =
# (1.0, 1.1), lite2 = (1.1, 1.2) (width, depth).
_EFFLITE_REPEATS = (1, 2, 2, 3, 3, 4, 1)
_EFFLITE_CHANNELS = (16, 24, 40, 80, 112, 192, 320)
_EFFLITE_STRIDES = (1, 2, 2, 2, 1, 2, 1)
# timm arch_def kernel sizes (ds_r1_k3 / ir_r2_k3 / ir_r2_k5 / ir_r3_k3 /
# ir_r3_k5 / ir_r4_k5 / ir_r1_k3) — lite keeps EfficientNet's 5x5 stages
_EFFLITE_KERNELS = (3, 3, 5, 3, 5, 5, 3)
_EFFLITE_MULT = {"efficientnet_lite0": (1.0, 1.0),
                 "efficientnet_lite1": (1.0, 1.1),
                 "efficientnet_lite2": (1.1, 1.2)}


def _round_channels(c: float, mult: float, divisor: int = 8) -> int:
    if mult == 1.0:
        return int(c)
    c *= mult
    new_c = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * c:
        new_c += divisor
    return new_c


def _efflite_arch(name: str):
    """-> (repeats, channels) per stage for a tf_efficientnet_lite variant."""
    width, depth = _EFFLITE_MULT[name]
    import math

    reps = []
    for i, r in enumerate(_EFFLITE_REPEATS):
        if i in (0, len(_EFFLITE_REPEATS) - 1):  # fix_first_last
            reps.append(r)
        else:
            reps.append(int(math.ceil(r * depth)))
    chans = [_round_channels(c, width) for c in _EFFLITE_CHANNELS]
    return tuple(reps), tuple(chans)


class TimmEfficientNetLiteEncoder(nn.Module):
    """timm ``tf_efficientnet_lite{0,1,2}`` geometry in folded-BN form:
    conv_stem(32)/2 + blocks.0 (depthwise-separable, no expansion) +
    blocks.1-6 (expand-6 inverted residuals, ReLU6, no SE; depthwise
    kernels per timm arch_def: 5x5 in stages 2, 4, 5, else 3x3).  Pyramid
    at strides (2, 4, 8, 16, 32) = after blocks 0, 1, 2, 4, 6."""

    variant: str = "efficientnet_lite0"
    dtype: jnp.dtype = jnp.bfloat16
    norm: str = "none"

    @nn.compact
    def __call__(self, x):
        reps, chans = _efflite_arch(self.variant)
        feats = []
        x = ConvNormAct(32, stride=2, dtype=self.dtype, norm=self.norm,
                        act_name="relu6")(x)                  # conv_stem+bn1
        for stage, (r, c, s, k) in enumerate(zip(reps, chans,
                                                 _EFFLITE_STRIDES,
                                                 _EFFLITE_KERNELS)):
            for b in range(r):
                stride = s if b == 0 else 1
                expand = 1 if stage == 0 else 6
                x = InvertedResidual(c, stride=stride, expand=expand,
                                     kernel=k,
                                     dtype=self.dtype, norm=self.norm)(x)
            if stage in (0, 1, 2, 4, 6):
                feats.append(x)               # strides 2, 4, 8, 16, 32
        return feats


# torchvision efficientnet_b* generation rules (torchvision
# models/efficientnet.py _efficientnet_conf): base repeats/channels/kernels
# below; width_mult rounds channels via _make_divisible(c*mult, 8) (applied
# at mult=1.0 too, unlike timm-lite); depth_mult scales repeats with ceil on
# EVERY stage (no lite-style fix_first_last); stem = adjust_channels(32).
_EFFNET_REPEATS = (1, 2, 2, 3, 3, 4, 1)
_EFFNET_CHANNELS = (16, 24, 40, 80, 112, 192, 320)
_EFFNET_STRIDES = (1, 2, 2, 2, 1, 2, 1)
_EFFNET_KERNELS = (3, 3, 5, 3, 5, 5, 3)
_EFFNET_MULT = {  # (width, depth)
    "efficientnet_b0": (1.0, 1.0),
    "efficientnet_b1": (1.0, 1.1),
    "efficientnet_b2": (1.1, 1.2),
    "efficientnet_b3": (1.2, 1.4),
    "efficientnet_b4": (1.4, 1.8),
    "efficientnet_b5": (1.6, 2.2),
    "efficientnet_b6": (1.8, 2.6),
    "efficientnet_b7": (2.0, 3.1),
}


def _make_divisible(v: float, divisor: int = 8) -> int:
    """torchvision _make_divisible (round to divisor, never below 90%)."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def _effnet_arch(name: str):
    """-> (stem_channels, repeats, channels) for a torchvision
    efficientnet_b* variant."""
    import math

    width, depth = _EFFNET_MULT[name]
    reps = tuple(int(math.ceil(r * depth)) for r in _EFFNET_REPEATS)
    chans = tuple(_make_divisible(c * width) for c in _EFFNET_CHANNELS)
    return _make_divisible(32 * width), reps, chans


class SqueezeExcite(nn.Module):
    """torchvision SqueezeExcitation: global-avg -> 1x1 fc1 + SiLU -> 1x1
    fc2 + sigmoid -> channel scale.  The fc convs carry biases and no BN,
    so they map unchanged in both the folded and from-scratch forms.
    ``act_name="relu"`` gives the senet.py SEModule form (fc1 + ReLU) used
    by the se_resnet/se_resnext family."""

    squeeze: int
    dtype: jnp.dtype = jnp.bfloat16
    act_name: str = "silu"

    @nn.compact
    def __call__(self, x):
        act = {"silu": nn.silu, "relu": nn.relu}[self.act_name]
        s = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        s = nn.Conv(self.squeeze, (1, 1), dtype=self.dtype)(s.astype(x.dtype))
        s = act(s)
        s = nn.Conv(int(x.shape[-1]), (1, 1), dtype=self.dtype)(s)
        return x * nn.sigmoid(s.astype(x.dtype))


class MBConvSE(nn.Module):
    """torchvision MBConv: 1x1 expand (SiLU) -> kxk depthwise (SiLU) ->
    squeeze-excitation (squeeze = block INPUT channels // 4, torchvision's
    rule) -> 1x1 linear project; residual at stride 1 with matching
    channels (stochastic depth is identity in the eval form)."""

    features: int
    kernel: int = 3
    stride: int = 1
    expand: int = 6
    dtype: jnp.dtype = jnp.bfloat16
    norm: str = "none"

    @nn.compact
    def __call__(self, x):
        c_in = int(x.shape[-1])
        mid = c_in * self.expand
        h = x
        if self.expand != 1:
            h = ConvNormAct(mid, kernel=1, dtype=self.dtype, norm=self.norm,
                            act_name="silu")(h)
        h = ConvNormAct(mid, kernel=self.kernel, stride=self.stride,
                        groups=mid, dtype=self.dtype, norm=self.norm,
                        act_name="silu")(h)
        h = SqueezeExcite(max(1, c_in // 4), dtype=self.dtype)(h)
        h = ConvNormAct(self.features, kernel=1, act=False, dtype=self.dtype,
                        norm=self.norm)(h)
        if self.stride == 1 and c_in == self.features:
            h = h + x
        return h


class TorchEfficientNetEncoder(nn.Module):
    """torchvision ``efficientnet_b0-b5`` features geometry (SiLU + SE
    MBConv); folded-BN form at norm="none" for name-mapped ImageNet import
    (utils/torch_import.efficientnet_to_flax; reference unet.py:28-31
    offers pretrained weights for every encoder).  Pyramid at strides
    (2, 4, 8, 16, 32) = outputs of stages 1, 2, 3, 5, 7 — smp's
    EfficientNetEncoder depth-5 cut."""

    variant: str = "efficientnet_b0"
    dtype: jnp.dtype = jnp.bfloat16
    norm: str = "none"

    @nn.compact
    def __call__(self, x):
        stem, reps, chans = _effnet_arch(self.variant)
        feats = []
        x = ConvNormAct(stem, stride=2, dtype=self.dtype, norm=self.norm,
                        act_name="silu")(x)
        for stage, (r, c, s, k) in enumerate(zip(reps, chans,
                                                 _EFFNET_STRIDES,
                                                 _EFFNET_KERNELS)):
            expand = 1 if stage == 0 else 6
            for b in range(r):
                x = MBConvSE(c, kernel=k, stride=s if b == 0 else 1,
                             expand=expand, dtype=self.dtype,
                             norm=self.norm)(x)
            if stage in (0, 1, 2, 4, 6):
                feats.append(x)               # strides 2, 4, 8, 16, 32
        return feats


# torchvision mobilenet_v3 inverted-residual settings (models/mobilenetv3.py
# _mobilenet_v3_conf): rows are (kernel, expanded_c, out_c, use_se, act,
# stride); input channels chain from the previous row (stem = 16).
_MNV3_CONFS = {
    "mobilenet_v3_large": (
        (3, 16, 16, False, "relu", 1),
        (3, 64, 24, False, "relu", 2),
        (3, 72, 24, False, "relu", 1),
        (5, 72, 40, True, "relu", 2),
        (5, 120, 40, True, "relu", 1),
        (5, 120, 40, True, "relu", 1),
        (3, 240, 80, False, "hardswish", 2),
        (3, 200, 80, False, "hardswish", 1),
        (3, 184, 80, False, "hardswish", 1),
        (3, 184, 80, False, "hardswish", 1),
        (3, 480, 112, True, "hardswish", 1),
        (3, 672, 112, True, "hardswish", 1),
        (5, 672, 160, True, "hardswish", 2),
        (5, 960, 160, True, "hardswish", 1),
        (5, 960, 160, True, "hardswish", 1),
    ),
    "mobilenet_v3_small": (
        (3, 16, 16, True, "relu", 2),
        (3, 72, 24, False, "relu", 2),
        (3, 88, 24, False, "relu", 1),
        (5, 96, 40, True, "hardswish", 2),
        (5, 240, 40, True, "hardswish", 1),
        (5, 240, 40, True, "hardswish", 1),
        (5, 120, 48, True, "hardswish", 1),
        (5, 144, 48, True, "hardswish", 1),
        (5, 288, 96, True, "hardswish", 2),
        (5, 576, 96, True, "hardswish", 1),
        (5, 576, 96, True, "hardswish", 1),
    ),
}


class SqueezeExciteV3(nn.Module):
    """torchvision SqueezeExcitation in its MobileNetV3 parameterization:
    fc1 + ReLU -> fc2 + hard-sigmoid channel scale (biased convs, no BN)."""

    squeeze: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        s = nn.Conv(self.squeeze, (1, 1), dtype=self.dtype)(s.astype(x.dtype))
        s = nn.relu(s)
        s = nn.Conv(int(x.shape[-1]), (1, 1), dtype=self.dtype)(s)
        return x * nn.hard_sigmoid(s.astype(x.dtype))


class MobileNetV3Block(nn.Module):
    """torchvision MobileNetV3 InvertedResidual: 1x1 expand (skipped when
    expanded == input channels) -> kxk depthwise -> optional SE
    (squeeze = _make_divisible(expanded // 4)) -> 1x1 linear project;
    residual at stride 1 with matching channels."""

    features: int
    kernel: int = 3
    exp: int = 16
    use_se: bool = False
    act: str = "hardswish"
    stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    norm: str = "none"

    @nn.compact
    def __call__(self, x):
        c_in = int(x.shape[-1])
        h = x
        if self.exp != c_in:
            h = ConvNormAct(self.exp, kernel=1, dtype=self.dtype,
                            norm=self.norm, act_name=self.act)(h)
        h = ConvNormAct(self.exp, kernel=self.kernel, stride=self.stride,
                        groups=self.exp, dtype=self.dtype, norm=self.norm,
                        act_name=self.act)(h)
        if self.use_se:
            h = SqueezeExciteV3(_make_divisible(self.exp // 4),
                                dtype=self.dtype)(h)
        h = ConvNormAct(self.features, kernel=1, act=False, dtype=self.dtype,
                        norm=self.norm)(h)
        if self.stride == 1 and c_in == self.features:
            h = h + x
        return h


class TorchMobileNetV3Encoder(nn.Module):
    """torchvision ``mobilenet_v3_large/small`` features geometry
    (hardswish stem + V3 inverted residuals); folded-BN form at norm="none"
    for name-mapped ImageNet import (utils/torch_import.mobilenet_v3_to_flax;
    reference unet.py:28-31).  Pyramid at strides (2, 4, 8, 16, 32): the
    tensor entering each stride-2 block plus the final block output — the
    same cut smp's timm-mobilenetv3 encoders use."""

    variant: str = "mobilenet_v3_large"
    dtype: jnp.dtype = jnp.bfloat16
    norm: str = "none"

    @nn.compact
    def __call__(self, x):
        feats = []
        x = ConvNormAct(16, stride=2, dtype=self.dtype, norm=self.norm,
                        act_name="hardswish")(x)                   # stem
        for k, exp, c, se, act, s in _MNV3_CONFS[self.variant]:
            if s == 2:
                feats.append(x)
            x = MobileNetV3Block(c, kernel=k, exp=exp, use_se=se, act=act,
                                 stride=s, dtype=self.dtype,
                                 norm=self.norm)(x)
        feats.append(x)
        return feats


class _Affine(nn.Module):
    """Eval-mode BatchNorm as a per-channel affine (scale, bias).

    DenseNet's BN sits BEFORE its convs (pre-activation), so it cannot fold
    into a neighboring conv across the intervening ReLU the way the other
    importers do; the importer maps BN to this module directly
    (scale = gamma/sqrt(var+eps), bias = beta - mean*scale)."""

    @nn.compact
    def __call__(self, x):
        c = int(x.shape[-1])
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


class TorchDenseLayer(nn.Module):
    """torchvision _DenseLayer: norm1-relu-conv1x1(4g)-norm2-relu-conv3x3(g),
    output concatenated onto the input (all convs bias-free, like torch)."""

    growth: int = 32
    dtype: jnp.dtype = jnp.bfloat16
    norm: str = "none"

    def _n(self, x):
        if self.norm == "none":
            return _Affine()(x)
        return nn.GroupNorm(num_groups=_dn_groups(int(x.shape[-1])),
                            dtype=self.dtype)(x)

    @nn.compact
    def __call__(self, x):
        h = nn.relu(self._n(x))
        h = nn.Conv(4 * self.growth, (1, 1), use_bias=False,
                    dtype=self.dtype)(h)
        h = nn.relu(self._n(h))
        h = nn.Conv(self.growth, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype)(h)
        return jnp.concatenate([x, h], axis=-1)


# densenet variants: (block_config, growth, num_init)
_DENSENET_FORMS = {
    "densenet121": ((6, 12, 24, 16), 32, 64),
    "densenet161": ((6, 12, 36, 24), 48, 96),
    "densenet169": ((6, 12, 32, 32), 32, 64),
    "densenet201": ((6, 12, 48, 32), 32, 64),
}


class TorchDenseNetEncoder(nn.Module):
    """torchvision ``densenet121/161/169/201`` ``features`` geometry.
    Pyramid at strides (2, 4, 8, 16, 32): stem (conv0+norm0+relu), each
    transition's norm+relu output (pre 1x1-conv/pool), and norm5+relu —
    channels (64, 256, 512, 1024, 1024) for densenet121, matching smp's
    DenseNetEncoder cut."""

    variant: str = "densenet121"
    dtype: jnp.dtype = jnp.bfloat16
    norm: str = "none"

    def _n(self, x):
        if self.norm == "none":
            return _Affine()(x)
        return nn.GroupNorm(num_groups=_dn_groups(int(x.shape[-1])),
                            dtype=self.dtype)(x)

    @nn.compact
    def __call__(self, x):
        block_config, growth, num_init = _DENSENET_FORMS[self.variant]
        feats = []
        x = nn.Conv(num_init, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, dtype=self.dtype)(x)       # conv0
        x = nn.relu(self._n(x))                                # norm0
        feats.append(x)                                        # stride 2
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, n in enumerate(block_config):
            for _ in range(n):
                x = TorchDenseLayer(growth, dtype=self.dtype,
                                    norm=self.norm)(x)
            x = nn.relu(self._n(x))        # transition norm / final norm5
            feats.append(x)                # strides 4, 8, 16, 32
            if i < len(block_config) - 1:
                x = nn.Conv(int(x.shape[-1]) // 2, (1, 1), use_bias=False,
                            dtype=self.dtype)(x)               # transition conv
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return feats


def _dn_groups(c: int) -> int:
    from .layers import _num_groups
    return _num_groups(c)


# torchvision VGG cfgs: convs per stage; stage channels are fixed at
# (64, 128, 256, 512, 512) with a 2x2 maxpool between stages.
_VGG_CFGS = {
    "vgg11": (1, 1, 2, 2, 2),
    "vgg13": (2, 2, 2, 2, 2),
    "vgg16": (2, 2, 3, 3, 3),
    "vgg19": (2, 2, 4, 4, 4),
}
_VGG_CHANNELS = (64, 128, 256, 512, 512)


class TorchVGGEncoder(nn.Module):
    """torchvision ``vgg11/13/16/19`` ``features`` geometry (plain or _bn —
    both fold to the same biased-conv function with norm="none").

    Pyramid at strides (2, 4, 8, 16, 32): stage-2..5 conv outputs plus the
    final maxpool (torchvision's features end with the 5th pool, so the
    stride-32 feature is the pooled stage-5 output, channels 512).  The
    stride-1 stage-1 convs still run — their weights shape what stage 2
    sees — but full-res 3x3x64 convs are lane-starved on the MXU, so VGG
    is the slowest family on TPU by design; prefer the resnet/efficientnet
    ladders when speed matters."""

    variant: str = "vgg16"
    dtype: jnp.dtype = jnp.bfloat16
    norm: str = "group"

    @nn.compact
    def __call__(self, x):
        feats = []
        for stage, (reps, c) in enumerate(
                zip(_VGG_CFGS[self.variant], _VGG_CHANNELS)):
            if stage > 0:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for _ in range(reps):
                x = ConvNormAct(c, dtype=self.dtype, norm=self.norm)(x)
            if stage > 0:
                feats.append(x)               # strides 2, 4, 8, 16
        feats.append(nn.max_pool(x, (2, 2), strides=(2, 2)))  # stride 32
        return feats


# Selectable encoder family.  The reference exposes smp's ~700 encoder names
# (app.py:182); SURVEY §7.6 scopes parity to the CAPABILITY — a selectable
# architecture/encoder size ladder — implemented as this native family
# (s/m/l CNN ladders, ResNet/ResNeXt/wide, VGG, MobileNetV2,
# EfficientNet-lite sizes, MiT b0-b5).  This is a deliberate scope cut,
# documented in README/ARCHITECTURE.
ENCODER_BUILDERS = {
    "cnn_s": lambda dtype: CNNEncoder(widths=(16, 32, 64, 128, 256), dtype=dtype),
    "cnn_m": lambda dtype: CNNEncoder(widths=(32, 64, 128, 256, 512), dtype=dtype),
    "cnn_l": lambda dtype: CNNEncoder(widths=(64, 128, 256, 512, 1024), dtype=dtype),
    "resnet18": lambda dtype: ResNetEncoder(blocks=2, dtype=dtype),
    "resnet34": lambda dtype: ResNetEncoder(blocks=3, dtype=dtype),
    "resnet50": lambda dtype: TorchResNetEncoder(
        layers=(3, 4, 6, 3), block="bottleneck", norm="group", dtype=dtype),
    "resnet101": lambda dtype: TorchResNetEncoder(
        layers=(3, 4, 23, 3), block="bottleneck", norm="group", dtype=dtype),
    "resnet152": lambda dtype: TorchResNetEncoder(
        layers=(3, 8, 36, 3), block="bottleneck", norm="group", dtype=dtype),
    "resnext50_32x4d": lambda dtype: TorchResNetEncoder(
        layers=(3, 4, 6, 3), block="bottleneck", groups=32, base_width=4,
        norm="group", dtype=dtype),
    "resnext101_32x8d": lambda dtype: TorchResNetEncoder(
        layers=(3, 4, 23, 3), block="bottleneck", groups=32, base_width=8,
        norm="group", dtype=dtype),
    "wide_resnet50_2": lambda dtype: TorchResNetEncoder(
        layers=(3, 4, 6, 3), block="bottleneck", base_width=128,
        norm="group", dtype=dtype),
    # smp's senet family (pretrainedmodels senet.py): bottlenecks with an
    # SEModule (reduction 16, ReLU fc1) on the residual branch.  Fresh-init
    # only — no name-mapped importer (weights need egress; see MIGRATION.md)
    "se_resnet50": lambda dtype: TorchResNetEncoder(
        layers=(3, 4, 6, 3), block="bottleneck", se_reduction=16,
        norm="group", dtype=dtype),
    "se_resnet101": lambda dtype: TorchResNetEncoder(
        layers=(3, 4, 23, 3), block="bottleneck", se_reduction=16,
        norm="group", dtype=dtype),
    "se_resnet152": lambda dtype: TorchResNetEncoder(
        layers=(3, 8, 36, 3), block="bottleneck", se_reduction=16,
        norm="group", dtype=dtype),
    "se_resnext50_32x4d": lambda dtype: TorchResNetEncoder(
        layers=(3, 4, 6, 3), block="bottleneck", groups=32, base_width=4,
        se_reduction=16, norm="group", dtype=dtype),
    "se_resnext101_32x4d": lambda dtype: TorchResNetEncoder(
        layers=(3, 4, 23, 3), block="bottleneck", groups=32, base_width=4,
        se_reduction=16, norm="group", dtype=dtype),
    "vgg11": lambda dtype: TorchVGGEncoder(variant="vgg11", dtype=dtype),
    "vgg13": lambda dtype: TorchVGGEncoder(variant="vgg13", dtype=dtype),
    "vgg16": lambda dtype: TorchVGGEncoder(variant="vgg16", dtype=dtype),
    "vgg19": lambda dtype: TorchVGGEncoder(variant="vgg19", dtype=dtype),
    "densenet121": lambda dtype: TorchDenseNetEncoder(
        variant="densenet121", norm="group", dtype=dtype),
    "densenet161": lambda dtype: TorchDenseNetEncoder(
        variant="densenet161", norm="group", dtype=dtype),
    "densenet169": lambda dtype: TorchDenseNetEncoder(
        variant="densenet169", norm="group", dtype=dtype),
    "densenet201": lambda dtype: TorchDenseNetEncoder(
        variant="densenet201", norm="group", dtype=dtype),
    "mobilenet_v2": lambda dtype: MobileNetV2Encoder(dtype=dtype),
    "mobilenet_v3_large": lambda dtype: TorchMobileNetV3Encoder(
        variant="mobilenet_v3_large", norm="group", dtype=dtype),
    "mobilenet_v3_small": lambda dtype: TorchMobileNetV3Encoder(
        variant="mobilenet_v3_small", norm="group", dtype=dtype),
    "efficientnet_b0": lambda dtype: TorchEfficientNetEncoder(
        variant="efficientnet_b0", norm="group", dtype=dtype),
    "efficientnet_b1": lambda dtype: TorchEfficientNetEncoder(
        variant="efficientnet_b1", norm="group", dtype=dtype),
    "efficientnet_b2": lambda dtype: TorchEfficientNetEncoder(
        variant="efficientnet_b2", norm="group", dtype=dtype),
    "efficientnet_b3": lambda dtype: TorchEfficientNetEncoder(
        variant="efficientnet_b3", norm="group", dtype=dtype),
    "efficientnet_b4": lambda dtype: TorchEfficientNetEncoder(
        variant="efficientnet_b4", norm="group", dtype=dtype),
    "efficientnet_b5": lambda dtype: TorchEfficientNetEncoder(
        variant="efficientnet_b5", norm="group", dtype=dtype),
    "efficientnet_b6": lambda dtype: TorchEfficientNetEncoder(
        variant="efficientnet_b6", norm="group", dtype=dtype),
    "efficientnet_b7": lambda dtype: TorchEfficientNetEncoder(
        variant="efficientnet_b7", norm="group", dtype=dtype),
    "efficientnet_lite0": lambda dtype: EfficientNetLiteEncoder(dtype=dtype),
    "efficientnet_lite1": lambda dtype: EfficientNetLiteEncoder(
        width_mult=1.1, dtype=dtype),
    "efficientnet_lite2": lambda dtype: EfficientNetLiteEncoder(
        width_mult=1.2, dtype=dtype),
    # aliases for reference encoder names so saved configs keep working
    "resnet": lambda dtype: ResNetEncoder(blocks=2, dtype=dtype),
    "timm-tf_efficientnet_lite0": lambda dtype: EfficientNetLiteEncoder(dtype=dtype),
    # smp's _bn vgg names: identical geometry here (fresh init normalizes
    # with GroupNorm either way; pretrained import folds the BN away)
    "vgg11_bn": lambda dtype: TorchVGGEncoder(variant="vgg11", dtype=dtype),
    "vgg13_bn": lambda dtype: TorchVGGEncoder(variant="vgg13", dtype=dtype),
    "vgg16_bn": lambda dtype: TorchVGGEncoder(variant="vgg16", dtype=dtype),
    "vgg19_bn": lambda dtype: TorchVGGEncoder(variant="vgg19", dtype=dtype),
}
