"""Shared building blocks for the segmentation zoo (NHWC, bf16-friendly).

3x3 convs route through the phase-packed (space-to-depth) formulation by
default on every backend (ops/packconv.py): the conv computes the packed
output directly with 4*C_out lanes — MXU-shaped even at the narrow early
stages — then normalization/activation run packed and the block unpacks.
Parameters stay in the canonical nn.Conv/nn.GroupNorm shapes and scope
names, so checkpoints are layout-independent.  Disable with
IUNET_PACKED_CONV=0 (plain nn.Conv path, same function).
"""

from __future__ import annotations

import contextlib
import os

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import packconv


def packed_conv_enabled() -> bool:
    """Default: packed on accelerators, plain on CPU.  XLA:CPU lowers the
    phase-embedded strided conv ~10x slower than its native conv path
    (measured 870 vs 76 ms for a 128^2 forward), while TPU is where the
    lane-packing wins 1.5-2x.  Both paths compute the same function, so the
    choice is pure performance; force with IUNET_PACKED_CONV=1/0."""
    env = os.environ.get("IUNET_PACKED_CONV")
    if env is not None:
        return env != "0"
    import jax

    return jax.default_backend() != "cpu"


class _CanonicalConv3x3(nn.Module):
    """Phase-packed 3x3 conv holding the CANONICAL (3,3,Cin,Cout) kernel —
    instantiated with name="Conv_0" so the param tree is identical to the
    nn.Conv it replaces (checkpoints trained on either path interchange).
    Returns the channel-major PACKED output (N, H/2s, W/2s, 4*Cout).

    With ``packed_in`` the input is ALREADY packed (N, H/2, W/2, 4*Cin) and
    the conv runs over the packed domain (ops/packconv.py stay-packed
    formulation) — no unpack/repack transpose pair between back-to-back
    packed convs."""

    features: int
    stride: int = 1
    use_bias: bool = False
    packed_in: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1] // 4 if self.packed_in else x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features), jnp.float32)
        # no explicit accumulator dtype: matches nn.Conv(dtype=...) exactly
        # (XLA still accumulates bf16 MXU convs in f32 internally), and the
        # conv stays cleanly transposable under autodiff
        if self.packed_in:
            y = packconv.packed_conv3x3_packed_input(
                x.astype(self.dtype), kernel.astype(self.dtype), self.stride)
        else:
            y = packconv.packed_conv3x3(
                x.astype(self.dtype), kernel.astype(self.dtype), self.stride)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + packconv.repeat_channels(bias)
        return y.astype(self.dtype)


class _PackedGroupNorm(nn.Module):
    """GroupNorm over a channel-major packed tensor; params are the
    canonical (C,)-shaped scale/bias (instantiated with name="GroupNorm_0"
    for checkpoint compatibility with nn.GroupNorm)."""

    num_groups: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, xp):
        c = xp.shape[-1] // 4
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return packconv.packed_group_norm(xp, self.num_groups, scale, bias,
                                          dtype=self.dtype)


def _activation(x, name: str):
    if name == "relu6":
        return jax.nn.relu6(x)
    if name == "silu":
        return jax.nn.silu(x)
    if name == "hardswish":
        return jax.nn.hard_swish(x)
    return nn.relu(x)


class ConvNormAct(nn.Module):
    """Conv + normalization + activation.

    ``norm="none"`` yields a biased conv with no normalization — the
    inference form of a BatchNorm'd torch block after BN folding, which is
    what pretrained-weight import produces (utils/torch_import.py).
    Padding is explicit symmetric (torch Conv2d convention) so stride-2
    convs align window-for-window with torch originals.

    Plain 3x3 convs (groups=1, dilation=1, stride 1/2, even spatial dims)
    take the phase-packed path (module docstring); all other configurations
    use nn.Conv.  Both compute the same function.

    ``packed_in``/``packed_out`` exchange CHANNEL-MAJOR PACKED tensors
    (N, H/2, W/2, 4C) with the caller so back-to-back convs in a
    double-conv pair skip the unpack/repack transpose pair entirely
    (see ``pair_handoff``).  The flags are a pure layout contract — every
    backend path honors them (the plain path inserts the transposes), the
    param tree is unchanged, and the function computed is identical.  The
    stay-packed conv itself (4x structural FLOPs, zero transposes) is only
    profitable on narrow stages; above ``_STAYPACKED_MAX_CIN`` input
    channels the layer unpacks and uses the embedded-kernel form instead
    (same-window TPU sweep, docs/PERFORMANCE.md round-3).
    """

    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    act: bool = True
    groups: int = 1
    norm: str = "group"          # "group" | "none"
    act_name: str = "relu"       # "relu" | "relu6" | "silu" | "hardswish"
    packed_in: bool = False
    packed_out: bool = False

    @nn.compact
    def __call__(self, x):
        if self.packed_in:
            h, w = 2 * int(x.shape[1]), 2 * int(x.shape[2])
            cin = int(x.shape[-1]) // 4
        else:
            h, w = int(x.shape[1]), int(x.shape[2])
            cin = int(x.shape[-1])
        if (packed_conv_enabled()
                and packconv.packable(h, w, self.kernel, self.stride,
                                      self.groups, self.dilation)):
            stay = (self.packed_in and self.stride == 1
                    and cin <= _staypacked_max_cin())
            if self.packed_in and not stay:
                x = packconv.depth_to_space(x)
            y = _CanonicalConv3x3(self.features, stride=self.stride,
                                  use_bias=(self.norm == "none"),
                                  packed_in=stay,
                                  dtype=self.dtype, name="Conv_0")(x)
            if self.norm == "group":
                y = _PackedGroupNorm(_num_groups(self.features),
                                     dtype=self.dtype,
                                     name="GroupNorm_0")(y)
            if self.act:
                y = _activation(y, self.act_name)
            return y if self.packed_out else packconv.depth_to_space(y)

        if self.packed_in:
            x = packconv.depth_to_space(x)
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
            x = _activation(x, self.act_name)
        return packconv.space_to_depth(x) if self.packed_out else x


_STAYPACKED_SCOPE: list = []


@contextlib.contextmanager
def staypacked_scope(cin_max: int = 32):
    """Enable the stay-packed packed-domain conv while TRACING a
    forward-only program (inference/predict paths).  Must wrap the
    ``model.apply`` call INSIDE the jitted function body — that Python runs
    at trace time, which is when the cutoff is consulted.

    Forward-only, stay-packed wins 1.14x on the flagship 512^2 forward;
    under autodiff it LOSES 0.87x because the kernel-gradient of the
    packed-domain kernel costs 16x the plain formulation's FLOPs
    (scripts/ab_train_staypacked.py, same-window interleaved) — hence
    opt-in per trace instead of a global default."""
    _STAYPACKED_SCOPE.append(cin_max)
    try:
        yield
    finally:
        _STAYPACKED_SCOPE.pop()


def _staypacked_max_cin() -> int:
    """Width cutoff for the stay-packed (packed-domain) conv: measured
    faster at Cin<=32 (2.4x at C=16/512^2, 1.4x at C=32/256^2) and slower
    from Cin=64 up, where its 4x structural FLOPs outweigh the saved
    transposes (scripts/ab_staypacked.py, same-window interleaved).
    Default 0 (off): training traces must not take it (see
    ``staypacked_scope``); IUNET_STAYPACKED_MAX_CIN overrides everything
    (A/B scripts)."""
    env = os.environ.get("IUNET_STAYPACKED_MAX_CIN")
    if env is not None:
        return int(env)
    return _STAYPACKED_SCOPE[-1] if _STAYPACKED_SCOPE else 0


def pair_handoff(x, stride: int = 1) -> bool:
    """True when a double-conv pair starting from (unpacked) ``x`` should
    exchange packed tensors: conv1(packed_out=True) -> conv2(packed_in=True).
    Trace-time shape check only — callers gate BOTH flags on this so odd
    spatial sizes and CPU runs keep today's exact graphs."""
    h, w = int(x.shape[1]), int(x.shape[2])
    return (packed_conv_enabled()
            and packconv.packable(h, w, 3, stride, 1, 1)
            and packconv.packable(h // stride, w // stride, 3, 1, 1, 1))


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
    kernel: int = 3
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
        h = ConvNormAct(mid, kernel=self.kernel, stride=self.stride,
                        groups=mid,
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
