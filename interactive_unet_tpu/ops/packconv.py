"""Phase-packed (space-to-depth) convolutions — the MXU-shaped conv path.

Why (VERDICT r1 #1 / r2 #1; docs/ROADMAP.md #3): the segmentation workload's
FLOPs live in 3x3 convs at large spatial extent with NARROW channels (the
512^2 U-Net's first stages run C=32..64 — reference trainer.py:56-63 /
predict.py:79-112 workloads).  The TPU lays tensors out in (8 sublanes x
128 lanes) tiles over (spatial, channel): C=32 wastes 3/4 of every lane, and
measured conv throughput lands below 8% of MXU peak in every plain XLA
layout (NHWC/NCHW/spatial tiling — round-2 probes).

The fix implemented here: express a 3x3 stride-1 conv as a single 4x4
STRIDE-2 conv whose output is the space-to-depth packing of the original
output.  For output phase (pi, pj) in {0,1}^2, the original 3x3 window
around pixel (2u+pi, 2v+pj) sits inside the 4x4 window spanning original
rows 2u-1..2u+2 — so one dense kernel

    W4[r, s, ci, co*4 + 2*pi+pj] = w3[r-pi, s-pj, ci, co]   (0 <= r-pi <= 2)

computes all four phases at once.  The conv then has N = 4*C_out output
lanes (>= 128 for C_out >= 32) and K = 16*C_in contraction depth —
MXU-shaped — at 16/9 the raw FLOPs (the structural zeros), a trade that
measures 1.5-2.2x faster end-to-end on the narrow stages and neutral on
wide ones (see docs/PERFORMANCE.md round-3 microbench).

Stride-2 convs pack the same way with a 5x5 stride-4 kernel
(W5[r,s,..] = w3[r-2*pi, s-2*pj, ..], padding (1,0)) at 25/36 the
embedded-FLOP overhead.

Packed layout is CHANNEL-MAJOR: packed channel index = c*4 + 2*pi + pj.
That keeps each original channel's four phases adjacent, so GroupNorm
statistics and per-channel affines apply to packed tensors by repeating the
(C,)-shaped parameters 4x — numerically identical to normalizing the
unpacked tensor (the reduction set is the same pixels).

Everything here is pure XLA (conv_general_dilated + reshapes), fully
differentiable, and exact up to float reassociation vs the plain conv.
A fused Pallas im2col variant of the packed conv was built and validated
bit-exact standalone on hardware, but any pallas_call embedded in a larger
jitted program kernel-faults this image's tunnel runtime (reproduced across
rounds 3-4, including with optimization_barrier'd operands refuting the
operand-layout hypothesis), and XLA's own lowering of the embedded conv
already matches the kernel's schedule — so the kernel was removed
(docs/PERFORMANCE.md "Pallas postmortem") and XLA is the only path.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def space_to_depth(x: jax.Array) -> jax.Array:
    """(N, H, W, C) -> (N, H/2, W/2, 4C), channel-major phase packing."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)          # (N, H/2, W/2, C, 2, 2)
    return x.reshape(n, h // 2, w // 2, 4 * c)


def depth_to_space(x: jax.Array) -> jax.Array:
    """(N, H/2, W/2, 4C) channel-major packed -> (N, H, W, C)."""
    n, hh, ww, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, hh, ww, c, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)          # (N, H/2, 2, W/2, 2, C)
    return x.reshape(n, hh * 2, ww * 2, c)


def _phase_embedding(taps: int, stride: int) -> np.ndarray:
    """E[r, p, d] = 1 where window row r holds tap d of output phase p."""
    rows = taps + stride * 1  # 3 taps + offsets {0, stride}
    E = np.zeros((rows, 2, taps), np.float32)
    for p in range(2):
        for d in range(taps):
            E[stride * p + d, p, d] = 1.0
    return E


def embed_kernel(w3: jax.Array, stride: int = 1) -> jax.Array:
    """(3,3,Cin,Cout) kernel -> phase-embedded kernel producing PACKED output.

    stride 1 -> (4,4,Cin,4*Cout) for a stride-2 conv over the unpacked input;
    stride 2 -> (5,5,Cin,4*Cout) for a stride-4 conv.  Output channel
    ordering is channel-major (co*4 + 2*pi + pj)."""
    k = w3.shape[0]
    assert w3.shape[0] == w3.shape[1] == 3, "3x3 kernels only"
    E = jnp.asarray(_phase_embedding(k, stride), w3.dtype)
    # W[r,s,ci,co,pi,pj] = E[r,pi,di] E[s,pj,dj] w3[di,dj,ci,co]
    w = jnp.einsum("rpd,sqe,deio->rsiopq", E, E, w3)
    rows = E.shape[0]
    cin, cout = w3.shape[2], w3.shape[3]
    return w.reshape(rows, rows, cin, 4 * cout)


def packed_conv3x3(x: jax.Array, w3: jax.Array, stride: int = 1,
                   preferred_element_type=None) -> jax.Array:
    """3x3 conv with SAME padding over the UNPACKED input; returns the
    space-to-depth-packed output (N, H/(2*stride), W/(2*stride), 4*Cout).

    Equivalent (up to float reassociation) to
    ``space_to_depth(conv3x3(x, w3, stride))``."""
    w = embed_kernel(w3, stride)
    if stride == 1:
        pad = ((1, 1), (1, 1))
        strides = (2, 2)
    elif stride == 2:
        pad = ((1, 0), (1, 0))
        strides = (4, 4)
    else:
        raise ValueError(f"unsupported stride {stride}")
    return jax.lax.conv_general_dilated(
        x, w, strides, pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred_element_type)


def _packed_phase_embedding(stride: int) -> np.ndarray:
    """E[r, q, p, d] = 1 where packed-row tap r, input phase q contribute
    original kernel tap d to output phase p.

    Derivation: output unpacked row ``o = stride*(2t+p) + d - 1`` must equal
    ``2*(stride*t + r... )`` — solving for the packed input row offset r and
    input phase q gives ``d = 2*r + q - stride*p + 1`` with d in {0,1,2} and
    r in {-1,0,1} (stored at index r+1)."""
    E = np.zeros((3, 2, 2, 3), np.float32)
    for r in (-1, 0, 1):
        for q in range(2):
            for p in range(2):
                d = 2 * r + q - stride * p + 1
                if 0 <= d <= 2:
                    E[r + 1, q, p, d] = 1.0
    return E


def embed_kernel_packed(w3: jax.Array, stride: int = 1) -> jax.Array:
    """(3,3,Cin,Cout) kernel -> (3,3,4*Cin,4*Cout) kernel over the PACKED
    domain: a stride-``stride`` SAME conv of this kernel over a channel-major
    packed tensor equals the packed original conv's packed output.  Density
    is 25% (each original tap appears once per output phase)."""
    assert w3.shape[0] == w3.shape[1] == 3, "3x3 kernels only"
    E = jnp.asarray(_packed_phase_embedding(stride), w3.dtype)
    # Wp[r,s, ci,qi,qj, co,pi,pj] = E[r,qi,pi,di] E[s,qj,pj,dj] w3[di,dj,ci,co]
    w = jnp.einsum("rapd,sbqe,deio->rsiabopq", E, E, w3)
    cin, cout = w3.shape[2], w3.shape[3]
    # (r,s,ci,qi,qj,co,pi,pj) -> channel-major packed channels
    return w.reshape(3, 3, 4 * cin, 4 * cout)


def packed_conv3x3_packed_input(xp: jax.Array, w3: jax.Array, stride: int = 1,
                                preferred_element_type=None) -> jax.Array:
    """3x3 conv whose INPUT is already channel-major packed
    (N, H/2, W/2, 4*Cin); returns the packed output — equivalent (up to
    float reassociation) to ``packed_conv3x3(depth_to_space(xp), w3, stride)``
    without materializing the unpacked tensor.  Contraction depth is
    9*4*Cin with 25% structural density (4x the original conv's FLOPs vs
    16/9 for the unpacked-input form) — the trade is eliminating the
    depth_to_space/repack transpose pair between back-to-back packed convs."""
    if stride not in (1, 2):
        raise ValueError(f"unsupported stride {stride}")
    w = embed_kernel_packed(w3, stride)
    return jax.lax.conv_general_dilated(
        xp, w, (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred_element_type)


def phase_max_pool(xp: jax.Array) -> jax.Array:
    """2x2/stride-2 max pool CONSUMING a packed tensor: (N, h, w, 4C)
    channel-major packed -> (N, h, w, C) unpacked at the pooled resolution.
    Each packed channel's four phase lanes ARE the 2x2 pooling window, so
    the pool is a lane-wise max — no unpack, no window shuffle.  Equals
    ``nn.max_pool(depth_to_space(xp), (2, 2), strides=(2, 2))``."""
    n, hh, ww, c4 = xp.shape
    return jnp.max(xp.reshape(n, hh, ww, c4 // 4, 4), axis=-1)


def repeat_channels(v: jax.Array) -> jax.Array:
    """(C,)-shaped per-channel parameter -> (4C,) for packed tensors
    (channel-major: each channel's 4 phases are adjacent)."""
    return jnp.repeat(v, 4, axis=0)


def packable(h: int, w: int, kernel: int, stride: int, groups: int,
             dilation: int) -> bool:
    """Shapes/configs the packed path supports; everything else falls back
    to the plain conv (same function either way)."""
    if kernel != 3 or groups != 1 or dilation != 1:
        return False
    if stride == 1:
        return h % 2 == 0 and w % 2 == 0 and h >= 4 and w >= 4
    if stride == 2:
        return h % 4 == 0 and w % 4 == 0 and h >= 8 and w >= 8
    return False


def packed_group_norm(xp: jax.Array, num_groups: int, scale: jax.Array,
                      bias: jax.Array, eps: float = 1e-6,
                      dtype=None) -> jax.Array:
    """GroupNorm over a channel-major PACKED tensor (N, H/2, W/2, 4C) —
    numerically the same statistics as flax nn.GroupNorm on the unpacked
    (N, H, W, C) tensor: each group's reduction set is identical pixels,
    just laid out as 4 phase-columns per channel."""
    n, hh, ww, c4 = xp.shape
    c = c4 // 4
    gs = c // num_groups
    x32 = xp.astype(jnp.float32).reshape(n, hh, ww, num_groups, gs * 4)
    mean = jnp.mean(x32, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2, 4), keepdims=True)
    x32 = (x32 - mean) * jax.lax.rsqrt(var + eps)
    x32 = x32.reshape(n, hh, ww, c4)
    out = x32 * repeat_channels(scale.astype(jnp.float32)) \
        + repeat_channels(bias.astype(jnp.float32))
    return out.astype(dtype or xp.dtype)
