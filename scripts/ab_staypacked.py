"""Same-window interleaved A/B: stay-packed conv chain vs unpack/repack.

The only trustworthy comparison on the time-shared tunnel TPU is
alternating the compiled programs inside one session (docs/BENCH_ROUND2_NOTES).

Pattern under test — the "middle conv" of a double-conv stage whose input
is already packed (N, H/2, W/2, 4C):
  A (current): depth_to_space -> packed_conv3x3 (4x4/stride-2 embedded)
  B (stay-packed): packed_conv3x3_packed_input (3x3 over packed domain)
  C (reference): depth_to_space -> plain 3x3 conv -> space_to_depth

Also: phase-max pool (packed lane max) vs depth_to_space + nn.max_pool.

Usage: python scripts/ab_staypacked.py [H C [batch]]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import interactive_unet_tpu.jaxsetup  # noqa: F401  (compile cache etc.)
import jax
import jax.numpy as jnp
from flax import linen as nn

from interactive_unet_tpu.ops import packconv as pc

H = int(sys.argv[1]) if len(sys.argv) > 1 else 256
C = int(sys.argv[2]) if len(sys.argv) > 2 else 32
B = int(sys.argv[3]) if len(sys.argv) > 3 else 4

rng = np.random.RandomState(0)
xp = jnp.asarray(rng.randn(B, H // 2, H // 2, 4 * C).astype(np.float32),
                 dtype=jnp.bfloat16)
w3 = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.1,
                 dtype=jnp.bfloat16)


@jax.jit
def path_a(xp, w3):                      # unpack + embedded repack conv
    x = pc.depth_to_space(xp)
    return pc.packed_conv3x3(x, w3)


@jax.jit
def path_b(xp, w3):                      # stay packed
    return pc.packed_conv3x3_packed_input(xp, w3)


@jax.jit
def path_c(xp, w3):                      # plain conv round trip
    x = pc.depth_to_space(xp)
    y = jax.lax.conv_general_dilated(
        x, w3, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return pc.space_to_depth(y)


@jax.jit
def pool_a(xp):                          # unpack + spatial max pool
    x = pc.depth_to_space(xp)
    return nn.max_pool(x, (2, 2), strides=(2, 2))


@jax.jit
def pool_b(xp):                          # phase-max over packed lanes
    n, hh, ww, c4 = xp.shape
    return jnp.max(xp.reshape(n, hh, ww, c4 // 4, 4), axis=-1)


LOOP = 100


def scanned(op):
    """Wrap op so ONE dispatch executes it LOOP times (isolates device
    compute from the tunnel's per-dispatch overhead).  The op must be
    shape-preserving modulo the packed layout; we feed its own input back
    via a dummy mix so XLA can't hoist it out of the loop."""
    @jax.jit
    def run(x, w):
        def body(c, _):
            y = op(c, w)
            # mix output back to input shape+scale so the loop can't fold
            c2 = c * 0.999 + jnp.mean(y).astype(c.dtype) * 1e-6
            return c2, ()
        out, _ = jax.lax.scan(body, x, None, length=LOOP)
        return out
    return run


def scanned1(op):
    @jax.jit
    def run(x):
        def body(c, _):
            y = op(c)
            c2 = c * 0.999 + jnp.mean(y).astype(c.dtype) * 1e-6
            return c2, ()
        out, _ = jax.lax.scan(body, x, None, length=LOOP)
        return out
    return run


def sync(y):
    np.asarray(jax.tree_util.tree_leaves(y)[0][..., :1])


def timed(fn, *args, chain=1):
    t0 = time.perf_counter()
    y = None
    for _ in range(chain):
        y = fn(*args)
    sync(y)
    return (time.perf_counter() - t0) / (chain * LOOP)


paths = {"A:unpack+embed": (scanned(path_a), (xp, w3)),
         "B:stay-packed": (scanned(path_b), (xp, w3)),
         "C:plain-roundtrip": (scanned(path_c), (xp, w3)),
         "poolA:unpack+maxpool": (scanned1(pool_a), (xp,)),
         "poolB:phase-max": (scanned1(pool_b), (xp,))}

# numerics check first
ya = np.asarray(path_a(xp, w3), np.float32)
yb = np.asarray(path_b(xp, w3), np.float32)
print("conv maxerr A-vs-B:", float(np.max(np.abs(ya - yb))))
pa = np.asarray(pool_a(xp), np.float32)
pb = np.asarray(pool_b(xp), np.float32)
print("pool maxerr:", float(np.max(np.abs(pa - pb))))

for name, (fn, args) in paths.items():
    timed(fn, *args, chain=2)            # warm/compile
print(f"shapes: xp={tuple(xp.shape)} w3={tuple(w3.shape)}")

results = {k: [] for k in paths}
for rnd in range(5):                      # interleave rounds
    for name, (fn, args) in paths.items():
        results[name].append(timed(fn, *args))
for name, ts in results.items():
    print(f"{name:22s} min {min(ts)*1e3:7.3f} ms  all "
          + " ".join(f"{t*1e3:.2f}" for t in ts))
