"""Same-window interleaved A/B of the packed-conv schedules on the real TPU:
XLA phase-embedded conv vs the pipelined Pallas kernel (ops/pallas_conv.py).

Interleaved min-of-rounds with a trailing d2h sync per round — the only
trustworthy comparison on the time-shared axon device
(docs/BENCH_ROUND2_NOTES.md).

Usage: python scripts/ab_pallas_db.py [H [CIN [COUT [rounds]]]]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import interactive_unet_tpu.jaxsetup  # noqa: F401
import jax
import jax.numpy as jnp

from interactive_unet_tpu.ops import packconv
from interactive_unet_tpu.ops.pallas_conv import pallas_packed_conv3x3

H = int(sys.argv[1]) if len(sys.argv) > 1 else 512
CIN = int(sys.argv[2]) if len(sys.argv) > 2 else 32
COUT = int(sys.argv[3]) if len(sys.argv) > 3 else 32
R = int(sys.argv[4]) if len(sys.argv) > 4 else 6
REPS = 20   # dispatches per timed round (amortizes tunnel RTT)
# NOTE: timing queues REPS independent dispatches of the single-conv
# program and syncs the last output.  An earlier variant chained the convs
# inside one lax.scan program; that program FAULTED the TPU worker
# (2026-08-17) — scanned Pallas grids are avoided on this runtime.

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(1, H, H, CIN)), jnp.bfloat16)
w = jnp.asarray(rng.normal(size=(3, 3, CIN, COUT)) / (3 * np.sqrt(CIN)),
                jnp.bfloat16)

variants = {
    "xla": jax.jit(lambda x, w: packconv.packed_conv3x3(x, w, 1)),
    "pallas": jax.jit(lambda x, w: pallas_packed_conv3x3(x, w)),
}


def timed_round(fn):
    """Queue REPS dispatches, d2h-sync the last (in-order execution)."""
    t0 = time.perf_counter()
    ys = [fn(x, w) for _ in range(REPS)]
    np.asarray(ys[-1][0, 0, 0, :1])
    return (time.perf_counter() - t0) / REPS

print(f"H={H} CIN={CIN} COUT={COUT} backend={jax.default_backend()} "
      f"reps/round={REPS}")

# numerics gate first (vs XLA reference, single apply)
ref = np.asarray(packconv.packed_conv3x3(x, w, 1), np.float32)
for name, fn in [("pallas", lambda: pallas_packed_conv3x3(x, w))]:
    got = np.asarray(fn(), np.float32)
    err = np.abs(got - ref).max()
    print(f"numerics {name}: max|diff| vs xla = {err:.3e}")
    assert err < 0.25, (name, err)   # bf16 conv reassociation tolerance

for name, fn in variants.items():
    t0 = time.perf_counter()
    np.asarray(fn(x, w)[0, 0, 0, :1])
    print(f"compile {name}: {time.perf_counter() - t0:.1f} s", flush=True)

best = {k: float("inf") for k in variants}
for r in range(R):
    for name, fn in variants.items():   # interleaved within each round
        best[name] = min(best[name], timed_round(fn))
    print(f"round {r}: " + "  ".join(
        f"{k}={best[k] * 1e3:.3f} ms" for k in variants), flush=True)

print("BEST per-conv: " + "  ".join(
    f"{k}={best[k] * 1e3:.3f} ms" for k in variants))
