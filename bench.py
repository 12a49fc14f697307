"""Benchmark: oriented-slice sampling throughput (the north-star kernel).

Compares the TPU-native packed single-gather slicer (ops/fastslice.py)
against the reference's CPU path (scipy.ndimage.map_coordinates over a
bounding-box block — reference slicer.py:224-226) on random-orientation
512x512 trilinear slices of a 512^3 volume.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline > 1 means faster than the reference CPU implementation.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from scipy import ndimage

    from interactive_unet_tpu.ops.slicer import Slicer

    N = 512          # volume edge (BASELINE: 512^3 volumes)
    S = 512          # slice width (BASELINE: 512^2 patches)
    REPS = 30        # device reps
    CPU_REPS = 5     # scipy reps (the bbox copy is slow by design)

    rng = np.random.default_rng(0)
    vol = (rng.random((N, N, N)) * 255).astype(np.uint8)
    log(f"volume {vol.shape} uint8, slice {S}x{S}, order=1, platform="
        f"{jax.default_backend()}")

    slicer = Slicer(vol.shape, seed=1)
    coords_list = []
    for _ in range(max(REPS, CPU_REPS)):
        slicer.randomize()
        coords_list.append(
            slicer.get_interpolation_coords(slice_width=S)[0].astype(np.float32))

    # --- baseline: scipy CPU (reference slicer.py:204-226 bbox path) -------
    def scipy_slice(coords):
        lower = np.floor(coords.min(axis=(1, 2))).astype(int)
        upper = np.ceil(coords.max(axis=(1, 2))).astype(int)
        i0, j0, k0 = np.maximum(lower, 0)
        i1, j1, k1 = np.minimum(upper, vol.shape)
        shift = np.array([i0, j0, k0], dtype=float)
        return ndimage.map_coordinates(vol[i0:i1, j0:j1, k0:k1],
                                       coords - shift[:, None, None], order=1)

    scipy_slice(coords_list[0])  # warm cache
    cpu_times = []
    for c in coords_list[:CPU_REPS]:
        t0 = time.perf_counter()
        scipy_slice(c)
        cpu_times.append(time.perf_counter() - t0)
    t_cpu = min(cpu_times)  # min-of-reps on both sides (fair under load)
    log(f"scipy CPU: {t_cpu * 1e3:.2f} ms/slice "
        f"(reps: {[f'{t * 1e3:.1f}' for t in cpu_times]})")

    # --- ours: packed-neighborhood single-gather kernel (ops/fastslice) ----
    from interactive_unet_tpu.ops.fastslice import PackedVolume

    t0 = time.perf_counter()
    pv = PackedVolume(vol)
    log(f"pack_volume: {time.perf_counter() - t0:.1f} s (one-time per volume)")

    slicer2 = Slicer(vol.shape, seed=1)
    frames = []
    for _ in range(REPS):
        slicer2.randomize()
        frames.append((slicer2.v.copy(), slicer2.w.copy(),
                       slicer2.origin.copy(),
                       slicer2.get_interpolation_coords(S)[0]))

    a, b, o, c0 = frames[0]
    log("compiling extract_oriented...")
    t0 = time.perf_counter()
    out = pv.extract_oriented(a, b, o, S, 1)
    got = np.asarray(out)  # compile + d2h parity sample
    log(f"compile+first run: {time.perf_counter() - t0:.1f} s")
    ref = scipy_slice(c0.astype(np.float32)).astype(np.float32)
    err = np.abs(ref - got).max()
    log(f"max abs err vs scipy: {err:.4f}")
    if err > 1.0:
        log("WARNING: parity drift > 1 grey level")

    # Throughput timing: queue a round of dispatches, force completion with a
    # d2h read of the final result (in-order execution covers the round).
    rounds = []
    for _ in range(5):
        t0 = time.perf_counter()
        last = None
        for a, b, o, _c in frames:
            last = pv.extract_oriented(a, b, o, S, 1)
        np.asarray(last).ravel()[:1]
        rounds.append((time.perf_counter() - t0) / REPS)
    # min-of-rounds: the least-interference estimate of kernel throughput
    # (the remote-tunnel runtime adds large, occasional scheduling noise)
    t_dev = min(rounds)
    log(f"device: {t_dev * 1e3:.3f} ms/slice (rounds: "
        f"{[f'{r * 1e3:.3f}' for r in rounds]})")

    slices_per_s = 1.0 / t_dev
    print(json.dumps({
        "metric": "oriented_trilinear_slice_sampling_512",
        "value": round(slices_per_s, 2),
        "unit": "slices/s",
        "vs_baseline": round(t_cpu / t_dev, 2),
    }))


if __name__ == "__main__":
    main()
