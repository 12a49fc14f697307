"""Benchmark: oriented-slice sampling throughput (the north-star kernel).

Compares the TPU-native device resampler (flat-HBM gather, ops/resample.py)
against the reference's CPU path (scipy.ndimage.map_coordinates over a
bounding-box block — reference slicer.py:224-226) on random-orientation
512x512 trilinear slices of a 256^3 volume.

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

    from interactive_unet_tpu.ops import resample
    from interactive_unet_tpu.ops.slicer import Slicer

    N = 256          # volume edge
    S = 512          # slice width
    REPS = 30

    rng = np.random.default_rng(0)
    vol = (rng.random((N, N, N)) * 255).astype(np.uint8)
    log(f"volume {vol.shape} uint8, slice {S}x{S}, order=1, platform="
        f"{jax.default_backend()}")

    slicer = Slicer(vol.shape, seed=1)
    coords_list = []
    for _ in range(REPS):
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
    t0 = time.perf_counter()
    for c in coords_list:
        scipy_slice(c)
    t_cpu = (time.perf_counter() - t0) / REPS
    log(f"scipy CPU: {t_cpu * 1e3:.2f} ms/slice")

    # --- ours: device-resident flat-HBM gather ----------------------------
    flat = vol.astype(np.float32).ravel()
    bucket = resample._pow2_bucket(flat.size)
    if bucket != flat.size:
        flat = np.pad(flat, (0, bucket - flat.size))
    flat_d = jnp.asarray(flat)
    shape_d = jnp.asarray(vol.shape, dtype=jnp.int32)

    out = resample.resample3d_device(flat_d, shape_d,
                                     jnp.asarray(coords_list[0]), 1)
    out.block_until_ready()  # compile

    coords_d = [jnp.asarray(c) for c in coords_list]
    t0 = time.perf_counter()
    outs = [resample.resample3d_device(flat_d, shape_d, c, 1)
            for c in coords_d]
    outs[-1].block_until_ready()
    t_dev = (time.perf_counter() - t0) / REPS
    log(f"device: {t_dev * 1e3:.2f} ms/slice")

    # parity spot-check
    ref = scipy_slice(coords_list[0]).astype(np.float32)
    got = np.asarray(out)
    err = np.abs(ref - got).max()
    log(f"max abs err vs scipy: {err:.4f}")
    if err > 1.0:
        log("WARNING: parity drift > 1 grey level")

    slices_per_s = 1.0 / t_dev
    print(json.dumps({
        "metric": "oriented_trilinear_slice_sampling_512",
        "value": round(slices_per_s, 2),
        "unit": "slices/s",
        "vs_baseline": round(t_cpu / t_dev, 2),
    }))


if __name__ == "__main__":
    main()
