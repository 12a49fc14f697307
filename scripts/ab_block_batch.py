"""Interleaved A/B: 2.5D block-predictor wall time vs slice batch size.

The tunnel device's capacity swings ~10x between windows, so absolute
timings are meaningless across runs; this sweeps batch sizes ROUND-ROBIN
inside one session (min over interleaved rounds per size), which holds the
window constant across the comparison.  Informs `_auto_batch_size`
(engine/predict.py): the 256^3-block inference forward is the 512^3
full-volume workload's inner loop (reference predict.py:79-112).

Usage: python scripts/ab_block_batch.py [S [rounds]]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import interactive_unet_tpu.jaxsetup  # noqa: F401
import jax

from interactive_unet_tpu.engine.predict import make_block_predictor
from interactive_unet_tpu.models import build_model

S = int(sys.argv[1]) if len(sys.argv) > 1 else 256
R = int(sys.argv[2]) if len(sys.argv) > 2 else 4
SIZES = [int(s) for s in (sys.argv[3].split(",") if len(sys.argv) > 3
                          else ["8", "16", "32", "64"])]

model = build_model(architecture="U-Net", encoder_name="cnn_m",
                    num_channels=1, num_classes=2)
params = model.init(jax.random.key(0), np.zeros((1, S, S, 1), np.float32))
block = (np.random.RandomState(0).rand(S, S, S) * 255).astype(np.uint8)

fns = {}
for bs in SIZES:
    fn, got = make_block_predictor(model, params, S, 2, batch_size=bs)
    fns[bs] = fn
    t0 = time.perf_counter()
    np.asarray(fn(block)).ravel()[:1]
    print(f"bs={bs:3d} compile+first {time.perf_counter()-t0:6.1f} s",
          flush=True)

best = {bs: float("inf") for bs in SIZES}
for r in range(R):
    for bs in SIZES:
        t0 = time.perf_counter()
        np.asarray(fns[bs](block)).ravel()[:1]
        dt = time.perf_counter() - t0
        best[bs] = min(best[bs], dt)
        print(f"round {r} bs={bs:3d} {dt:6.3f} s", flush=True)

print("\nmin per-block seconds (interleaved, same window):")
for bs in SIZES:
    print(f"  bs={bs:3d}  {best[bs]:6.3f} s")
