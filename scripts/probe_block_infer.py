"""TPU smoke + timing probe for the 2.5D block predictor after conv-layout
changes: compiles the jitted block fn (stay-packed engages inside its trace
via staypacked_scope) and reports min-of-rounds per-block time.

Usage: python scripts/probe_block_infer.py [S [rounds]]
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
R = int(sys.argv[2]) if len(sys.argv) > 2 else 5

model = build_model(architecture="U-Net", encoder_name="cnn_m",
                    num_channels=1, num_classes=2)
params = model.init(jax.random.key(0),
                    np.zeros((1, S, S, 1), np.float32))
fn, bs = make_block_predictor(model, params, S, 2)
print(f"batch_size={bs} S={S} backend={jax.default_backend()}")

block = (np.random.RandomState(0).rand(S, S, S) * 255).astype(np.uint8)
t0 = time.perf_counter()
out = np.asarray(fn(block))
print(f"compile+first: {time.perf_counter()-t0:.1f} s, out {out.shape} "
      f"sum={float(out.sum()):.3e}")

ts = []
for _ in range(R):
    t0 = time.perf_counter()
    np.asarray(fn(block))
    ts.append(time.perf_counter() - t0)
print("per-block  min %.3f s  all %s"
      % (min(ts), " ".join(f"{t:.3f}" for t in ts)))
