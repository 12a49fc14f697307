"""Same-window interleaved A/B of the FULL flagship train step:
stay-packed double-conv handoff (IUNET_STAYPACKED_MAX_CIN=32, default)
vs disabled (=0  ->  every ConvNormAct unpacks, round-2 behavior).

Both programs are traced in one process (the env cutoff is read at trace
time), then alternated — the only trustworthy comparison on the
time-shared tunnel TPU (docs/BENCH_ROUND2_NOTES.md).

Usage: python scripts/ab_train_staypacked.py [batch [size [steps]]]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import interactive_unet_tpu.jaxsetup  # noqa: F401
import jax
import jax.numpy as jnp
import optax

from interactive_unet_tpu.models import build_model

MODE = "fwd" if "--fwd" in sys.argv else "train"
sys.argv = [a for a in sys.argv if a != "--fwd"]
B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
S = int(sys.argv[2]) if len(sys.argv) > 2 else 512
LOOP = int(sys.argv[3]) if len(sys.argv) > 3 else 10

rng = np.random.RandomState(0)
x = jnp.asarray(rng.rand(B, S, S, 1).astype(np.float32))
y = jnp.asarray((rng.rand(B, S, S, 2) > 0.5).astype(np.float32))

model = build_model(architecture="U-Net", encoder_name="cnn_m",
                    num_classes=2)
tx = optax.adam(1e-4)


def make_step():
    """The conv layout env var is read at TRACE time (models/layers.py), so
    the program must be traced HERE, while the env is set — jit alone defers
    tracing to the first call.  AOT-lower+compile pins the layout."""
    params = model.init(jax.random.key(0), x[:1])

    def loss_fn(p, xb, yb):
        pred = model.apply(p, xb)
        return jnp.mean(jnp.square(pred - yb))

    @jax.jit
    def run(p, opt, xb, yb):
        def body(carry, _):
            p, opt = carry
            l, g = jax.value_and_grad(loss_fn)(p, xb, yb)
            up, opt = tx.update(g, opt, p)
            return (optax.apply_updates(p, up), opt), l
        (p, opt), ls = jax.lax.scan(body, (p, opt), None, length=LOOP)
        return p, opt, ls

    @jax.jit
    def run_fwd(p, xb):
        def body(c, _):
            pred = model.apply(p, c)
            c2 = c * 0.999 + pred[..., :1] * 1e-6
            return c2.astype(c.dtype), pred[0, 0, 0, 0]
        _, ls = jax.lax.scan(body, xb, None, length=LOOP)
        return ls

    if MODE == "fwd":
        compiled = run_fwd.lower(params, x).compile()
        return params, (lambda p, opt, xb, yb: (None, None,
                                                compiled(p, xb)))
    compiled = run.lower(params, tx.init(params), x, y).compile()
    return params, compiled


os.environ["IUNET_STAYPACKED_MAX_CIN"] = "32"
p_on, step_on = make_step()
os.environ["IUNET_STAYPACKED_MAX_CIN"] = "0"
p_off, step_off = make_step()

opt0 = tx.init(p_on)


def timed(fn, p):
    t0 = time.perf_counter()
    _, _, ls = fn(p, opt0, x, y)
    np.asarray(ls)                      # d2h sync
    return (time.perf_counter() - t0) / LOOP


for name, fn, p in (("on", step_on, p_on), ("off", step_off, p_off)):
    t = timed(fn, p)                     # compile+warm
    print(f"warm {name}: {t*1e3:.1f} ms/step")

res = {"on": [], "off": []}
for rnd in range(6):
    res["on"].append(timed(step_on, p_on))
    res["off"].append(timed(step_off, p_off))
for k, v in res.items():
    print(f"staypacked={k:3s} min {min(v)*1e3:7.2f} ms/step  all "
          + " ".join(f"{t*1e3:.1f}" for t in v))
print(f"speedup: {min(res['off'])/min(res['on']):.3f}x")
