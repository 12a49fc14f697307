"""Benchmark: all four BASELINE metrics, each as ONE JSON line on stdout.

1. oriented_trilinear_slice_sampling_512 — packed single-gather slicer
   (ops/fastslice.py) vs scipy map_coordinates CPU (reference
   slicer.py:204-226), slices/s.  HARD parity gate: uint8 voxel-exact vs
   scipy for orders 0 and 1 (exit 1 on any mismatch).
2. retrain_roundtrip_4x512 — full train_model() click on 4 saved 512^2
   samples, 10 epochs (reference trainer.py:12-63); vs_baseline = 2.0/t
   against the BASELINE.json "<2 s retrain" target.
3. suggestor_per_stroke_512 — steady-state make_suggestions latency on a
   512^2 slice (reference suggestor.py:43-115, 30 AdamW steps);
   vs_baseline = 2.0/t against the same interactivity target.
4. fullvolume_inference_512 — predict_volumes over a real 512^3 zarr volume
   (reference predict.py:114-264); vs_baseline = extrapolated CPU time /
   TPU time, where the CPU reference is the SAME pipeline with the SAME
   27-block/25%-overlap tiling geometry measured on the jax CPU backend
   over a 128^3 volume in a subprocess (min-of-3) and scaled by voxel
   count (BASELINE target >= 10x).  Includes a TPU-vs-CPU Dice parity gate
   on the 128^3 volume (voxel-exact claim; gate Dice >= 0.99).

Conventions: min-of-reps timing on both sides (the tunnel runtime has large
scheduling noise); the jax persistent compilation cache (jaxsetup) is active
so compile costs are once-per-machine, and every metric is measured on its
second call (steady state).

Load-proofing (the TPU is a TIME-SHARED tunnel device whose usable capacity
swings ~10x between windows — docs/BENCH_ROUND2_NOTES.md): every emitted
metric line carries ``device_ceiling_tflops``, a bf16-matmul throughput
probe measured immediately before that metric, so a busy window is visible
in the JSON itself.  When the opening probe reads below
IUNET_BENCH_QUIET_TFLOPS (default 5), the bench waits up to
IUNET_BENCH_WAIT seconds (default 240) re-probing for a quieter window
before proceeding.

Un-droppability (round-3 postmortem: the 30-min quiet-window wait consumed
the driver's entire timeout and ZERO metrics landed — BENCH_r03.json
rc=124): the whole run is governed by one wall-clock deadline
(IUNET_BENCH_DEADLINE seconds from process start, default 1560).  Every
wait loop is bounded by the time remaining, metrics print the moment they
are measured, the CPU-reference subprocess overlaps the TPU metrics, and a
watchdog thread hard-exits 0 at the deadline so whatever has been emitted
is what the driver records.  A busy window is ANNOTATED (per-line ceiling),
never waited out.
"""

import json
import os
import subprocess
import sys
import threading
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

WS = Path(os.environ.get("IUNET_BENCH_WS", "/tmp/iunet_bench"))

_T0 = time.time()
DEADLINE_S = float(os.environ.get("IUNET_BENCH_DEADLINE", "1560"))
_EMITTED: list = []


def time_left() -> float:
    """Seconds until the bench's hard deadline."""
    return DEADLINE_S - (time.time() - _T0)


def start_watchdog():
    """Guarantee the process exits 0 at the deadline with everything
    measured so far already flushed to stdout (each metric prints the
    moment it is measured), no matter what a remote compile or a shared
    device is doing."""
    def _watch():
        while time_left() > 0:
            time.sleep(min(5.0, max(0.5, time_left())))
        log(f"[watchdog] deadline {DEADLINE_S:.0f}s reached; exiting with "
            f"{len(_EMITTED)} metric(s) emitted: {_EMITTED}")
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)

    threading.Thread(target=_watch, daemon=True).start()


def log(msg):
    print(msg, file=sys.stderr, flush=True)


_LAST_CEILING = [None]


def probe_device_ceiling(reps: int = 6, rounds: int = 3) -> float:
    """bf16 2048^2 matmul TFLOP/s, dispatches queued + one trailing d2h so
    tunnel RTT amortizes; min-of-rounds.  Small enough to never stress the
    remote compile service, large enough to exercise the MXU."""
    import jax
    import jax.numpy as jnp

    try:
        a = jnp.asarray(np.random.default_rng(0).standard_normal(
            (2048, 2048)), jnp.bfloat16)
        f = jax.jit(lambda a: (a @ a).astype(jnp.bfloat16))
        np.asarray(f(a)).ravel()[:1]  # compile + load
        best = float("inf")
        for _ in range(rounds):
            t0 = time.perf_counter()
            out = a
            for _ in range(reps):
                out = f(out)
            np.asarray(out).ravel()[:1]
            best = min(best, (time.perf_counter() - t0) / reps)
        tflops = 2 * 2048 ** 3 / best / 1e12
    except Exception as e:  # probe is diagnostic; never kill the bench
        log(f"[ceiling] probe failed: {e!r}")
        tflops = float("nan")
    _LAST_CEILING[0] = round(tflops, 2)
    return tflops


def wait_for_quiet_window(budget=None, reserve=900.0):
    """Block (bounded, SHORT) until the device ceiling probe clears the
    quiet-window threshold.  The wait is capped both by ``budget`` (env
    IUNET_BENCH_WAIT, default 240 s) and by the global deadline minus
    ``reserve`` (the time the remaining metrics still need) — a busy window
    is annotated in every metric line, never waited out (round-3
    postmortem: a 30-min wait here starved the whole bench)."""
    target = float(os.environ.get("IUNET_BENCH_QUIET_TFLOPS", "5"))
    if budget is None:
        budget = float(os.environ.get("IUNET_BENCH_WAIT", "240"))
    budget = min(budget, time_left() - reserve)
    t0 = time.time()
    c = probe_device_ceiling()
    log(f"[ceiling] opening probe: {c:.1f} TFLOP/s (quiet threshold {target},"
        f" wait budget {max(budget, 0):.0f}s)")
    while c < target and time.time() - t0 < budget:
        time.sleep(20)
        c = probe_device_ceiling()
        log(f"[ceiling] re-probe: {c:.1f} TFLOP/s "
            f"({time.time() - t0:.0f}s/{budget:.0f}s waited)")
    return c


def wait_for_backend() -> bool:
    """The tunnel TPU can be unavailable for minutes-to-hours after a
    remote worker crash (observed 2026-08-17: "Unable to initialize
    backend 'axon'" for an extended window).  Probe backend init in
    SUBPROCESSES — in-process jax caches the failure — until it succeeds
    or IUNET_BENCH_DEVICE_WAIT seconds (default 900) lapse; always bounded
    so the device_unavailable flag line lands before the deadline."""
    import subprocess
    budget = float(os.environ.get("IUNET_BENCH_DEVICE_WAIT", "900"))
    budget = min(budget, time_left() - 120)
    t0 = time.time()
    while True:
        try:
            # sitecustomize pins JAX_PLATFORMS=axon; only a config update
            # wins, so mirror the env request explicitly (keeps local
            # JAX_PLATFORMS=cpu bench runs from probing the tunnel)
            code = ("import os, jax\n"
                    "p = os.environ.get('JAX_PLATFORMS')\n"
                    "if p: jax.config.update('jax_platforms', p)\n"
                    "jax.devices()\n")
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, timeout=240)
            if r.returncode == 0:
                return True
            err = (r.stderr or b"").decode(errors="replace").strip()
            err = err.splitlines()[-1] if err else "exit %d" % r.returncode
        except subprocess.TimeoutExpired:
            err = "probe hung >240 s"
        waited = time.time() - t0
        if waited >= budget:
            log(f"[device] backend still unavailable after {waited:.0f}s: "
                f"{err}")
            return False
        log(f"[device] backend unavailable ({waited:.0f}s/{budget:.0f}s "
            f"waited): {err} — retrying in 60 s")
        time.sleep(60)


def emit(metric, value, unit, vs_baseline, **extra):
    """Extra keys (e.g. ``baseline=`` describing what vs_baseline compares
    against) ride along in the JSON line — the driver only reads the four
    standard keys."""
    _EMITTED.append(metric)
    line = {"metric": metric, "value": round(float(value), 3),
            "unit": unit, "vs_baseline": round(float(vs_baseline), 2),
            "device_ceiling_tflops": _LAST_CEILING[0]}
    line.update(extra)
    print(json.dumps(line), flush=True)


# ---------------------------------------------------------------------------
# pinned CPU baselines (VERDICT r4 #6): the live CPU reference twins are
# re-measured every run, so the recorded ratio swung 2.5x-7x purely with
# the CPU's load that minute.  The FIRST run records each CPU baseline into
# BASELINE.json's "pinned" section; later runs emit BOTH ratios —
# vs_baseline (live, same-window, methodology unchanged) and vs_pinned
# (against the recorded constant, comparable across rounds).  Re-record
# with IUNET_BENCH_REPIN=1 in a known-quiet window.
# ---------------------------------------------------------------------------

BASELINE_PATH = REPO / "BASELINE.json"


def _load_pinned() -> dict:
    if os.environ.get("IUNET_BENCH_REPIN") == "1":
        return {}
    try:
        return json.loads(BASELINE_PATH.read_text()).get("pinned", {})
    except Exception:
        return {}


_PINNED = _load_pinned()


def pin_baseline(key: str, live_value: float, unit: str) -> float:
    """Recorded baseline for ``key`` (recording ``live_value`` on first
    use, persisted best-effort into BASELINE.json)."""
    if key not in _PINNED:
        _PINNED[key] = {"value": round(float(live_value), 4), "unit": unit,
                        "recorded": time.strftime("%Y-%m-%dT%H:%M:%S")}
        try:
            doc = json.loads(BASELINE_PATH.read_text())
            doc["pinned"] = _PINNED
            BASELINE_PATH.write_text(json.dumps(doc, indent=2))
            log(f"[pin] recorded baseline {key} = {live_value:.4g} {unit}")
        except Exception as e:  # never fail the bench over bookkeeping
            log(f"[pin] could not persist {key}: {e!r}")
    return float(_PINNED[key]["value"])


# ---------------------------------------------------------------------------
# 1. slice sampling + parity gate
# ---------------------------------------------------------------------------

def bench_slice_sampling():
    from scipy import ndimage

    from interactive_unet_tpu.ops.fastslice import PackedVolume
    from interactive_unet_tpu.ops.slicer import Slicer

    N, S, REPS, CPU_REPS = 512, 512, 30, 5
    rng = np.random.default_rng(0)
    vol = (rng.random((N, N, N)) * 255).astype(np.uint8)
    log(f"[slice] volume {vol.shape} uint8, slice {S}x{S}")

    slicer = Slicer(vol.shape, seed=1)
    frames = []
    for _ in range(REPS):
        slicer.randomize()
        frames.append((slicer.v.copy(), slicer.w.copy(), slicer.origin.copy(),
                       slicer.get_interpolation_coords(S)[0]))

    def scipy_slice(coords, order=1, out_dtype=None):
        lower = np.floor(coords.min(axis=(1, 2))).astype(int)
        upper = np.ceil(coords.max(axis=(1, 2))).astype(int)
        i0, j0, k0 = np.maximum(lower, 0)
        i1, j1, k1 = np.minimum(upper, vol.shape)
        shift = np.array([i0, j0, k0], dtype=coords.dtype)
        return ndimage.map_coordinates(
            vol[i0:i1, j0:j1, k0:k1], coords - shift[:, None, None],
            order=order, output=out_dtype)

    # -- baseline timing (scipy returns uint8, exactly like the reference) --
    c32 = [f[3].astype(np.float32) for f in frames]
    scipy_slice(c32[0])
    cpu_times = []
    for c in c32[:CPU_REPS]:
        t0 = time.perf_counter()
        scipy_slice(c)
        cpu_times.append(time.perf_counter() - t0)
    t_cpu = min(cpu_times)
    log(f"[slice] scipy CPU: {t_cpu * 1e3:.2f} ms/slice")

    t0 = time.perf_counter()
    pv = PackedVolume(vol)
    log(f"[slice] pack_volume: {time.perf_counter() - t0:.1f} s (once/volume)")

    # -- parity gate: uint8 voxel-exact on IDENTICAL f32 coords -------------
    # (scipy on a uint8 volume rounds its f64 interpolant back to uint8 —
    # the round-1 "0.51 drift" was comparing floats against that rounding)
    for order in (0, 1):
        dev = np.asarray(pv.extract(c32[0], order=order))
        dev_u8 = np.clip(np.round(dev), 0, 255).astype(np.uint8)
        ref_u8 = scipy_slice(c32[0].astype(np.float64), order=order)
        ref_f = scipy_slice(c32[0].astype(np.float64), order=order,
                            out_dtype=np.float64)
        mism = int((dev_u8 != ref_u8).sum())
        ferr = float(np.abs(dev - ref_f).max())
        log(f"[slice] parity order={order}: float err {ferr:.2e}, "
            f"uint8 mismatches {mism}/{dev.size}")
        if mism or ferr > 1e-2:
            log("[slice] FAIL: TPU slice extraction is not voxel-exact")
            sys.exit(1)

    # -- device throughput ---------------------------------------------------
    a, b, o, _ = frames[0]
    np.asarray(pv.extract_oriented(a, b, o, S, 1))  # compile/warm
    probe_device_ceiling()
    rounds = []
    for _ in range(5):
        t0 = time.perf_counter()
        last = None
        for a, b, o, _c in frames:
            last = pv.extract_oriented(a, b, o, S, 1)
        np.asarray(last).ravel()[:1]
        rounds.append((time.perf_counter() - t0) / REPS)
    t_dev = min(rounds)
    log(f"[slice] device: {t_dev * 1e3:.3f} ms/slice")
    t_cpu_pin = pin_baseline("scipy_slice_s_512", t_cpu, "s/slice")
    emit("oriented_trilinear_slice_sampling_512", 1.0 / t_dev, "slices/s",
         t_cpu / t_dev, vs_pinned=round(t_cpu_pin / t_dev, 2),
         baseline_live_ms=round(t_cpu * 1e3, 2),
         baseline_pinned_ms=round(t_cpu_pin * 1e3, 2))


# ---------------------------------------------------------------------------
# workspace with saved 512^2 samples + volumes
# ---------------------------------------------------------------------------

def make_workspace():
    from interactive_unet_tpu.engine import samples
    from interactive_unet_tpu.ops.slicer import Slicer
    from interactive_unet_tpu.ops import colors as C
    from interactive_unet_tpu import storage
    from scipy import ndimage as ndi

    if (WS / "data" / "train" / "images").is_dir() and \
            len(list((WS / "data" / "train" / "images").glob("*.tiff"))) >= 4:
        log(f"[ws] reusing workspace {WS}")
        return

    log(f"[ws] building workspace {WS} (512^3 volume + 4 samples)")
    samples.create_directories(WS)
    rng = np.random.default_rng(0)
    base = rng.normal(0, 1, (64, 64, 64)).astype(np.float32)
    base = ndi.gaussian_filter(base, 2.0)
    vol = ndi.zoom(base, 8, order=1)
    vol = (vol > np.percentile(vol, 70)).astype(np.float32) * 180 + 40
    vol += rng.normal(0, 6, vol.shape)
    vol = np.clip(vol, 1, 255).astype(np.uint8)
    storage.create_multiscale_zarr(
        vol, WS / "data" / "image_volumes" / "bench_volume.zarr")

    slicer = Slicer(vol.shape, seed=2)
    for _ in range(4):
        slicer.randomize()
        # host-side scipy slice (NOT slicer.get_slice, whose gather runs on
        # the device): this build runs in a background thread concurrent
        # with the timed slice metric and must not contend for the TPU
        coords = slicer.get_interpolation_coords(slice_width=512)[0]
        img = ndi.map_coordinates(vol, coords, order=1).astype(np.uint8)
        mask = np.zeros((512, 512, 3), np.uint8)
        mask[img > 110] = C.COLORS[2]
        mask[img <= 110] = C.COLORS[1]
        # leave some pixels unlabeled (realistic stroke coverage)
        unl = rng.random((512, 512)) > 0.3
        mask[unl] = 0
        samples.save_sample(img, mask,
                            {"volume": "bench_volume",
                             "slicer": slicer.to_dict()}, 2, root=WS)


def bench_retrain():
    from interactive_unet_tpu.engine.trainer import train_model

    kwargs = dict(lr=1e-4, batch_size=2, epochs=10, num_channels=1,
                  num_classes=2, loss_function_name="MCC + CE",
                  architecture="U-Net", encoder_name="cnn_m", root=WS)
    log("[retrain] first click (compile)...")
    t0 = time.perf_counter()
    train_model(**kwargs)
    log(f"[retrain] first: {time.perf_counter() - t0:.1f} s")
    probe_device_ceiling()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = train_model(**kwargs)
        times.append(time.perf_counter() - t0)
    t = min(times)
    log(f"[retrain] steady-state click: {t:.2f} s "
        f"(best val loss {out['best_val_loss']:.4f})")
    emit("retrain_roundtrip_4x512", t, "s", 2.0 / t)


def bench_suggestor():
    from interactive_unet_tpu.engine.suggestor import Suggestor
    from interactive_unet_tpu.ops import colors as C

    rng = np.random.default_rng(0)
    img = rng.random((512, 512)).astype(np.float32)
    mask = np.zeros((512, 512, 3), np.uint8)
    mask[64:128, 64:256] = C.COLORS[1]
    mask[300:420, 260:460] = C.COLORS[2]

    sug = Suggestor(num_channels=1, num_classes=2)
    log("[suggestor] first stroke (compile)...")
    t0 = time.perf_counter()
    sug.make_suggestions(img, mask, slice_token=1)
    log(f"[suggestor] first: {time.perf_counter() - t0:.1f} s")
    probe_device_ceiling()
    times = []
    for i in range(3):
        mask[200 + 10 * i:220 + 10 * i, 100:200] = C.COLORS[1]  # new stroke
        t0 = time.perf_counter()
        sug.make_suggestions(img, mask, slice_token=1)
        times.append(time.perf_counter() - t0)
    t = min(times)
    log(f"[suggestor] steady-state stroke: {t:.3f} s")
    emit("suggestor_per_stroke_512", t, "s", 2.0 / t)


# ---------------------------------------------------------------------------
# 4. full-volume inference + CPU reference + Dice parity
# ---------------------------------------------------------------------------

_CPU_RUNNER = r"""
import json, os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
# no persistent compile cache on CPU: jaxsetup disables it by default there
# (XLA:CPU AOT entries have both aborted on write and SIGILL'd on
# cross-host load — round-4 verdict); make it explicit so an inherited
# IUNET_JAX_CACHE can't re-enable the hazard mid-bench
os.environ["IUNET_JAX_CACHE"] = "0"
sys.path.insert(0, sys.argv[1])
ws = sys.argv[2]
from interactive_unet_tpu.engine.predict import predict_volumes
# 1) timing at input_size=64 on the 128^3 crop: 27 overlapping blocks —
#    the SAME tiling geometry (3x3x3 blocks, 25% overlap, 3.375x voxel
#    work) as the 512^3/block-256 run being extrapolated to, so both
#    sides pay identical overlap overhead.  min-of-3 (the host is ALSO
#    time-shared: this measurement has read 4.3-34 s across windows).
predict_volumes(input_size=64, num_classes=2, root=ws)  # warm
times = []
for _ in range(3):
    t0 = time.time()
    r2 = predict_volumes(input_size=64, num_classes=2, root=ws)
    times.append(time.time() - t0)
# 2) parity volume at input_size=128 LAST (same config as the TPU small
#    run) so the on-disk prediction the Dice gate reads matches it
predict_volumes(input_size=128, num_classes=2, root=ws)
print(json.dumps({"seconds": min(times), "all_seconds": times,
                  "blocks": r2[0]["blocks"]}), flush=True)
"""


_TORCH_RUNNER = r"""
# Second, independent CPU reference (VERDICT r3 #7): the reference's OWN
# 2.5D per-block predict loop (reference predict.py:79-112 — moveaxis,
# batched slice forwards along 3 axes, accumulate) in torch fp32 on CPU.
# The reference package itself cannot import here (zarr / smp / lightning
# are not installed), so the model is a torch twin of the bench model
# (cnn_m U-Net: double-conv ladder widths 32..512, GroupNorm+ReLU, nearest
# upsample decoder 256..32+16, softmax head — models/encoders.py:36,
# models/unet.py:27).  Weights are untrained: conv timing is independent
# of weight values.  Times ONE 64^3 block (warm + min-of-2); the caller
# extrapolates by block count, identical to the jax-CPU twin's geometry.
import json, os, sys, time
import numpy as np
import torch, torch.nn as nn
import torch.nn.functional as F

torch.set_num_threads(os.cpu_count() or 1)  # use every host core (1 here)

def gn(c, t=8):
    g = min(t, c)
    while c % g:
        g -= 1
    return g

def cna(cin, cout, stride=1):
    return nn.Sequential(nn.Conv2d(cin, cout, 3, stride, 1, bias=False),
                         nn.GroupNorm(gn(cout), cout), nn.ReLU(inplace=True))

class TorchUNet(nn.Module):
    def __init__(self, widths=(32, 64, 128, 256, 512),
                 dec=(256, 128, 64, 32), classes=2):
        super().__init__()
        self.stem = nn.Sequential(cna(1, widths[0], 2),
                                  cna(widths[0], widths[0]))
        self.stages = nn.ModuleList(
            nn.Sequential(cna(widths[i - 1], w), cna(w, w))
            for i, w in enumerate(widths[1:], 1))
        blocks, prev = [], widths[-1]
        for w, s in zip(dec, widths[:-1][::-1]):
            blocks.append(nn.Sequential(cna(prev + s, w), cna(w, w)))
            prev = w
        self.dec = nn.ModuleList(blocks)
        self.final = nn.Sequential(cna(prev + 1, 16), cna(16, 16))
        self.head = nn.Conv2d(16, classes, 1)

    def forward(self, x):
        img = x
        h = self.stem(x)
        feats = [h]
        for st in self.stages:
            h = st(F.max_pool2d(h, 2))
            feats.append(h)
        h = feats[-1]
        for blk, skip in zip(self.dec, feats[:-1][::-1]):
            h = F.interpolate(h, size=skip.shape[2:])
            h = blk(torch.cat([h, skip], 1))
        h = F.interpolate(h, size=img.shape[2:])
        h = self.final(torch.cat([h, img], 1))
        return torch.softmax(self.head(h), 1)

def predict_block_torch(model, block, classes=2, batch=8):
    # the reference loop shape: 3 axis sweeps, batched slice forwards,
    # accumulate into the oriented volume, average
    n = block.shape[0]
    acc = np.zeros((n, n, n, classes), dtype=np.float32)
    for axis in range(3):
        with torch.inference_mode():
            b = torch.moveaxis(block, axis, 0)
            for i in range(0, n, batch):
                y = model(b[i:i + batch].unsqueeze(1))
                y = y.permute(0, 2, 3, 1).numpy()
                if axis == 0:
                    acc[i:i + batch] += y
                elif axis == 1:
                    acc[:, i:i + batch] += y.transpose(1, 0, 2, 3)
                else:
                    acc[:, :, i:i + batch] += y.transpose(1, 2, 0, 3)
    return acc / 3.0

n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
model = TorchUNet().eval()
rng = np.random.default_rng(0)
block = torch.tensor(rng.random((n, n, n), dtype=np.float32))
predict_block_torch(model, block)  # warm
times = []
for _ in range(2):
    t0 = time.time()
    predict_block_torch(model, block)
    times.append(time.time() - t0)
print(json.dumps({"block_seconds": min(times), "all_seconds": times,
                  "block": n, "threads": torch.get_num_threads()}),
      flush=True)
"""


def collect_torch_reference(t_tpu_512: float, t_cpu_512: float,
                            budget_s: float):
    """Best-effort tail record (never fails the bench): run the torch-CPU
    reference-loop twin on one 64^3 block and log its extrapolated 512^3
    time next to the jax-CPU twin's, so the recorded vs_baseline can be
    judged against BOTH CPU baselines."""
    if budget_s < 30:
        log("[infer] torch-CPU reference skipped (deadline too close)")
        return
    try:
        out = subprocess.run(
            [sys.executable, "-c", _TORCH_RUNNER, "64"],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            timeout=budget_s).stdout
        r = json.loads(out.strip().splitlines()[-1])
        # same extrapolation as the jax twin: 27 blocks cover 128^3 at
        # input 64 / 25% overlap, then scale by voxel ratio to 512^3
        t_torch_512 = r["block_seconds"] * 27 * (512 ** 3 / 128 ** 3)
        t_torch_pin = pin_baseline("torchcpu_block64_s", r["block_seconds"],
                                   "s per 64^3 block")
        t_torch_512_pin = t_torch_pin * 27 * (512 ** 3 / 128 ** 3)
        log(f"[infer] torch-CPU reference loop (fp32, {r['threads']} threads): "
            f"{r['block_seconds']:.2f} s/64-block -> {t_torch_512:.0f} s "
            f"extrapolated at 512^3 (TPU {t_torch_512 / t_tpu_512:.1f}x "
            f"live, {t_torch_512_pin / t_tpu_512:.1f}x vs pinned); "
            f"jax-CPU twin: {t_cpu_512:.0f} s (TPU "
            f"{t_cpu_512 / t_tpu_512:.1f}x)")
    except Exception as e:
        log(f"[infer] torch-CPU reference failed (non-fatal): {e!r}")


def start_cpu_reference():
    """Prepare the 128^3 crop workspaces and LAUNCH the CPU-reference
    subprocess in the background so it overlaps the TPU-side metrics
    (suggestor + TPU 128^3 + 512^3 program warm) instead of serializing
    after them.  The subprocess gets its OWN workspace copy (ws_cpu) so its
    prediction writes can never race the TPU run's (both write
    predicted_volumes/crop.zarr).  Returns (popen, ws_small, ws_cpu)."""
    import shutil

    from interactive_unet_tpu import storage

    ws_small = WS / "small"
    ws_cpu = WS / "small_cpu"
    if not (ws_small / "data" / "image_volumes" / "crop.zarr").is_dir():
        from interactive_unet_tpu.engine import samples as S
        S.create_directories(ws_small)
        vol = storage.read_volume(
            WS / "data" / "image_volumes" / "bench_volume.zarr", level=0)
        crop = np.asarray(vol[:128, :128, :128])
        storage.create_multiscale_zarr(
            crop, ws_small / "data" / "image_volumes" / "crop.zarr")
    from interactive_unet_tpu.engine import checkpoint as _ck
    _ck.wait_pending()  # retrain's background save must land before the copy
    shutil.copytree(WS / "model", ws_small / "model", dirs_exist_ok=True)
    for sub in ("data/image_volumes", "model"):
        shutil.copytree(ws_small / sub, ws_cpu / sub, dirs_exist_ok=True)
    (ws_cpu / "data" / "predicted_volumes").mkdir(parents=True, exist_ok=True)

    log("[infer] launching CPU reference on 128^3 (background subprocess)...")
    proc = subprocess.Popen([sys.executable, "-c", _CPU_RUNNER, str(REPO),
                             str(ws_cpu)], stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE, text=True,
                            env=dict(os.environ))
    return proc, ws_small, ws_cpu


def bench_inference(cpu_ref):
    from interactive_unet_tpu import storage
    from interactive_unet_tpu.engine.predict import predict_volumes
    from interactive_unet_tpu.ops import blending

    proc, ws_small, ws_cpu = cpu_ref

    # TPU on the 128^3 crop (for Dice parity + CPU scaling)
    predict_volumes(input_size=128, num_classes=2, root=ws_small)
    t0 = time.perf_counter()
    r = predict_volumes(input_size=128, num_classes=2, root=ws_small)
    t_tpu_small = time.perf_counter() - t0
    tpu_small = np.asarray(storage.read_volume(
        ws_small / "data" / "predicted_volumes" / "crop.zarr", level=0)[:])
    log(f"[infer] TPU 128^3: {t_tpu_small:.1f} s ({r[0]['blocks']} blocks)")

    # collect the CPU reference subprocess (launched before the suggestor
    # metric; usually already finished by now)
    log("[infer] collecting CPU reference result...")
    try:
        out, err = proc.communicate(timeout=max(60, time_left() - 420))
    except subprocess.TimeoutExpired:
        proc.kill()
        out, err = proc.communicate()
        log("[infer] CPU reference subprocess timed out near the deadline")
    if proc.returncode != 0:
        log((err or "")[-2000:])
        sys.exit(1)
    cpu = json.loads(out.strip().splitlines()[-1])
    t_cpu_small = cpu["seconds"]
    log(f"[infer] CPU 128^3: {t_cpu_small:.1f} s "
        f"(min of {cpu.get('all_seconds', [t_cpu_small])})")
    cpu_small = np.asarray(storage.read_volume(
        ws_cpu / "data" / "predicted_volumes" / "crop.zarr", level=0)[:])

    # Dice parity gate TPU vs CPU (class masks from channel argmax)
    a = np.argmax(tpu_small, axis=-1)
    b = np.argmax(cpu_small, axis=-1)
    dices = []
    for c in range(tpu_small.shape[-1]):
        inter = 2.0 * np.sum((a == c) & (b == c))
        denom = np.sum(a == c) + np.sum(b == c)
        if denom:
            dices.append(inter / denom)
    dice = float(np.min(dices)) if dices else 1.0
    same = float((a == b).mean())
    log(f"[infer] TPU-vs-CPU parity: min Dice {dice:.5f}, "
        f"voxel agreement {same:.5f}")
    if dice < 0.99:
        log("[infer] FAIL: TPU/CPU Dice parity below 0.99")
        sys.exit(1)

    # -- the real metric: 512^3 on TPU ---------------------------------------
    # Block size 256 by default: the fully-convolutional model predicts any
    # window size, and LARGER single-program blocks have crashed the
    # tunnel's remote compile service (512 in round 2; a 384-block attempt
    # in round 3 left the device unreachable the same way) — 27 overlapping
    # 256^3 blocks cost ~3x the voxel work but compile reliably.
    # Set IUNET_BENCH_BLOCK=512 to attempt the single-block variant.
    block = int(os.environ.get("IUNET_BENCH_BLOCK", "256"))
    # Warm the EXACT programs the timed 512^3 run uses: the device
    # accumulator's step/finalize are specialized on the padded extent of
    # the 512^3 tiling (e.g. 640^3 for block 256), so a smaller-volume warm
    # run would compile the wrong program.  One synthetic block through the
    # real (extent-sized) accumulator compiles everything at 1/27 the work.
    import jax.numpy as jnp

    from interactive_unet_tpu.engine.predict import (_load_model,
                                                     make_device_accumulator)

    log(f"[infer] warming the block-{block} accumulator programs...")
    bc, pc, lc = blending.get_block_coordinates(
        np.array([512, 512, 512]), block, 0.25)
    pad_off = -pc[:, :3].min(axis=0)
    pad_ext = pc[:, 3:].max(axis=0) + pad_off
    model, params, _ = _load_model(WS, 1, 2)
    init, step, fin, _bs = make_device_accumulator(
        model, params, block, 2, pad_ext, None, (0, 1, 2),
        blending.gaussian_3d(block, sigma=0.125))
    acc, wacc = init()
    acc, wacc = step(acc, wacc,
                     jnp.zeros((block,) * 3, jnp.uint8),
                     jnp.int32(0), jnp.int32(0), jnp.int32(0))
    # the timed run streams individual shards (shard_size=256) out of the
    # accumulator, so warm the SHARD-shaped finalize program (offsets are
    # runtime args — one program serves every interior shard at 512^3)
    np.asarray(fin(acc, wacc, pad_off, [256, 256, 256])).ravel()[:1]
    del acc, wacc

    log(f"[infer] TPU 512^3 run (block {block})...")
    # the most capacity-sensitive metric runs last, often long after the
    # opening probe — re-probe so the metric line annotates THIS window
    # (never wait here: round 3 starved on exactly that)
    probe_device_ceiling()
    t0 = time.perf_counter()
    r = predict_volumes(input_size=block, num_classes=2, root=WS)
    t_tpu = time.perf_counter() - t0
    voxels = 512 ** 3
    # CPU time extrapolates linearly in voxel count: the CPU reference runs
    # the IDENTICAL 27-block/25%-overlap tiling on its 128^3 volume
    # (input_size=64), so scaling by the volume ratio models exactly "the
    # same pipeline, same geometry, on CPU at 512^3 with 256-blocks"
    t_cpu_512 = t_cpu_small * (voxels / 128 ** 3)
    log(f"[infer] TPU 512^3: {t_tpu:.1f} s ({r[0]['blocks']} blocks); "
        f"CPU extrapolated: {t_cpu_512:.0f} s")
    log(f"[infer] spans: {r[0].get('timings')}")
    t_cpu_pin = pin_baseline("jaxcpu_inference_128_s", t_cpu_small,
                             "s at 128^3")
    emit("fullvolume_inference_512", voxels / t_tpu / 1e6, "Mvoxels/s",
         t_cpu_512 / t_tpu,
         vs_pinned=round(t_cpu_pin * (voxels / 128 ** 3) / t_tpu, 2),
         baseline_live_s=round(t_cpu_small, 2),
         baseline_pinned_s=round(t_cpu_pin, 2),
         baseline="same 2.5D pipeline on jax-CPU, identical 27-block/25%-"
                  "overlap tiling, measured at 128^3 and voxel-extrapolated"
                  " to 512^3 (torch-CPU reference-loop twin in stderr tail)")
    collect_torch_reference(t_tpu, t_cpu_512, min(time_left() - 240, 300))

    # Opportunistic best-case record (VERDICT r2 #10): in a quiet window,
    # try the single-512-block program (1/3 the voxel work of the 256
    # tiling).  It once crashed the tunnel's remote-compile service, hence
    # the guard and the default-off absolute gate: a failure here never
    # fails the bench.
    quiet = float(os.environ.get("IUNET_BENCH_QUIET_TFLOPS", "5"))
    if (os.environ.get("IUNET_BENCH_TRY_512", "1") != "0"
            and block != 512 and (_LAST_CEILING[0] or 0) >= quiet
            and time_left() > 420):
        try:
            import traceback
            log("[infer] quiet window: attempting single-512-block run...")
            t0 = time.perf_counter()
            predict_volumes(input_size=512, num_classes=2, root=WS)
            t_512 = time.perf_counter() - t0
            log(f"[infer] TPU 512^3 single-block: {t_512:.1f} s")
            emit("fullvolume_inference_512_block512", voxels / t_512 / 1e6,
                 "Mvoxels/s", t_cpu_512 / t_512,
                 vs_pinned=round(t_cpu_pin * (voxels / 128 ** 3) / t_512, 2))
        except Exception:
            log(f"[infer] single-512-block attempt failed (non-fatal):\n"
                f"{traceback.format_exc(limit=3)}")


def main():
    which = sys.argv[1:] or ["slice", "retrain", "suggestor", "inference"]
    # sitecustomize pins the axon plugin and this jax build ignores the env
    # var; mirror it via jax.config (no backend init yet) so local
    # JAX_PLATFORMS=cpu runs really use the CPU backend
    p = os.environ.get("JAX_PLATFORMS")
    if p:
        import jax
        jax.config.update("jax_platforms", p)
    if which == ["probe"]:
        # diagnostic mode: bounded backend probe + ceiling, one JSON line —
        # distinguishes "tunnel dead" from "device busy" without running
        # any workload (the 2026-08-17 outage class)
        if not wait_for_backend():
            emit("device_unavailable", 0, "flag", 0)
            return
        c = probe_device_ceiling()
        emit("device_ceiling", c, "TFLOP/s", 1.0)
        return
    start_watchdog()

    # the workspace build (512^3 synthetic volume + 4 samples) is pure host
    # work — overlap it with the backend probe and the opening quiet wait
    ws_thread = None
    ws_err: list = []
    if {"retrain", "suggestor", "inference"} & set(which):
        def _build_ws():
            try:
                make_workspace()
            except BaseException as e:  # surfaced at join
                ws_err.append(e)

        ws_thread = threading.Thread(target=_build_ws, daemon=True)
        ws_thread.start()

    if not wait_for_backend():
        # still emit the one JSON line the driver expects, flagged so a
        # dead-tunnel window is distinguishable from a slow build
        emit("device_unavailable", 0, "flag", 0)
        return
    import jax
    log(f"platform: {jax.default_backend()}, devices: {jax.devices()}")
    if jax.default_backend() != "cpu":
        wait_for_quiet_window()

    failed = []

    def run(name, fn, *args):
        """A parity-gate sys.exit inside a metric still aborts the whole
        bench (gates are hard); infrastructure errors (tunnel drops, remote
        compile crashes) skip to the next metric so partial results land."""
        import traceback
        try:
            fn(*args)
        except SystemExit:
            raise
        except Exception:
            log(f"[{name}] FAILED:\n{traceback.format_exc(limit=5)}")
            failed.append(name)

    if "slice" in which:
        run("slice", bench_slice_sampling)
    if ws_thread is not None:
        ws_thread.join()
        if ws_err:
            raise ws_err[0]
    if "retrain" in which:
        run("retrain", bench_retrain)
    cpu_ref = None
    if "inference" in which:
        # launch the CPU-reference subprocess NOW so it overlaps the
        # suggestor metric and the inference program warms (needs the
        # retrain's checkpoint, hence after bench_retrain)
        try:
            cpu_ref = start_cpu_reference()
        except Exception:
            import traceback
            log(f"[inference] CPU-ref launch FAILED:\n"
                f"{traceback.format_exc(limit=5)}")
            failed.append("inference")
    if "suggestor" in which:
        run("suggestor", bench_suggestor)
    if cpu_ref is not None:
        run("inference", bench_inference, cpu_ref)
    if failed:
        log(f"metrics failed: {failed}")
        sys.exit(1)


if __name__ == "__main__":
    main()
