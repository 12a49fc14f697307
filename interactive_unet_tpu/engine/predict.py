"""Inference engine (reference predict.py, re-designed for TPU).

- ``predict_slice``: single-slice forward -> argmax -> palette colors
  (reference predict.py:16-47).
- ``predict_volumes``: overlapping-block sliding-window inference over every
  stored volume: reflect-padded block fetch, 2.5D prediction (batched 2-D
  forwards along all three axes inside ONE jit-compiled block function),
  Gaussian window blending, uint8 normalization, multiscale Zarr writeback
  (reference predict.py:114-264 semantics).

TPU-first re-design vs the reference:
- the per-block 2.5D loop (reference predict.py:79-112: torch moveaxis +
  per-batch host->device round-trips) becomes a single jit function: the
  block is pushed to HBM once, all three axis sweeps and the window multiply
  stay on device (lax.fori_loop over fixed-size batches — static shapes)
- no CUDA-OOM probing (reference predict.py:49-77): batch size is derived
  from a static activation-memory estimate; XLA compiles one program
- blending accumulation happens into host RAM (numpy) instead of zarr
  read-modify-write churn (SURVEY hard part #5); volumes larger than RAM
  fall back to temp-zarr accumulators, preserving reference behavior
"""

from __future__ import annotations

import glob
import shutil
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .. import storage
from ..config import TrainConfig
from ..models import build_model
from ..models.layers import staypacked_scope
from ..ops import blending
from ..ops import colors as C
from . import checkpoint as ckpt_io


_MODEL_CACHE: dict = {}


def _load_model(root, num_channels, num_classes):
    """Checkpoint -> (model, params, cfg), cached by (path, mtime) so the
    interactive predict-slice path doesn't rebuild/re-init per call (the
    reference reloads the Lightning ckpt every call, predict.py:22-27)."""
    model_path = Path(root) / "model" / "model.ckpt"
    ckpt_io.wait_pending(model_path)  # before mtime: a background save may
    # still be writing the file this cache key is about to fingerprint
    cache_key = (str(model_path),
                 model_path.stat().st_mtime if model_path.is_file() else None,
                 num_channels, num_classes)
    if cache_key in _MODEL_CACHE:
        return _MODEL_CACHE[cache_key]
    out = _load_model_uncached(root, num_channels, num_classes)
    _MODEL_CACHE.clear()
    _MODEL_CACHE[cache_key] = out
    return out


def _load_model_uncached(root, num_channels, num_classes):
    model_path = Path(root) / "model" / "model.ckpt"
    if model_path.is_file():
        state_dict, cfg = ckpt_io.load_checkpoint(model_path)
        from ..models import restore_pretrained_flag
        cfg.pretrained = restore_pretrained_flag(
            cfg.encoder_name, cfg.pretrained, state_dict)
        model = build_model(architecture=cfg.architecture,
                            encoder_name=cfg.encoder_name,
                            num_channels=cfg.num_channels,
                            num_classes=cfg.num_classes,
                            pretrained=cfg.pretrained)
        dummy = jnp.zeros((1, 64, 64, cfg.num_channels), jnp.float32)
        params = model.init(jax.random.key(0), dummy)
        from flax import serialization
        params = serialization.from_state_dict(params, state_dict)
        return model, params, cfg
    cfg = TrainConfig(num_channels=num_channels, num_classes=num_classes)
    model = build_model(architecture=cfg.architecture,
                        encoder_name=cfg.encoder_name,
                        num_channels=num_channels, num_classes=num_classes)
    dummy = jnp.zeros((1, 64, 64, num_channels), jnp.float32)
    params = model.init(jax.random.key(0), dummy)
    return model, params, cfg


def predict_slice(image_slice, num_channels=1, num_classes=2,
                  return_probabilities=False, root="."):
    """Forward one (H, W[, C]) uint8 slice -> colored prediction (or probs)."""
    x = np.asarray(image_slice)
    if x.ndim == 2:
        x = x[:, :, None]
    num_channels = x.shape[-1]
    model, params, cfg = _load_model(root, num_channels, num_classes)
    if cfg.num_channels != num_channels:
        raise ValueError(
            f"slice has {num_channels} channel(s) but the saved model was "
            f"trained with num_channels={cfg.num_channels}; re-train or pass "
            f"a matching slice")
    x = (x[None] / 255).astype("float32")
    if return_probabilities:
        def probs_fn(p, xi):
            with staypacked_scope():
                return model.apply(p, xi)
        return np.asarray(jax.jit(probs_fn)(params, jnp.asarray(x)))
    fn = _colored_fn(model, num_classes)
    return np.asarray(fn(params, jnp.asarray(x)))


_COLORED_CACHE: dict = {}


def _colored_fn(model, num_classes):
    """Compiled argmax+palette mapping, cached per model (ships (H,W,3)
    uint8 instead of (H,W,C) float probabilities)."""
    key = (model, num_classes)
    if key not in _COLORED_CACHE:
        def colored(p, x):
            with staypacked_scope():
                probs = model.apply(p, x)
            ids = jnp.argmax(probs[0, :, :, :num_classes], axis=-1)
            return C.class_to_colored_device(ids, num_classes)

        _COLORED_CACHE.clear()
        _COLORED_CACHE[key] = jax.jit(colored)
    return _COLORED_CACHE[key]


def _auto_batch_size(input_size: int, hbm_budget_bytes=4 << 30,
                     num_channels: int = 1, width: int = 64) -> int:
    """Static batch-size guess: first-level activations dominate
    (~input_size^2 * width * 4 bytes each, ~8 live tensors at peak).

    This replaces the reference's CUDA-OOM doubling probe (predict.py:49-77)
    with an estimate — but unlike round 2's fixed constant it scales with
    the encoder width/channels, and predict_volumes validates it against the
    device: an actual RESOURCE_EXHAUSTED halves the batch and retries
    (_shrink_batch ladder), so a wrong guess degrades instead of dying."""
    per_slice = input_size * input_size * max(width, num_channels * 16) * 4 * 8
    bs = max(1, int(hbm_budget_bytes / per_slice))
    # round down to a divisor of input_size so the device loop has no remainder
    while input_size % bs:
        bs -= 1
    return bs


def _encoder_width(model) -> int:
    """First-stage channel width of the model's encoder (activation-memory
    estimate input); 64 when the encoder doesn't expose widths."""
    enc = getattr(model, "encoder", None)
    widths = getattr(enc, "widths", None)
    try:
        return int(widths[0]) if widths else 64
    except Exception:
        return 64


def _is_oom(err: Exception) -> bool:
    return "RESOURCE_EXHAUSTED" in str(err) or "Out of memory" in str(err)


def _shrink_batch(input_size: int, bs: int) -> int:
    """Next rung of the OOM fallback ladder: halve, keep a divisor of S."""
    bs = max(1, bs // 2)
    while input_size % bs:
        bs -= 1
    return bs


def make_block_predict_fn(model, input_size: int, num_classes: int,
                          batch_size: int, axes=(0, 1, 2), window=None,
                          slice_hook=None):
    """The (UNjitted) 2.5D block function shared by the single-chip and
    mesh-sharded paths: (params, (S,S,S[,C]) uint8 block) -> (S,S,S,classes)
    windowed prediction, averaged over the requested axis sweeps.
    Multi-channel volumes ride a trailing channel axis through every sweep.
    ``slice_hook`` intercepts each slice batch (the sharded path applies its
    sharding constraint there — parallel/infer.py)."""
    S = input_size
    bs = batch_size
    window_d = (jnp.asarray(window)[..., None]
                if window is not None else None)

    def sweep(p, vol):
        """Batched 2-D forward over axis 0 of ``vol`` (S,S,S,C) -> (S,S,S,classes)."""
        def body(i, acc):
            sl = jax.lax.dynamic_slice_in_dim(vol, i * bs, bs, 0)
            if slice_hook is not None:
                sl = slice_hook(sl)
            with staypacked_scope():
                pred = model.apply(p, sl)
            return jax.lax.dynamic_update_slice_in_dim(acc, pred, i * bs, 0)

        acc = jnp.zeros((S, S, S, num_classes), jnp.float32)
        return jax.lax.fori_loop(0, S // bs, body, acc)

    def predict_block(p, block_u8):
        # normalize on device (the block ships as uint8: 4x less host->device
        # traffic) and return float16 (2x less device->host; final output is
        # uint8, so fp16's 1e-3 relative precision is far beyond sufficient)
        block = block_u8.astype(jnp.float32) / 255.0
        if block.ndim == 3:
            block = block[..., None]
        acc = jnp.zeros((S, S, S, num_classes), jnp.float32)
        if 0 in axes:
            acc = acc + sweep(p, block)
        if 1 in axes:
            acc = acc + sweep(p, block.transpose(1, 0, 2, 3)
                              ).transpose(1, 0, 2, 3)
        if 2 in axes:
            acc = acc + sweep(p, block.transpose(2, 0, 1, 3)
                              ).transpose(1, 2, 0, 3)
        acc = acc / len(axes)
        if window_d is not None:
            acc = acc * window_d
        return acc.astype(jnp.float16)

    return predict_block


def make_block_predictor(model, params, input_size: int, num_classes: int,
                         batch_size: int | None = None,
                         axes=(0, 1, 2), window=None):
    """Returns (fn: (S,S,S[,C]) uint8 block -> (S,S,S,classes), batch_size)."""
    bs = batch_size or _auto_batch_size(input_size,
                                        width=_encoder_width(model))
    fn = jax.jit(make_block_predict_fn(model, input_size, num_classes, bs,
                                       axes, window))
    return lambda block: fn(params, jnp.asarray(block, jnp.uint8)), bs


def make_device_accumulator(model, params, input_size: int, num_classes: int,
                            ext, batch_size: int | None = None,
                            axes=(0, 1, 2), window=None, mesh=None):
    """Device-resident blending (SURVEY hard part #5): the whole padded
    output volume accumulates in HBM — each block's 2.5D prediction and its
    Gaussian window are added in place with NO device->host transfer, and
    one normalize+uint8 crop ships out at the end.  vs the host path this
    removes blocks x (S,S,S,C) fp16 d2h (1.8 GB for 512^3/256) and all host
    read-modify-write.

    With a ``mesh``, each sweep's slice batch is sharding-constrained over
    the mesh's ``data`` (and ``space``) axes, so GSPMD splits the conv
    forwards across chips (parallel/infer.py design); params and the
    accumulators are replicated — the accumulate update is elementwise, and
    replication keeps the per-chip HBM budget identical to single-chip.
    This is what the reference's dead multi-GPU sketch wanted to be
    (predict.py:137-147, 204-232).

    Returns (init, step, finalize, bs): init() -> zeroed (acc, wacc) device
    buffers; step(acc, wacc, block_u8, i, j, k) adds one block at
    padded-space offset (i, j, k); finalize(acc, wacc, off, shape)
    -> (shape..., classes) uint8."""
    S = input_size
    bs = batch_size or _auto_batch_size(S, width=_encoder_width(model))
    slice_hook = None
    if mesh is not None:
        from ..parallel.mesh import batch_sharding as _bsh
        from ..parallel.mesh import replicated as _rep

        rep = _rep(mesh)
        bsh = _bsh(mesh)
        n_data = int(dict(zip(mesh.axis_names, mesh.devices.shape)).get(
            "data", 1))
        # batch must stay a divisor of S AND split evenly over 'data'
        while bs > n_data and (S % bs or bs % n_data):
            bs -= 1
        if S % bs or bs % n_data:
            bs = n_data if S % n_data == 0 else 1
        slice_hook = (lambda sl:
                      jax.lax.with_sharding_constraint(sl, bsh))
        params = jax.device_put(params, rep)
    predict_fn = make_block_predict_fn(model, S, num_classes, bs, axes,
                                       window, slice_hook=slice_hook)
    if window is None:  # match make_block_predictor's contract: uniform
        window = np.ones((S, S, S), np.float32)  # weights == block counting
    win = jnp.asarray(window, jnp.float32)

    from functools import partial as _partial

    # params enter as a jit ARGUMENT (not closure constants): the compiled
    # program is then identical across retrains, so the persistent compile
    # cache keeps hitting after every parameter update
    @_partial(jax.jit, donate_argnums=(1, 2))
    def _step(p, acc, wacc, block_u8, i0, j0, k0):
        pred = predict_fn(p, block_u8).astype(jnp.float32)
        cur = jax.lax.dynamic_slice(
            acc, (i0, j0, k0, 0), (S, S, S, acc.shape[-1]))
        acc = jax.lax.dynamic_update_slice(acc, cur + pred, (i0, j0, k0, 0))
        curw = jax.lax.dynamic_slice(wacc, (i0, j0, k0), (S, S, S))
        wacc = jax.lax.dynamic_update_slice(wacc, curw + win, (i0, j0, k0))
        return acc, wacc

    def step(acc, wacc, block_u8, i0, j0, k0):
        return _step(params, acc, wacc, block_u8, i0, j0, k0)

    _fin_cache: dict = {}

    def finalize(acc, wacc, off, shape):
        """Crop ``shape`` at ``off``, normalize, cast — on device; one uint8
        d2h.  Called once for the whole volume, or per row-slab by the
        streaming path in ``predict_volumes`` (the jit is cached per
        (off, shape) so slab calls don't retrace).

        No buffer donation here: the f32 accumulators can never alias the
        uint8 output (XLA would warn 'donated buffers were not usable' and
        copy anyway); they are freed when the caller drops its references.
        The per-block ``step`` IS donating — that is the path where an
        unusable donation would cost a fresh multi-GB accumulator copy."""
        key = tuple(int(s) for s in shape)  # offsets are runtime args, so
        if key not in _fin_cache:           # one program serves every slab

            @jax.jit
            def _fin(acc, wacc, i0, j0, k0):
                p = jax.lax.dynamic_slice(
                    acc, (i0, j0, k0, 0), (*key, acc.shape[-1]))
                w = jnp.maximum(
                    jax.lax.dynamic_slice(wacc, (i0, j0, k0), key), 1e-3)
                # truncating cast — bit-identical to the host path's
                # (255*p/w).astype("uint8")
                return jnp.clip(255.0 * p / w[..., None], 0,
                                255).astype(jnp.uint8)

            _fin_cache[key] = _fin
        i0, j0, k0 = (jnp.int32(int(o)) for o in off)
        return _fin_cache[key](acc, wacc, i0, j0, k0)

    def init():
        e = tuple(int(v) for v in ext)
        bufs = (jnp.zeros((*e, num_classes), jnp.float32),
                jnp.zeros(e, jnp.float32))
        if mesh is not None:  # replicate across the mesh (see docstring)
            bufs = jax.device_put(bufs, rep)
        return bufs

    return init, step, finalize, bs


def predict_volumes(input_size=256, num_channels=1, num_classes=2,
                    overlap=0.25, chunk_size=128, shard_size=256,
                    batch_size=None, axes=(0, 1, 2), root=".",
                    progress=None, ram_budget_bytes=64 << 30,
                    hbm_budget_bytes=6 << 30, mesh=None):
    """Sliding-window inference over every data/image_volumes/*.zarr store.

    Accumulator placement (fastest first):
    1. device HBM — the padded output volume lives on device; blocks blend in
       place with zero per-block d2h, one uint8 crop ships at the end
       (make_device_accumulator; used when it fits ``hbm_budget_bytes``)
    2. host RAM (``ram_budget_bytes``)
    3. reference-style temp zarr accumulators (predict.py:183-199)

    ``mesh``: a jax.sharding.Mesh to split the per-block slice batches
    across chips (GSPMD over ICI; parallel/infer.py design).  CLI:
    ``interactive-unet-tpu predict-volumes --mesh 4x2`` / ``IUNET_MESH``.
    """
    root = Path(root)
    model, params, cfg = _load_model(root, num_channels, num_classes)

    volume_files = sorted(glob.glob(str(root / "data" / "image_volumes" / "*.zarr")))
    window = blending.gaussian_3d(input_size, sigma=0.125)
    _predictors: dict = {}  # bs -> host-path block predictor (reused)
    if mesh is not None:
        from ..parallel.mesh import replicated as _rep

        rep_sharding = _rep(mesh)

    def host_predictor(bs):
        if bs not in _predictors:
            if mesh is not None:
                from ..parallel.infer import make_sharded_block_predictor

                _predictors[bs] = make_sharded_block_predictor(
                    model, params, input_size, num_classes, mesh, bs,
                    axes, window)[0]
            else:
                _predictors[bs] = make_block_predictor(
                    model, params, input_size, num_classes, bs, axes,
                    window)[0]
        return _predictors[bs]

    results = []
    for f in volume_files:
        start_time = time.time()
        volume = storage.read_volume(f, level=0)
        vol_channels = volume.shape[3] if volume.ndim == 4 else 1
        if vol_channels != cfg.num_channels:
            # one model serves the whole run; a mixed-channel workspace
            # can't silently crash the executor thread mid-sweep — record
            # and keep predicting the volumes the model CAN handle
            results.append({"volume": f, "error":
                            f"volume has {vol_channels} channel(s) but the "
                            f"model expects {cfg.num_channels}; skipped"})
            continue
        in_shape = np.array(volume.shape[:3])
        out_shape = tuple(in_shape.tolist()) + (num_classes,)

        save_path = f.replace("image_volumes", "predicted_volumes")
        out_root = storage.open(save_path, mode="w")
        final = out_root.create_array(
            name="0", shape=out_shape,
            chunks=(chunk_size,) * 3 + (num_classes,),
            shards=(shard_size,) * 3 + (num_classes,), dtype="uint8",
            overwrite=True)

        block_coords, padded_coords, local_coords = \
            blending.get_block_coordinates(in_shape, input_size, overlap)

        pad_off = -padded_coords[:, :3].min(axis=0)
        pad_ext = padded_coords[:, 3:].max(axis=0) + pad_off
        dev_bytes = int(np.prod(pad_ext)) * (num_classes + 1) * 4
        use_device = dev_bytes <= hbm_budget_bytes

        bytes_needed = int(np.prod(in_shape)) * (num_classes + 1) * 4
        use_ram = bytes_needed <= ram_budget_bytes

        from concurrent.futures import ThreadPoolExecutor

        from ..utils.profiling import Timer

        timer = Timer()
        win_np = np.asarray(window, dtype=np.float32)

        # async host->device pipeline: a worker thread reads + reflect-pads
        # the NEXT zarr block while the device predicts the current one
        # (SURVEY §2.1: shard-aligned async prefetch)
        def fetch(idx):
            """Read + reflect-pad the block AND start its host->device
            upload from the prefetch thread (jax.device_put is async), so
            the next block's transfer rides the wire while the device
            computes the current block (VERDICT r2 #6: the upload used to
            serialize with compute on the consume side)."""
            pb = blending.get_padded_block(volume, *padded_coords[idx])
            pb = jnp.asarray(pb, jnp.uint8)
            return (jax.device_put(pb, rep_sharding) if mesh is not None
                    else jax.device_put(pb))

        def run_blocks(consume, depth=2, order=None):
            """Prefetch-pipelined block loop shared by both accumulator
            paths: worker threads read+pad+upload up to ``depth`` blocks
            ahead while ``consume(idx, block)`` handles block idx (depth 2
            because a single worker's zstd decode sometimes lags the device
            — 11.3 s of read_block stall in the round-4 512^3 profile).  A
            fresh executor per call so an OOM-laddered retry gets a live
            one.  ``order`` permutes the traversal (the device path passes
            a shard-major order so output shards complete early; blending
            is a sum, so any order is output-identical)."""
            idxs = (list(order) if order is not None
                    else list(range(len(padded_coords))))
            n = len(idxs)
            prefetcher = ThreadPoolExecutor(max_workers=depth)
            pending = [prefetcher.submit(fetch, i) for i in idxs[:depth]]
            for pos, idx in enumerate(idxs):
                with timer.span("read_block"):
                    pb = pending.pop(0).result()
                if pos + depth < n:
                    pending.append(prefetcher.submit(fetch, idxs[pos + depth]))
                consume(idx, pb)
                if progress is not None:
                    progress(pos + 1, n)
            prefetcher.shutdown(wait=False)

        def attempt_device(bs_try):
            """Device-accumulator path; raises on OOM (caller ladders).

            Shard-streamed finalize: blocks are traversed in SHARD-MAJOR
            order (blending.shard_major_block_order), so each output shard's
            intersecting blocks run consecutively and the shard is
            normalized on device + its uint8 d2h started the moment its
            last block lands — a writer thread writes it while later blocks
            are still accumulating.  Under the round-3 raster traversal,
            most shards only completed near the final blocks and the d2h
            drained serially after accumulation (42 s of the 84 s 512^3
            round-4 run); shard-major traversal spreads shard completions
            evenly across the whole accumulate phase.  Shards are the
            natural streaming unit (one zarr shard file = one write).

            Dispatch-count tradeoff: finalize launches one device program
            per output shard, (extent/shard_size)^3 total — 8 at the
            512^3/shard-256 default but 4096 at shard-32, where per-dispatch
            overhead could exceed the streaming win; keep shards >= 128 for
            large volumes (the storage default is 256)."""
            from collections import defaultdict

            init, step, finalize, bs = make_device_accumulator(
                model, params, input_size, num_classes, pad_ext,
                bs_try, axes, window, mesh=mesh)
            acc, wacc = init()

            # per shard: the block index at which it becomes finalizable =
            # the LAST (in traversal order) block whose padded extent
            # intersects it.  get_block_coordinates padded extents and
            # get_shard_coordinates tiles are both expressed in the
            # output/volume frame, so the intersection test needs no
            # offsetting (pad_off only shifts into accumulator space).
            shards_all = blending.get_shard_coordinates(
                in_shape, shard_size=shard_size)
            order = blending.shard_major_block_order(padded_coords,
                                                     shards_all)
            pos_of = np.empty(len(order), np.int64)
            pos_of[order] = np.arange(len(order))
            inter_all = blending.block_shard_intersections(padded_coords,
                                                           shards_all)
            ready_at = defaultdict(list)   # block idx -> shards finalizable
            for s_idx in range(len(shards_all)):
                blocks = np.nonzero(inter_all[s_idx])[0]
                # a covering tiling guarantees >=1 block per shard; guard the
                # invariant rather than crash on .max() of an empty set
                assert len(blocks), \
                    f"no block covers output shard {shards_all[s_idx]}"
                ready_at[int(order[pos_of[blocks].max()])].append(s_idx)

            offs = [int(o) for o in pad_off]
            # 2 writers: one shard's d2h wait overlaps another's zstd encode
            # + file write (writes are shard-partitioned — every shard is
            # one distinct file, written once, so two writers never race)
            writer = ThreadPoolExecutor(max_workers=2)
            shard_futures = []

            def write_tile(coords, dev_u8):
                # runs on the writer thread, overlapped with the main
                # thread's accumulate loop (span names are disjoint from
                # the main thread's, so the shared Timer stays consistent)
                i0, j0, k0, i1, j1, k1 = coords
                with timer.span("shard_d2h_wait"):
                    out = np.asarray(dev_u8)  # transfer already in
                    #                        flight (copy_to_host_async)
                with timer.span("writeback"):
                    final[i0:i1, j0:j1, k0:k1] = out

            def ship_shard(s_idx):
                i0, j0, k0, i1, j1, k1 = shards_all[s_idx]
                r = finalize(acc, wacc,
                             (offs[0] + i0, offs[1] + j0, offs[2] + k0),
                             (i1 - i0, j1 - j0, k1 - k0))
                r.copy_to_host_async()
                shard_futures.append(
                    writer.submit(write_tile, shards_all[s_idx], r))

            def consume(idx, pb):
                nonlocal acc, wacc
                with timer.span("device_accumulate"):
                    s0, s1, s2 = (padded_coords[idx, :3] + pad_off).tolist()
                    acc, wacc = step(acc, wacc, pb,
                                     jnp.int32(s0), jnp.int32(s1),
                                     jnp.int32(s2))
                # dispatch-only (async): normalize+d2h rides behind the
                # remaining accumulate steps on the device stream
                for s in ready_at.get(idx, ()):
                    ship_shard(s)

            try:
                run_blocks(consume, order=order)
                with timer.span("finalize_d2h"):  # residual drain only
                    for fut in shard_futures:
                        fut.result()
            finally:
                writer.shutdown(wait=True)
            return bs

        def attempt_host(bs):
            predict_block = host_predictor(bs)
            if use_ram:
                pred = np.zeros(out_shape, dtype=np.float32)
                weight = np.zeros(tuple(in_shape), dtype=np.float32)
            else:  # reference-style temp zarr accumulators
                tmp = root / "temp"
                pred = storage.open(tmp / "pred.zarr", mode="w").create_array(
                    name="0", shape=out_shape,
                    chunks=(chunk_size,) * 3 + (num_classes,),
                    shards=(shard_size,) * 3 + (num_classes,),
                    dtype="float32", overwrite=True)
                weight = storage.open(
                    tmp / "weight.zarr", mode="w").create_array(
                    name="0", shape=tuple(in_shape), chunks=(chunk_size,) * 3,
                    shards=(shard_size,) * 3, dtype="float32", overwrite=True)

            def consume(idx, pb):
                with timer.span("device_2_5d"):
                    block_pred = np.asarray(predict_block(pb),
                                            dtype=np.float32)
                i0, j0, k0, i1, j1, k1 = block_coords[idx]
                li0, lj0, lk0, li1, lj1, lk1 = local_coords[idx]
                pred[i0:i1, j0:j1, k0:k1] = (
                    pred[i0:i1, j0:j1, k0:k1]
                    + block_pred[li0:li1, lj0:lj1, lk0:lk1])
                weight[i0:i1, j0:j1, k0:k1] = (
                    weight[i0:i1, j0:j1, k0:k1]
                    + win_np[li0:li1, lj0:lj1, lk0:lk1])

            run_blocks(consume)

            # shard-aligned normalization + writeback: one thread per shard
            # so no two threads ever touch the same shard file (the
            # reference's write partitioning, predict.py:251-256)
            def normalize_shard(coords):
                i0, j0, k0, i1, j1, k1 = coords
                p = pred[i0:i1, j0:j1, k0:k1]
                w = weight[i0:i1, j0:j1, k0:k1]
                final[i0:i1, j0:j1, k0:k1] = (
                    255 * p / np.maximum(w, 1e-3)[..., None]).astype("uint8")

            with timer.span("normalize_writeback"):
                from joblib import Parallel, delayed

                Parallel(n_jobs=-1, prefer="threads")(
                    delayed(normalize_shard)(coords)
                    for coords in blending.get_shard_coordinates(
                        in_shape, shard_size=shard_size))

            if not use_ram:
                shutil.rmtree(root / "temp", ignore_errors=True)
            return bs

        # OOM fallback ladder (replaces the reference's CUDA-OOM doubling
        # probe, predict.py:49-77): run with the estimated batch size; on
        # RESOURCE_EXHAUSTED halve the batch, and when a batch of 1 still
        # OOMs on the device accumulator, drop to the host accumulator.
        bs_try = batch_size or _auto_batch_size(
            input_size, num_channels=num_channels,
            width=_encoder_width(model))
        while True:
            try:
                bs = (attempt_device(bs_try) if use_device
                      else attempt_host(bs_try))
                break
            except Exception as e:
                if not _is_oom(e):
                    raise
                if bs_try > 1:
                    new_bs = _shrink_batch(input_size, bs_try)
                    print(f"predict_volumes: device OOM at batch {bs_try}; "
                          f"retrying with batch {new_bs}")
                    bs_try = new_bs
                elif use_device:
                    use_device = False
                    # the host path freed the multi-GB device accumulators,
                    # so restart the ladder from the full batch estimate
                    bs_try = batch_size or _auto_batch_size(
                        input_size, num_channels=num_channels,
                        width=_encoder_width(model))
                    print("predict_volumes: device accumulator does not fit "
                          "HBM; falling back to the host accumulator")
                else:
                    raise

        with timer.span("multiscale"):
            storage.add_multiscales(save_path, scale=0.5)
        results.append({"volume": f, "seconds": time.time() - start_time,
                        "blocks": len(padded_coords), "batch_size": bs,
                        "device_accumulator": bool(use_device),
                        "timings": timer.report()})
    return results
