"""Training driver (reference trainer.py:12-63, re-designed for TPU).

Behavioral contract preserved:
- loads saved train/val samples from the workspace (loader semantics)
- resumes from ``model/model.ckpt`` when present, overriding lr/loss
  (trainer.py:32-35); otherwise builds a fresh model
- keeps the *best val-loss* params as ``model/model.ckpt`` (trainer.py:46-49)
- logs per-epoch train/val Loss+Dice+IoU+MCC to
  ``model/history/<timestamp>/version_0/metrics.csv`` (trainer.py:52)

TPU-first re-design:
- one jit-compiled train step: fused on-device augmentation -> bf16 forward
  -> weighted loss -> AdamW update, params donated (no host copies)
- fixed shapes everywhere: the last short batch is padded with zero-weight
  duplicates, which is *exact* for the weighted loss/metric suite (the
  denominator is sum(weight)) — so each (batch_size, H, W, C) signature
  compiles exactly once (SURVEY hard part #2)
- optional device mesh: pass ``mesh`` to shard the batch axis across chips;
  XLA inserts the gradient all-reduce over ICI automatically (GSPMD)
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import TrainConfig
from ..models import build_model
from ..ops import augment as aug
from ..ops import metrics as M
from . import checkpoint as ckpt_io
from . import samples
from .history import CSVHistoryLogger

AXES = (0, 1, 2)  # batch-global reduction, matching reference axes=[0,2,3]


def _stack(annotations, num_classes):
    imgs = np.stack([a[0] for a in annotations])
    masks = np.stack([_fit_channels(a[1], num_classes) for a in annotations])
    weights = np.stack([_fit_channels(a[2], num_classes) for a in annotations])
    return imgs, masks, weights


def _fit_channels(arr, c):
    if arr.shape[-1] == c:
        return arr
    if arr.shape[-1] > c:
        return arr[..., :c]
    pad = np.zeros((*arr.shape[:-1], c - arr.shape[-1]), arr.dtype)
    return np.concatenate([arr, pad], axis=-1)


def _round_metrics(pred, y, w):
    yr = jnp.round(y)
    pr = jnp.round(pred)
    return {
        "Dice": M.dice(pr, yr, w, AXES),
        "IoU": M.iou(pr, yr, w, AXES),
        "MCC": M.mcc(pr, yr, w, AXES),
    }


def make_train_step(model, loss_fn, optimizer):
    def step(params, opt_state, key, x, y, w):
        xa, ya, wa = aug.augment_batch(key, x, y, w)

        def lfn(p):
            pred = model.apply(p, xa)
            return loss_fn(pred, ya, wa, AXES), pred

        (loss, pred), grads = jax.value_and_grad(lfn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = _round_metrics(pred, ya, wa)
        return params, opt_state, loss, metrics

    return jax.jit(step, donate_argnums=(0, 1))


def make_eval_step(model, loss_fn):
    def step(params, x, y, w):
        pred = model.apply(params, x)
        loss = loss_fn(pred, y, w, AXES)
        return loss, _round_metrics(pred, y, w)

    return jax.jit(step)


# (model, optimizer, fused epoch fn) cached per program signature: a retrain
# click with the same shapes must not re-trace (the jit wrapper would be a
# fresh object each call otherwise, and tracing alone costs seconds at 512^2).
# lr is NOT part of the key — it rides inside opt_state via inject_hyperparams.
_PROGRAM_CACHE: dict = {}


def _fused_program(cfg: TrainConfig, cap_tr: int, cap_va: int,
                   mesh_key, batch_sharding, epochs: int = 1):
    key = (cfg.architecture, cfg.encoder_name, cfg.pretrained,
           cfg.num_channels, cfg.num_classes, cfg.loss_function_name,
           cap_tr, cap_va, cfg.batch_size, mesh_key, epochs)
    if key not in _PROGRAM_CACHE:
        from .fused_train import make_fused_train_fn

        model = build_model(architecture=cfg.architecture,
                            encoder_name=cfg.encoder_name,
                            num_channels=cfg.num_channels,
                            num_classes=cfg.num_classes,
                            pretrained=cfg.pretrained)
        loss_fn = M.loss_name_to_function(cfg.loss_function_name)
        optimizer = optax.inject_hyperparams(optax.adamw)(learning_rate=1e-4)
        fn = make_fused_train_fn(model, loss_fn, optimizer,
                                 n_train=cap_tr, n_val=cap_va,
                                 batch_size=cfg.batch_size, epochs=epochs,
                                 batch_sharding=batch_sharding)
        _PROGRAM_CACHE[key] = (model, optimizer, fn)
    return _PROGRAM_CACHE[key]


# Device-resident resume cache: the last run's best params + config, still
# on device.  A resume click in the same process then skips the WHOLE
# checkpoint round-trip — waiting for the 31 MB d2h, the file write, the
# file read, AND the 31 MB h2d re-upload — and starts from an on-device
# copy.  The file stays the cross-process contract (the background save
# still writes it; predict in the app process reads it).  The cache is
# valid while our own background write is in flight (nobody can have
# written a newer file we should prefer) or while the file's stat still
# matches what our write produced; any external overwrite invalidates it.
_RESUME_CACHE: dict = {}


def _resume_cache_valid(entry, model_path: Path) -> bool:
    if entry["thread"].is_alive():
        return True
    stat = entry["stat_out"].get("stat")
    if stat is None:  # write failed
        return False
    try:
        st = model_path.stat()
    except OSError:
        return False
    return (st.st_mtime_ns, st.st_size) == stat


# Device dataset buffers cached per (file fingerprint, classes, batch, mesh):
# a retrain click without new samples skips TIFF decode, stacking, and the
# ~20-40 MB host->device upload entirely.  (The fused fn never donates the
# data args, so reuse is safe.)
_DATA_CACHE: dict = {}


def _dataset_fingerprint(root: Path):
    import glob as g
    import os

    files = []
    for sub in ("train", "val"):
        for kind in ("images", "masks", "weights"):
            for f in sorted(g.glob(str(root / "data" / sub / kind / "*.tiff"))):
                files.append((f, os.path.getmtime(f)))
    return tuple(files)


def _load_device_dataset(root: Path, num_classes: int, batch_size: int,
                         reslice, reslice_factor, mesh_key, rep):
    """-> (data tuple on device, n_tr, n_va, cap_tr, cap_va)."""
    cacheable = not reslice  # resliced extras are freshly random every run
    fp = None
    if cacheable:
        fp = (str(root), _dataset_fingerprint(root), num_classes, batch_size,
              mesh_key)
        if fp in _DATA_CACHE:
            return _DATA_CACHE[fp]

    from .loader import assemble_training_set
    from .fused_train import capacity_bucket, pad_to_capacity

    train_ann = assemble_training_set("train", num_classes, reslice,
                                      reslice_factor, root)
    val_ann = samples.load_annotations("val", root)
    if not train_ann:
        raise RuntimeError("no training samples saved yet")

    x_tr, y_tr, w_tr = _stack(train_ann, num_classes)
    x_va, y_va, w_va = _stack(val_ann, num_classes)
    n_tr, n_va = len(x_tr), len(x_va)
    cap_tr = capacity_bucket(n_tr, batch_size)
    cap_va = capacity_bucket(n_va, batch_size)
    x_tr, y_tr, w_tr = pad_to_capacity((x_tr, y_tr, w_tr), cap_tr)
    x_va, y_va, w_va = pad_to_capacity((x_va, y_va, w_va), cap_va)

    data = tuple(jax.device_put(jnp.asarray(a), rep) if rep is not None
                 else jnp.asarray(a)
                 for a in (x_tr, y_tr, w_tr, x_va, y_va, w_va))
    out = (data, n_tr, n_va, cap_tr, cap_va)
    if cacheable:
        _DATA_CACHE.clear()
        _DATA_CACHE[fp] = out
    return out


def train_model(lr=1e-4, batch_size=1, epochs=10, num_channels=1,
                num_classes=2, loss_function_name="MCC + CE",
                architecture="U-Net", encoder_name="cnn_m", pretrained=False,
                root=".", mesh=None, seed=0, progress=None,
                reslice=False, reslice_factor=2):
    """One-shot (re)training run. Returns the history dict of the run."""
    root = Path(root)

    cfg = TrainConfig(lr=lr, batch_size=batch_size, epochs=epochs,
                      num_channels=num_channels, num_classes=num_classes,
                      loss_function_name=loss_function_name,
                      architecture=architecture, encoder_name=encoder_name,
                      pretrained=pretrained)

    # resume from checkpoint if present (architecture comes from the ckpt).
    # Fast path: the last run's best params are still on device in this
    # process (_RESUME_CACHE) — no file wait, no d2h/h2d round-trip.
    model_path = root / "model" / "model.ckpt"
    cache = _RESUME_CACHE.get(str(model_path.resolve()))
    resume_params = None
    state_dict = None
    if cache is not None and _resume_cache_valid(cache, model_path):
        resume = True
        resume_params = cache["params"]
        old_cfg = cache["cfg"]
    else:
        # a previous click's background save must land before the resume
        # check reads (or misses) the file
        ckpt_io.wait_pending()
        resume = model_path.is_file()
        if resume:
            state_dict, old_cfg = ckpt_io.load_checkpoint(model_path)
    if resume:
        cfg.architecture = old_cfg.architecture
        cfg.encoder_name = old_cfg.encoder_name
        cfg.num_classes = old_cfg.num_classes
        cfg.num_channels = old_cfg.num_channels
        # pretrained selects a structurally different encoder for importable
        # encoders (folded-BN); the checkpoint's param tree governs — incl.
        # pre-TorchMiT checkpoints whose recorded flag was a geometry no-op
        from ..models import restore_pretrained_flag
        cfg.pretrained = restore_pretrained_flag(
            cfg.encoder_name, old_cfg.pretrained,
            state_dict if state_dict is not None else {})
    elif cfg.pretrained:
        # only build the folded-BN encoder form when weights actually exist;
        # otherwise a norm-free random-init net would silently train badly
        from ..utils.torch_import import find_checkpoint
        if find_checkpoint(cfg.encoder_name) is None:
            print(f"pretrained=True but no local checkpoint for "
                  f"{cfg.encoder_name!r} "
                  f"(see utils/torch_import.py); using random init",
                  file=sys.stderr)
            cfg.pretrained = False

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        batch_sharding = NamedSharding(mesh, P("data"))
        replicated = NamedSharding(mesh, P())
        rep = NamedSharding(mesh, P())
        mesh_key = (tuple(mesh.shape.items()),)
    else:
        batch_sharding = None
        rep = None
        mesh_key = None

    data, n_tr, n_va, cap_tr, cap_va = _load_device_dataset(
        root, cfg.num_classes, cfg.batch_size, reslice, reslice_factor,
        mesh_key, rep)
    x_tr = data[0]

    # One fused XLA program covers the WHOLE run when nobody streams
    # per-epoch metrics (the scan body compiles once regardless of length,
    # so the program costs the same as epochs=1 — but the run is a single
    # dispatch + one device->host sync).  With a `progress` callback, one
    # program per epoch keeps the live plot semantics.  The (model,
    # optimizer, fn) triple is cached per signature so a retrain click
    # re-traces nothing either way.
    # Fixed chunk size keeps the program-cache key stable when the user
    # changes the epoch count between clicks (10 epochs = 2 chunks of 5 =
    # the SAME compiled program as 20 epochs = 4 chunks); dispatches are
    # async so extra chunks cost no round-trips.  A remainder reuses the
    # bounded {1..CHUNK-1} program set.
    CHUNK = 5
    epochs_per_call = 1 if progress is not None else min(max(cfg.epochs, 1),
                                                         CHUNK)
    model, optimizer, epoch_fn = _fused_program(cfg, cap_tr, cap_va,
                                                mesh_key, batch_sharding,
                                                epochs=epochs_per_call)
    # ^ chunks of epochs_per_call; a shorter final chunk swaps programs in
    # the loop below (bounded set, cached like any other signature)

    key = jax.random.key(seed)
    if resume and resume_params is not None:
        # device-resident resume: a device-side copy of the cached best
        # params (the cache itself must never be donated to epoch_fn)
        params = jax.tree_util.tree_map(jnp.copy, resume_params)
    elif resume:
        # no device init compute on a resume click: restore onto a shape
        # template (eval_shape runs no FLOPs) — the checkpoint provides
        # every value
        from flax import serialization
        template = jax.eval_shape(
            lambda: model.init(jax.random.key(seed + 1),
                               jnp.zeros_like(jnp.asarray(x_tr[:1]))))
        params = serialization.from_state_dict(template, state_dict)
    else:
        params = model.init(jax.random.key(seed + 1),
                            jnp.zeros_like(jnp.asarray(x_tr[:1])))
        if cfg.pretrained:
            # graft local torch ImageNet weights when available (reference
            # unet.py:28-31 capability; utils/torch_import.py for contract)
            from ..utils.torch_import import maybe_load_pretrained
            params, n_grafted = maybe_load_pretrained(params, cfg.encoder_name)
            if n_grafted:
                # stderr: the train-worker protocol owns stdout (session/app)
                print(f"pretrained: grafted {n_grafted} arrays into "
                      f"{cfg.encoder_name}", file=sys.stderr)

    opt_state = optimizer.init(params)
    # lr rides inside opt_state (inject_hyperparams), so the lr override on a
    # retrain click (reference trainer.py:32-35) reuses the compiled program
    opt_state.hyperparams["learning_rate"] = jnp.asarray(cfg.lr, jnp.float32)

    if mesh is not None:
        params = jax.device_put(params, replicated)
        opt_state = jax.device_put(opt_state, replicated)

    logger = CSVHistoryLogger(root)
    history = []
    steps_per_epoch = max(1, -(-n_tr // cfg.batch_size))

    # remove the stale checkpoint exactly like the reference (trainer.py:42-43)
    if model_path.is_file():
        model_path.unlink()

    # distinct buffers: params and best_params are both donated to epoch_fn,
    # so they must not alias on the first call
    best_params = jax.tree_util.tree_map(jnp.copy, params)
    best_val = jnp.asarray(jnp.inf)
    names = ("Loss", "Dice", "IoU", "MCC")
    # All epoch dispatches are queued WITHOUT a blocking device->host sync
    # on this thread (jax async dispatch pipelines them through the runtime;
    # a per-epoch np.asarray here would pay one tunnel round-trip per epoch
    # — measured ~0.3-1 s each).  Instead each chunk's (epochs, 8) metric
    # table is handed to a WRITER THREAD whose device_get blocks only
    # itself: metrics.csv grows per chunk DURING the run (the reference
    # streams one CSV row per epoch and the UI polls it every 2 s —
    # trainer.py:52, app.py:286), while the click's critical path stays
    # sync-free until the final best_val fetch.
    import queue as _queue
    import threading as _threading

    logs_q: _queue.Queue = _queue.Queue()
    writer_err: list = []

    def _csv_writer():
        epoch = 0
        while True:
            item = logs_q.get()
            if item is None:
                return
            try:
                rows = np.asarray(jax.device_get(item))
            except Exception as e:  # surfaced after join
                writer_err.append(e)
                return
            for row in rows:
                if epoch >= cfg.epochs:
                    break
                train_row = dict(zip(names, map(float, row[:4])))
                val_row = dict(zip(names, map(float, row[4:])))
                logger.log_epoch(epoch, (epoch + 1) * steps_per_epoch,
                                 train_row, val_row)
                history.append({"epoch": epoch, "train": train_row,
                                "val": val_row})
                epoch += 1

    writer = _threading.Thread(target=_csv_writer, daemon=True)
    writer.start()

    remaining = cfg.epochs
    while remaining > 0:
        this = min(remaining, epochs_per_call)
        if this != epochs_per_call:  # remainder chunk: its own cached program
            _, _, epoch_fn = _fused_program(cfg, cap_tr, cap_va, mesh_key,
                                            batch_sharding, epochs=this)
        key, sub = jax.random.split(key)
        params, opt_state, best_params, best_val, logs = epoch_fn(
            params, opt_state, best_params, best_val, sub, *data,
            jnp.int32(n_tr), jnp.int32(n_va))
        logs_q.put(logs)
        remaining -= this
        if progress is not None:  # explicit per-chunk sync for live callers
            row = np.asarray(logs[0])
            progress(cfg.epochs - remaining - 1, cfg.epochs,
                     dict(zip(names, map(float, row[:4]))),
                     dict(zip(names, map(float, row[4:]))))
    logs_q.put(None)
    writer.join()
    if writer_err:
        raise writer_err[0]
    best_val_host = jax.device_get(best_val)

    # persist the best-val-loss params (ModelCheckpoint semantics) in the
    # background: the 31 MB d2h + write are off the click's critical path;
    # cross-process readers join the thread before reading (checkpoint.py),
    # while same-process resume clicks take the device-resident cache below
    # and never touch the file at all
    stat_out: dict = {}
    t = ckpt_io.save_checkpoint_async(model_path, best_params, cfg, stat_out)
    _RESUME_CACHE.clear()
    _RESUME_CACHE[str(model_path.resolve())] = {
        "params": best_params, "cfg": cfg, "thread": t, "stat_out": stat_out}
    return {"history": history, "best_val_loss": float(best_val_host),
            "config": cfg}


def warm_train_program(root=".", overrides=None):
    """Compile AND first-dispatch the fused train program for the saved
    config + current dataset shapes, with throwaway parameters.

    ``overrides``: unsaved config edits (architecture/encoder_name/
    pretrained/...) from the UI's config panel — the warm-on-config-change
    path (VERDICT r4 #5) compiles the program the NEXT click will actually
    run, before the user clicks.  Ignored when a checkpoint locks the
    architecture (resume takes the ckpt's config, exactly like train_model).

    The first real Train click in a fresh worker process otherwise pays the
    tunnel TPU's first-dispatch program load (measured 30-500 s even on a
    persistent-compile-cache hit — VERDICT r2 weak #4).  Called from the
    train worker's startup thread (__main__._train_worker_loop): afterwards
    the first click reuses the exact program object from _PROGRAM_CACHE and
    the uploaded device dataset from _DATA_CACHE.

    Returns True when a program was warmed, False when there was nothing to
    warm (no saved samples yet).  Never raises.
    """
    try:
        root = Path(root)
        details = root / "model" / "model_details.json"
        cfg = (TrainConfig.from_json(details.read_text())
               if details.is_file() else TrainConfig())
        ckpt = root / "model" / "model.ckpt"
        if ckpt.is_file():  # architecture is locked by the checkpoint
            sd, old = ckpt_io.load_checkpoint(ckpt)
            cfg.architecture = old.architecture
            cfg.encoder_name = old.encoder_name
            cfg.num_classes = old.num_classes
            cfg.num_channels = old.num_channels
            from ..models import restore_pretrained_flag
            cfg.pretrained = restore_pretrained_flag(
                cfg.encoder_name, old.pretrained, sd)
        elif overrides:
            for k, v in overrides.items():
                if hasattr(cfg, k):
                    setattr(cfg, k, v)

        data, n_tr, n_va, cap_tr, cap_va = _load_device_dataset(
            root, cfg.num_classes, cfg.batch_size, False, 2, None, None)
        epochs_per_call = min(max(cfg.epochs, 1), 5)  # matches train_model
        model, optimizer, epoch_fn = _fused_program(
            cfg, cap_tr, cap_va, None, None, epochs=epochs_per_call)

        # throwaway zero params: shapes only — eval_shape runs no FLOPs
        shapes = jax.eval_shape(
            lambda: model.init(jax.random.key(0),
                               jnp.zeros_like(jnp.asarray(data[0][:1]))))
        params = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes)
        opt_state = optimizer.init(params)
        opt_state.hyperparams["learning_rate"] = jnp.asarray(cfg.lr,
                                                             jnp.float32)
        best = jax.tree_util.tree_map(jnp.copy, params)
        out = epoch_fn(params, opt_state, best, jnp.asarray(jnp.inf),
                       jax.random.key(0), *data,
                       jnp.int32(n_tr), jnp.int32(n_va))
        jax.block_until_ready(out)
        return True
    except Exception as e:
        print(f"train-program warmup skipped: {e!r}", file=sys.stderr)
        return False
