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
from pathlib import Path

from flax import serialization

from ..config import TrainConfig

MAGIC = b"IUTPU1\n"


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
