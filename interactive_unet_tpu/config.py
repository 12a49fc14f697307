"""Typed configuration for the framework.

The reference has no config system (SURVEY §5.6): configuration is UI widget
state plus values inferred from saved data (input size from the first mask's
shape, utils.py:148-158; num_classes from unique colors - 1, utils.py:160-170).
Here the same knobs live in one explicit dataclass, with the same
inference-from-data fallbacks implemented in engine/samples.py
(get_num_classes / get_input_size).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any

# Class palette size of the reference UI (app.py:162 caps classes at 10).
MAX_CLASSES = 10


@dataclasses.dataclass
class TrainConfig:
    """Knobs of reference trainer.train_model (trainer.py:12-19)."""

    lr: float = 1e-4
    batch_size: int = 1
    epochs: int = 10
    num_channels: int = 1
    num_classes: int = 2
    loss_function_name: str = "MCC + CE"
    architecture: str = "U-Net"
    encoder_name: str = "cnn_m"
    pretrained: bool = False
    # Reslice augmentation: extend the training set with fresh random
    # oriented reslices of the annotation volumes (the reference wires this
    # in loader.py:48-82 but its UNetDataset never indexes the resliced
    # list, so the feature is dead there; here it works end-to-end and adds
    # reslice_factor x len(samples) extra views per run).
    reslice: bool = False
    reslice_factor: int = 2
    # TPU additions
    compute_dtype: str = "bfloat16"  # reference uses 16-mixed (trainer.py:59)
    data_parallel: int = 1           # mesh size along the batch axis

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))

    @classmethod
    def from_json(cls, text: str) -> "TrainConfig":
        d = json.loads(text)
        known = {f.name for f in dataclasses.fields(cls)}
        cfg = cls(**{k: v for k, v in d.items() if k in known})
        if cfg.encoder_name:
            # saved reference configs carry smp spellings verbatim
            # (e.g. 'timm-efficientnet-b3'); fold them to the ladder name
            from .models.registry import normalize_encoder_name

            cfg.encoder_name = normalize_encoder_name(cfg.encoder_name)
        return cfg


@dataclasses.dataclass
class PredictConfig:
    """Knobs of reference predict.predict_volumes (predict.py:114)."""

    input_size: int = 256
    num_channels: int = 1
    num_classes: int = 2
    overlap: float = 0.25
    chunk_size: int = 128
    shard_size: int = 256
    batch_size: int | None = None
    axes: tuple[int, ...] = (0, 1, 2)


@dataclasses.dataclass
class WorkspaceConfig:
    """Filesystem contract of the reference (SURVEY §1 directory layout)."""

    root: str = "."

    @property
    def root_path(self) -> Path:
        return Path(self.root)

    def path(self, *parts: str) -> Path:
        return self.root_path.joinpath(*parts)


def dataclass_replace(cfg: Any, **kw: Any) -> Any:
    return dataclasses.replace(cfg, **kw)
