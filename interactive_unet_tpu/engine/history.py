"""Training-history CSV contract + aggregation (reference trainer.py:52,
utils.py:384-453).

Each training run writes ``model/history/<timestamp>/version_0/metrics.csv``
with per-epoch rows carrying ``train/{Loss,Dice,IoU,MCC}`` and
``val/{Loss,Dice,IoU,MCC}`` columns — the same shape Lightning's CSVLogger
produced, so the aggregation (concatenate runs, offset epochs) and the UI
figure reuse the identical contract.
"""

from __future__ import annotations

import csv
import glob
import time
from pathlib import Path

import numpy as np
import pandas as pd

METRIC_NAMES = ("Loss", "Dice", "IoU", "MCC")


class CSVHistoryLogger:
    def __init__(self, root: str | Path = ".", run_name: str | None = None):
        run_name = run_name or time.strftime("%Y-%m-%d_%H-%M-%S")
        self.dir = Path(root) / "model" / "history" / run_name / "version_0"
        self.dir.mkdir(parents=True, exist_ok=True)
        self.path = self.dir / "metrics.csv"
        self._rows = []
        self._fields = ["epoch", "step"] + [
            f"{split}/{m}" for split in ("train", "val") for m in METRIC_NAMES
        ]

    def log_epoch(self, epoch: int, step: int, train: dict, val: dict):
        row = {"epoch": epoch, "step": step}
        for m in METRIC_NAMES:
            if m in train:
                row[f"train/{m}"] = float(train[m])
            if m in val:
                row[f"val/{m}"] = float(val[m])
        self._rows.append(row)
        with open(self.path, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=self._fields)
            writer.writeheader()
            writer.writerows(self._rows)


def get_training_history(metric: str = "Loss", root: str | Path = "."):
    """Concatenate all runs' curves with epoch offsetting (utils.py:384-410)."""
    log_files = sorted(glob.glob(
        str(Path(root) / "model" / "history" / "*" / "version_0" / "metrics.csv")))
    epochs, train, val = [], [], []
    for log_file in log_files:
        df = pd.read_csv(log_file)
        epochs_i = df["epoch"].unique()
        train_i = df.groupby("epoch")[f"train/{metric}"].mean().values
        val_i = df.dropna(subset=[f"val/{metric}"])[f"val/{metric}"].values
        epochs_i = epochs_i + len(epochs)
        epochs += list(epochs_i)
        train += list(train_i)
        val += list(val_i)
    return np.array(epochs), np.array(train), np.array(val)


def get_training_history_figure(metric: str, root: str | Path = ".") -> dict:
    """Plotly-compatible figure dict (no plotly dependency needed —
    reference utils.py:412-453 also builds plain dicts)."""
    epochs, train, val = get_training_history(metric, root)
    data = [
        {"x": epochs.tolist(), "y": train.tolist(), "mode": "lines+markers",
         "type": "scatter", "name": "Train"},
        {"x": epochs.tolist(), "y": val.tolist(), "mode": "lines+markers",
         "type": "scatter", "name": "Validation"},
    ]
    layout = {
        "legend": {"x": 0.7, "y": 0.5},
        "margin": {"l": 40, "r": 0, "t": 30, "b": 40},
        "xaxis": {"title": {"text": "Epoch"}},
        "yaxis": {"title": {"text": metric}},
    }
    return {"data": data, "layout": layout}
