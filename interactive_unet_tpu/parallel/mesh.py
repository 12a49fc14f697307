"""Mesh construction + sharding helpers."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, spatial: int = 1) -> Mesh:
    """1-D ``data`` mesh, or 2-D ``(data, space)`` when ``spatial > 1``.

    ``space`` shards the image H dimension — GSPMD emits the conv halo
    exchanges automatically, riding ICI.
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = np.array(devices[:n])
    if spatial > 1:
        if n % spatial:
            raise ValueError(f"{n} devices not divisible by spatial={spatial}")
        return Mesh(devices.reshape(n // spatial, spatial), ("data", "space"))
    return Mesh(devices, ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H, W, C) batches: B over 'data', H over 'space' if present."""
    if "space" in mesh.axis_names:
        return NamedSharding(mesh, P("data", "space"))
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
