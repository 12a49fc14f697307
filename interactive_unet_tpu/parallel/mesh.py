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
    if n > len(devices):
        raise ValueError(
            f"mesh wants {n} devices but only {len(devices)} are visible "
            f"({devices[0].platform}); on CPU set "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n}")
    devices = np.array(devices[:n])
    if spatial > 1:
        if n % spatial:
            raise ValueError(f"{n} devices not divisible by spatial={spatial}")
        return Mesh(devices.reshape(n // spatial, spatial), ("data", "space"))
    return Mesh(devices, ("data",))


def parse_mesh_spec(spec: str | None) -> Mesh | None:
    """CLI/env mesh syntax (``--mesh`` / ``IUNET_MESH``) -> Mesh.

    Accepted: ``"8"`` (8-device data mesh), ``"4x2"`` (data=4, space=2),
    ``"data=4,space=2"``.  Empty / ``"0"`` / ``"off"`` / ``"1"`` -> None
    (single-device paths; a 1-device mesh only adds partitioner overhead).
    """
    s = (spec or "").strip().lower()
    if s in ("", "0", "1", "off", "none", "no"):
        return None
    try:
        if "=" in s:
            kv = dict(p.split("=", 1) for p in s.split(","))
            unknown = set(kv) - {"data", "space"}
            if unknown:
                raise ValueError(f"unknown mesh axes {sorted(unknown)}")
            data, space = int(kv.get("data", 1)), int(kv.get("space", 1))
        elif "x" in s:
            data, space = (int(v) for v in s.split("x", 1))
        else:
            data, space = int(s), 1
    except ValueError as e:
        raise ValueError(
            f"bad mesh spec {spec!r} (want N, NxM, or data=N,space=M): {e}"
        ) from None
    return make_mesh(data * space, spatial=space)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H, W, C) batches: B over 'data', H over 'space' if present."""
    if "space" in mesh.axis_names:
        return NamedSharding(mesh, P("data", "space"))
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
