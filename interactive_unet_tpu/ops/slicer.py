"""Oriented-slice geometry core (reference slicer.py:8-269, re-designed).

Geometry (Rodrigues frames, coordinate grids, origin sampling) is cheap 3x3
host math and stays numpy; the hot voxel path — trilinear/nearest extraction
of an arbitrarily-oriented plane — runs on device through
``ops.resample`` (single fused XLA gather over a flat HBM buffer) instead of
scipy's C ``map_coordinates`` (reference slicer.py:224-226).

Behavioral parity preserved:
- uniform random unit normal (slicer.py:37-53)
- Rodrigues rotation from [1,0,0] with eps-perturbation (slicer.py:141-156)
- u/v/w frame and the three per-axis coordinate grids (slicer.py:94-115)
- zarr bounding-box fetch with clamping and the grid-mode +1 axis fix
  (slicer.py:204-221)
- origin sampling uniform in the middle 80% or from class-balanced
  candidates (slicer.py:158-194)
- nearest-voxel scatter write-back ``update_volume`` (slicer.py:230-257)
- ``to_dict``/``from_dict`` serialization contract (slicer.py:75-92)
"""

from __future__ import annotations

import numpy as np

from . import resample


def generate_uniform_unit_vector(rng: np.random.Generator | None = None, ndim: int = 3):
    """Uniformly random unit vector (Gaussian-normalize method)."""
    rng = rng or np.random.default_rng()
    u = rng.normal(size=ndim)
    while np.linalg.norm(u) < 1e-4:
        u = rng.normal(size=ndim)
    return u / np.linalg.norm(u)


def rotation_matrix_from_vectors(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Rodrigues rotation matrix taking ``src`` to ``dst``."""
    src = src / np.linalg.norm(src)
    dst = dst / np.linalg.norm(dst)
    v = np.cross(src, dst)
    s = np.linalg.norm(v)
    c = np.dot(src, dst)
    v_mat = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    return np.eye(3) + v_mat + v_mat @ v_mat * ((1 - c) / (s**2))


class Slicer:
    """Extracts / writes arbitrarily-oriented slices of a 3-D volume."""

    def __init__(self, volume_shape=(512, 512, 512), seed: int | None = None):
        self.volume_shape = np.array(volume_shape)
        self.rng = np.random.default_rng(seed)
        self.update_orientation_vectors(np.array([1, 0, 0]))
        self.origin = self.volume_shape / 2
        self._normalize_vectors()
        self.sampling_axis = "random"

    # -- frame bookkeeping -------------------------------------------------

    def _normalize_vectors(self):
        self.rot_vec = np.around(self.rot_vec, decimals=15)
        self.u = np.around(self.u, decimals=15)
        self.v = np.around(self.v, decimals=15)
        self.w = np.around(self.w, decimals=15)
        self.rot_vec = self.rot_vec / np.linalg.norm(self.rot_vec)
        self.u = self.u / np.linalg.norm(self.u)
        self.v = self.v / np.linalg.norm(self.v)
        self.w = self.w / np.linalg.norm(self.w)

    def update_orientation_vectors(self, rotation_vector, eps=np.finfo(float).eps):
        self.rot_vec = rotation_vector.astype(float)
        rv = rotation_vector.astype(float) + np.ones(3) * eps
        rot = rotation_matrix_from_vectors(np.array([1, 0, 0]), rv)
        rot = np.around(rot, decimals=15)
        self.u = rv
        self.v = rot @ np.array([0, 1, 0])
        self.w = rot @ np.array([0, 0, 1])
        self.rot_mat = rot
        self._normalize_vectors()

    def to_dict(self) -> dict:
        return {
            "RotationVector": self.rot_vec.tolist(),
            "RotationMatrix": self.rot_mat.tolist(),
            "Origin": self.origin.tolist(),
            "VolumeShape": self.volume_shape.tolist(),
        }

    def from_dict(self, d: dict):
        self.rot_vec = np.array(d["RotationVector"])
        self.rot_mat = np.array(d["RotationMatrix"])
        self.origin = np.array(d["Origin"])
        self.volume_shape = np.array(d["VolumeShape"])
        self.update_orientation_vectors(self.rot_vec)

    # -- coordinate grids --------------------------------------------------

    def get_interpolation_coords(self, slice_width: int = 256) -> np.ndarray:
        """(3, 3, S, S) grids — one (axis-dependent) plane grid per view axis."""
        start = int(-np.floor(slice_width / 2))
        end = start + slice_width
        r = np.linspace(start, end - 1, slice_width)

        def plane(a, b):
            return (
                a[:, None, None] * r[None, :, None]
                + b[:, None, None] * r[None, None, :]
                + self.origin[:, None, None]
            )

        return np.array([plane(self.v, self.w), plane(self.u, self.w), plane(self.u, self.v)])

    # -- randomization -----------------------------------------------------

    def get_origin_candidates(self, volume: np.ndarray):
        """Per-class voxel positions + inverse-frequency weights for balancing."""
        classes = np.unique(volume)
        candidates = [np.argwhere(volume == c) for c in classes]
        counts = np.array([c.shape[0] for c in candidates])
        class_weights = np.max(counts) / counts
        class_weights = class_weights / np.sum(class_weights)
        return candidates, class_weights

    def randomize(self, candidates=None, class_weights=None, origin_shift_range=0.8,
                  sampling_mode="random", sampling_axis="random"):
        if sampling_mode == "grid":
            if sampling_axis == "random":
                self.sampling_axis = "xyz"[int(self.rng.integers(3))]
            else:
                self.sampling_axis = sampling_axis
            rotation_vector = {
                "x": np.array([1, 0, 0]),
                "y": np.array([0, 1, 0]),
                "z": np.array([0, 0, 1]),
            }[self.sampling_axis]
        elif sampling_mode == "random":
            rotation_vector = generate_uniform_unit_vector(self.rng)
        else:
            raise ValueError('sampling_mode must be "random" or "grid".')

        self.update_orientation_vectors(rotation_vector)

        if candidates is not None:
            n_classes = len(candidates)
            if class_weights is None:
                class_weights = np.ones(n_classes) / n_classes
            cls = self.rng.choice(np.arange(n_classes), p=class_weights)
            ind = int(self.rng.integers(candidates[cls].shape[0]))
            self.origin = candidates[cls][ind]
        else:
            origin = self.rng.random(3) * self.volume_shape
            origin *= origin_shift_range
            origin += self.volume_shape * (1 - origin_shift_range)
            self.origin = origin

        return self.rot_vec, self.u, self.v, self.w, self.origin

    # -- extraction / write-back -------------------------------------------

    def get_slice(self, volume, axis: int = 0, slice_width: int = 256, order: int = 0):
        """Extract the oriented slice from ``volume`` (array or zarr array).

        Host computes the bbox, fetches only that block (zarr chunk reads),
        then the device does the trilinear/nearest gather.
        """
        coords = self.get_interpolation_coords(slice_width=slice_width)[axis]

        lower = np.floor(np.min(coords, axis=(1, 2))).astype(int)
        # Exclusive upper bound floor(max)+2: trilinear interpolation at a
        # coordinate c reads voxels floor(c) AND floor(c)+1, so the slab
        # must include index floor(max)+1.  The reference uses ceil(max)
        # (slicer.py:205) — which drops that neighbor voxel (cval=0 bleed at
        # the bbox edge) and makes exactly-axis-aligned planes a DEGENERATE
        # slab, patched there by a per-axis +1 hack (slicer.py:216-221).
        # floor+2 subsumes both cases.
        upper = np.floor(np.max(coords, axis=(1, 2))).astype(int) + 2
        i0, j0, k0 = lower
        i1, j1, k1 = upper
        i0, i1 = max(0, i0), min(volume.shape[0], i1)
        j0, j1 = max(0, j0), min(volume.shape[1], j1)
        k0, k1 = max(0, k0), min(volume.shape[2], k1)
        # (the reference's grid-mode +1 special case, slicer.py:216-221, is
        # subsumed by the floor+1 upper bound above: an exactly-axis-aligned
        # integer-coordinate plane already includes its voxel slab)

        shift = np.array([i0, j0, k0], dtype=float)
        block = volume[i0:i1, j0:j1, k0:k1]
        local = coords - shift[:, None, None]
        if getattr(block, "ndim", 3) == 4:  # multi-channel volume -> (S,S,C)
            return np.stack([resample.map_coordinates_3d(
                np.asarray(block[..., c]), local, order=order)
                for c in range(block.shape[-1])], axis=-1)
        return resample.map_coordinates_3d(block, local, order=order)

    def update_volume(self, data, volume, axis: int = 0):
        """Nearest-voxel scatter of a 2-D slice back into a 3-D volume."""
        coords = self.get_interpolation_coords(slice_width=data.shape[0])
        sc = np.round(coords[axis]).reshape((3, -1)).astype(int)
        sc = np.array([np.clip(sc[i], 0, volume.shape[i] - 1) for i in range(3)])
        if data.ndim == 2:
            flat = data.ravel()
        else:
            flat = data.reshape((data.shape[0] * data.shape[1], data.shape[2]))
        volume[sc[0], sc[1], sc[2]] = flat
        return volume

    def shift_origin(self, shift_amount=(0, 0, 0)):
        self.origin = self.origin + self.rot_mat @ np.asarray(shift_amount, dtype=float)
