"""Slicer geometry: orthonormality, serialization round-trip, scipy parity of
get_slice, and get_slice <-> update_volume consistency (SURVEY §4)."""

import numpy as np
import pytest
from scipy import ndimage

from interactive_unet_tpu.ops.slicer import Slicer


def test_frame_orthonormal():
    s = Slicer((64, 64, 64), seed=0)
    for _ in range(20):
        s.randomize()
        for vec in (s.u, s.v, s.w):
            assert np.linalg.norm(vec) == pytest.approx(1.0, abs=1e-9)
        assert abs(np.dot(s.u, s.v)) < 1e-9
        assert abs(np.dot(s.u, s.w)) < 1e-9
        assert abs(np.dot(s.v, s.w)) < 1e-9


def test_dict_roundtrip():
    s = Slicer((32, 48, 64), seed=1)
    s.randomize()
    d = s.to_dict()
    s2 = Slicer((1, 1, 1))
    s2.from_dict(d)
    np.testing.assert_allclose(s2.origin, s.origin)
    np.testing.assert_allclose(s2.u, s.u, atol=1e-12)
    np.testing.assert_allclose(s2.v, s.v, atol=1e-12)
    np.testing.assert_allclose(s2.w, s.w, atol=1e-12)


@pytest.mark.parametrize("order", [0, 1])
@pytest.mark.parametrize("mode", ["random", "grid"])
def test_get_slice_matches_scipy(rng, order, mode):
    vol = (rng.random((40, 40, 40)) * 255).astype(np.float32)
    s = Slicer(vol.shape, seed=2)
    for _ in range(5):
        s.randomize(sampling_mode=mode)
        got = s.get_slice(vol, axis=0, slice_width=32, order=order)

        # ground truth: scipy on the FULL volume (no bbox).  The bbox path
        # must match it voxel-for-voxel: its floor(max)+2 upper bound keeps
        # every interpolation neighbor inside the slab (the reference's
        # ceil-based bbox, slicer.py:205, drops the edge neighbor and
        # bleeds cval=0 into boundary samples — fixed here, round 3).
        coords = s.get_interpolation_coords(slice_width=32)[0]
        expected = ndimage.map_coordinates(vol, coords, order=order)
        np.testing.assert_allclose(got, expected, atol=1e-3)


def test_update_volume_roundtrip():
    """A written slice must read back exactly at order=0 (same orientation)."""
    s = Slicer((64, 64, 64), seed=3)
    s.randomize()
    data = (np.random.default_rng(0).random((32, 32)) * 250 + 1).astype(np.uint8)
    vol = np.zeros((64, 64, 64), dtype=np.uint8)
    s.update_volume(data, vol, axis=0)
    back = s.get_slice(vol, axis=0, slice_width=32, order=0)
    # nearest-voxel rasterization collides at voxel centers (write-back uses
    # banker's rounding, nearest read uses floor(x+0.5) — same asymmetry as
    # the reference np.round/scipy pair); most pixels must round-trip exactly
    assert np.mean(back == data) > 0.85


def test_origin_candidates_class_balance():
    vol = np.zeros((16, 16, 16), dtype=np.uint8)
    vol[:2, :2, :2] = 1
    s = Slicer(vol.shape, seed=4)
    candidates, weights = s.get_origin_candidates(vol)
    assert len(candidates) == 2
    assert weights[1] > weights[0]  # rarer class more likely
    assert weights.sum() == pytest.approx(1.0)


def test_shift_origin_moves_along_frame():
    s = Slicer((64, 64, 64), seed=5)
    s.randomize()
    before = s.origin.copy()
    s.shift_origin([1, 0, 0])
    np.testing.assert_allclose(s.origin - before, s.rot_mat @ np.array([1.0, 0, 0]))
