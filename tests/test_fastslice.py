"""Packed single-gather slicer: exact parity with scipy map_coordinates."""

import numpy as np
import pytest
from scipy import ndimage

from interactive_unet_tpu.ops.fastslice import PackedVolume
from interactive_unet_tpu.ops.slicer import Slicer


@pytest.mark.parametrize("order", [0, 1])
def test_parity_random_coords(rng, order):
    vol = (rng.random((33, 37, 41)) * 255).astype(np.uint8)
    pv = PackedVolume(vol)
    coords = (rng.random((3, 30, 30)) * 1.3 - 0.15) * \
        np.array([33, 37, 41])[:, None, None]
    expected = ndimage.map_coordinates(vol.astype(np.float32), coords,
                                       order=order)
    got = np.asarray(pv.extract(coords, order=order))
    np.testing.assert_allclose(got, expected, atol=1e-3)


@pytest.mark.parametrize("order", [0, 1])
def test_parity_oriented_slices(rng, order):
    vol = (rng.random((48, 48, 48)) * 255).astype(np.uint8)
    pv = PackedVolume(vol)
    sl = Slicer(vol.shape, seed=3)
    for _ in range(5):
        sl.randomize()
        coords = sl.get_interpolation_coords(slice_width=32)[0]
        expected = ndimage.map_coordinates(vol.astype(np.float32), coords,
                                           order=order)
        got = np.asarray(pv.extract(coords, order=order))
        np.testing.assert_allclose(got, expected, atol=1e-3)


def test_z_block_boundaries(rng):
    """Sample exactly at and across the z-packing block boundaries."""
    vol = (rng.random((8, 8, 97)) * 255).astype(np.uint8)
    pv = PackedVolume(vol)
    zs = np.array([28.9, 29.0, 29.5, 30.0, 30.1, 59.9, 60.0, 89.9, 95.0, 95.9])
    coords = np.stack([np.full_like(zs, 3.3), np.full_like(zs, 4.7), zs])
    expected = ndimage.map_coordinates(vol.astype(np.float32), coords, order=1)
    got = np.asarray(pv.extract(coords, order=1))
    np.testing.assert_allclose(got, expected, atol=1e-3)


def test_small_volume():
    vol = np.arange(2 * 2 * 2, dtype=np.uint8).reshape(2, 2, 2) * 10
    pv = PackedVolume(vol)
    coords = np.array([[0.5], [0.5], [0.5]])
    expected = ndimage.map_coordinates(vol.astype(np.float32), coords, order=1)
    got = np.asarray(pv.extract(coords, order=1))
    np.testing.assert_allclose(got, expected, atol=1e-3)
