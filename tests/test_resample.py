"""Voxel-exact parity of the device resampler vs scipy.ndimage.map_coordinates
(SURVEY §4 parity tests; reference slicer.py:224, annotator.py:267)."""

import numpy as np
import pytest
from scipy import ndimage

from interactive_unet_tpu.ops import resample


@pytest.mark.parametrize("order", [0, 1])
@pytest.mark.parametrize("dtype", [np.float32, np.uint8])
def test_3d_parity_random_coords(rng, order, dtype):
    vol = (rng.random((13, 17, 11)) * 255).astype(dtype)
    # coords spanning inside, boundary and outside
    coords = (rng.random((3, 40, 40)) * 1.4 - 0.2) * np.array([13, 17, 11])[:, None, None]
    expected = ndimage.map_coordinates(vol.astype(np.float32), coords, order=order)
    got = resample.map_coordinates_3d(vol.astype(np.float32), coords, order=order)
    np.testing.assert_allclose(got, expected, atol=1e-3, rtol=1e-5)


@pytest.mark.parametrize("order", [0, 1])
def test_3d_parity_uint8_roundtrip(rng, order):
    vol = (rng.random((9, 9, 9)) * 255).astype(np.uint8)
    coords = rng.random((3, 25, 25)) * 8.0
    expected = ndimage.map_coordinates(vol, coords, order=order)
    got = resample.map_coordinates_3d(vol, coords, order=order)
    # scipy rounds splines back to uint8; allow off-by-one on exact .5 floats
    assert np.mean(np.abs(got.astype(int) - expected.astype(int)) <= 1) > 0.999
    assert got.dtype == np.uint8


@pytest.mark.parametrize("order", [0, 1])
def test_3d_edge_semantics(order):
    vol = np.arange(5 * 5 * 5, dtype=np.float32).reshape(5, 5, 5) + 10
    xs = np.array([-1.0, -0.5, -0.01, 0.0, 2.5, 3.99, 4.0, 4.01, 4.5])
    coords = np.stack([xs, np.full_like(xs, 2.0), np.full_like(xs, 2.0)])[:, :, None]
    expected = ndimage.map_coordinates(vol, coords, order=order)
    got = resample.map_coordinates_3d(vol, coords, order=order)
    np.testing.assert_allclose(got, expected, atol=1e-4)


@pytest.mark.parametrize("order", [0, 1])
def test_2d_parity(rng, order):
    img = (rng.random((33, 21)) * 255).astype(np.float32)
    coords = (rng.random((2, 50, 50)) * 1.2 - 0.1) * np.array([33, 21])[:, None, None]
    expected = ndimage.map_coordinates(img, coords, order=order)
    got = resample.map_coordinates_2d(img, coords, order=order)
    np.testing.assert_allclose(got, expected, atol=1e-3, rtol=1e-5)


def test_size_one_axis():
    vol = np.ones((1, 4, 4), dtype=np.float32) * 7
    coords = np.zeros((3, 2, 2))
    coords[1:] = 1.5
    expected = ndimage.map_coordinates(vol, coords, order=1)
    got = resample.map_coordinates_3d(vol, coords, order=1)
    np.testing.assert_allclose(got, expected, atol=1e-5)
