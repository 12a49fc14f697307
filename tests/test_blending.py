"""Block tiling, blending windows, reflect padding (SURVEY §4: tiling covers
the volume exactly; Gaussian window properties; reference predict.py math)."""

import numpy as np
import pytest

from interactive_unet_tpu.ops import blending


@pytest.mark.parametrize("shape,size,overlap", [
    ((64, 64, 64), 64, 0.25),
    ((100, 80, 60), 64, 0.25),
    ((128, 128, 128), 64, 0.5),
    ((40, 40, 40), 64, 0.25),   # volume smaller than block
])
def test_block_coverage(shape, size, overlap):
    block, padded, local = blending.get_block_coordinates(
        np.array(shape), input_size=size, overlap=overlap)
    counts = np.zeros(shape, dtype=int)
    for (i0, j0, k0, i1, j1, k1) in block:
        counts[i0:i1, j0:j1, k0:k1] += 1
    assert counts.min() >= 1, "tiling left holes"
    # padded block extents are always the full block size
    spans = padded[:, 3:] - padded[:, :3]
    assert (spans == size).all()
    # local coords select exactly the clipped region
    for b, p, l in zip(block, padded, local):
        assert (b[3:] - b[:3] == l[3:] - l[:3]).all()
        assert (l[:3] >= 0).all() and (l[3:] <= size).all()


def test_gaussian_window_properties():
    w = blending.gaussian_3d(64, sigma=0.125)
    assert w.shape == (64, 64, 64)
    assert w.max() == pytest.approx(1.0)
    assert w.min() >= 1e-3
    center = w[32, 32, 32]
    assert center == pytest.approx(1.0, abs=0.01)
    assert w[0, 0, 0] < center  # decays towards corners
    # separable symmetry
    np.testing.assert_allclose(w, np.transpose(w, (2, 1, 0)), atol=1e-6)


def test_hanning_window_properties():
    w = blending.hanning_3d(32)
    assert w.max() == pytest.approx(1.0)
    assert w.min() >= 1e-3


def test_padded_block_matches_numpy_reflect(rng):
    """When the requested range spans the whole volume, block-level reflect
    (the reference semantics, predict.py:291-316) equals volume-level
    reflect — checked exactly; interior fetches are plain slices."""
    vol = (rng.random((20, 24, 28)) * 255).astype(np.uint8)
    got = blending.get_padded_block(vol, -4, -2, -3, 26, 30, 33)
    expected = np.pad(vol, ((4, 6), (2, 6), (3, 5)), mode="reflect")
    np.testing.assert_array_equal(got, expected)
    # interior: no padding path
    np.testing.assert_array_equal(
        blending.get_padded_block(vol, 2, 3, 4, 10, 11, 12),
        vol[2:10, 3:11, 4:12])


def test_shard_coordinates_cover():
    coords = blending.get_shard_coordinates(np.array((65, 64, 30)), 32)
    counts = np.zeros((65, 64, 30), dtype=int)
    for (i0, j0, k0, i1, j1, k1) in coords:
        counts[i0:i1, j0:j1, k0:k1] += 1
    assert (counts == 1).all()  # exact partition, no overlap
