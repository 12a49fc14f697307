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


def test_shard_major_block_order_is_permutation():
    shape = np.array((96, 96, 96))
    _, padded, _ = blending.get_block_coordinates(shape, input_size=32,
                                                  overlap=0.25)
    shards = blending.get_shard_coordinates(shape, 32)
    order = blending.shard_major_block_order(padded, shards)
    assert sorted(order.tolist()) == list(range(len(padded)))


def test_shard_major_order_completes_shards_early():
    """The point of the permutation (VERDICT r4 #2): each shard's LAST
    intersecting block must land much earlier in traversal than under
    raster order, so the d2h stream overlaps accumulation.  Check the
    strongest property: shard completion positions are spread across the
    whole traversal (the k-th shard in raster order completes by the time
    its own group's blocks are done), instead of bunching at the end."""
    shape = np.array((128, 128, 128))
    _, padded, _ = blending.get_block_coordinates(shape, input_size=32,
                                                  overlap=0.25)
    shards = blending.get_shard_coordinates(shape, 32)
    order = blending.shard_major_block_order(padded, shards)
    inter = blending.block_shard_intersections(padded, shards)
    pos = np.empty(len(order), np.int64)
    pos[order] = np.arange(len(order))

    def completion_positions(p):
        return np.array([p[np.nonzero(inter[s])[0]].max()
                         for s in range(len(shards))])

    comp = completion_positions(pos)
    raster = completion_positions(np.arange(len(padded)))
    # shard-major visits each shard's group consecutively, so completion
    # positions are strictly increasing in shard (raster) order — shards
    # finish one after another across the WHOLE traversal, which is what
    # lets the d2h stream ride behind accumulation with no long gaps
    assert (np.diff(comp) > 0).all()
    # the first shard completes as soon as its own blocks have run — far
    # earlier than raster order manages
    first_blocks = np.nonzero(inter[0])[0]
    assert comp[0] == len(first_blocks) - 1
    assert comp[0] < raster[0]
    # and on average every shard completes no later than under raster
    assert comp.mean() <= raster.mean()
    assert comp.min() < raster.min()


def test_block_shard_intersections_every_shard_covered():
    """Invariant the streaming finalize relies on (predict.attempt_device
    asserts it): a covering block tiling intersects every output shard."""
    for shape in ((100, 80, 60), (40, 40, 40)):
        _, padded, _ = blending.get_block_coordinates(np.array(shape),
                                                      input_size=64,
                                                      overlap=0.25)
        shards = blending.get_shard_coordinates(np.array(shape), 32)
        inter = blending.block_shard_intersections(padded, shards)
        assert inter.any(axis=1).all()
