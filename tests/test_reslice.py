"""Annotation-volume re-projection + reslice training path (reference
volumedata.py:33-66 and loader.py:48-82 — functional here, defective there)."""

import numpy as np
import pytest

from interactive_unet_tpu import storage
from interactive_unet_tpu.engine import samples
from interactive_unet_tpu.engine.loader import (assemble_training_set,
                                                load_resliced_annotations)
from interactive_unet_tpu.ops import colors as C
from interactive_unet_tpu.session.volumedata import VolumeData, load_dataset

N = 48


@pytest.fixture(scope="module")
def annotated_ws(tmp_path_factory):
    root = tmp_path_factory.mktemp("ws")
    samples.create_directories(root)
    rng = np.random.default_rng(0)
    zz, yy, xx = np.mgrid[:N, :N, :N]
    r = np.sqrt((zz - N / 2) ** 2 + (yy - N / 2) ** 2 + (xx - N / 2) ** 2)
    vol = np.where(r < N / 4, 200, 60).astype(np.uint8)
    storage.create_multiscale_zarr(vol, root / "data" / "image_volumes" /
                                   "sphere.zarr", chunk_size=16, shard_size=32)
    vd = VolumeData("sphere.zarr", root=root)
    vd.slicer.rng = np.random.default_rng(7)  # deterministic origins
    for axis in ("x", "y", "z"):
        vd.randomize(sampling_mode="grid", sampling_axis=axis)
        img = vd.get_slice(slice_width=N, order=1).astype(np.uint8)
        mask = np.zeros((N, N, 3), np.uint8)
        mask[img <= 128] = C.COLORS[1]
        mask[img > 128] = C.COLORS[2]
        samples.save_sample(img.astype(float), mask,
                            {"volume": vd.filename,
                             "slicer": vd.slicer.to_dict()},
                            num_classes=2, root=root,
                            rng=np.random.default_rng(1))
    return root


def test_build_annotation_volumes(annotated_ws):
    from interactive_unet_tpu.session.volumedata import build_annotation_volumes

    dataset = load_dataset(root=annotated_ws)
    build_annotation_volumes(dataset)
    mask_vol = np.load(annotated_ws / "data" / "mask_volumes" / "sphere.npy")
    weight_vol = np.load(annotated_ws / "data" / "weight_volumes" / "sphere.npy")
    assert mask_vol.shape == (N, N, N)
    assert weight_vol.shape == (N, N, N, 2)
    assert mask_vol.max() >= 1          # class ids written
    assert weight_vol[..., 0].max() == 255   # train weights
    assert weight_vol[..., 1].max() == 255   # val weights
    # the sphere interior (class 1 in ids) should be written where annotated
    assert (mask_vol == 1).sum() > 100


def test_resliced_annotations(annotated_ws):
    ann = load_resliced_annotations("train", count=4, num_classes=2,
                                    root=annotated_ws, slice_width=N,
                                    rng=np.random.default_rng(2))
    assert len(ann) == 4
    img, cat, wt = ann[0]
    assert img.shape == (N, N, 1) and cat.shape == (N, N, 2)
    assert cat.max() <= 1.0 and wt.max() <= 1.0
    assert wt.max() > 0  # found annotated pixels


def test_assemble_with_reslice(annotated_ws):
    base = assemble_training_set("train", 2, reslice=False, root=annotated_ws)
    full = assemble_training_set("train", 2, reslice=True, reslice_factor=1,
                                 root=annotated_ws,
                                 rng=np.random.default_rng(3))
    assert len(full) == 2 * len(base)


def test_sample_batch_matches_scipy(annotated_ws):
    """Batched device reslice (one gather program for K slices) must produce
    the same voxels as scipy map_coordinates over the FULL volume for
    identical frames.  (The per-slice host path is not the oracle here: its
    reference-faithful bbox crop drops boundary taps at the crop edge.)"""
    from scipy import ndimage

    dataset = load_dataset(annotations=True, root=annotated_ws)
    vd = dataset[0]
    vd.slicer.rng = np.random.default_rng(11)
    imgs, masks, weights, dicts = vd.sample_batch(3, slice_width=N)
    assert imgs.shape == masks.shape == weights.shape == (3, N, N)
    img_vol = np.asarray(vd.image_volume[:, :, :]).astype(np.float32)
    for i, d in enumerate(dicts):
        vd.slicer.from_dict(d)
        coords = vd.slicer.get_interpolation_coords(slice_width=N)[0]
        c32 = coords.astype(np.float32).astype(np.float64)
        img_h = ndimage.map_coordinates(img_vol, c32, order=1)
        mask_h = ndimage.map_coordinates(vd.mask_volume, c32, order=0)
        w_h = ndimage.map_coordinates(vd.weight_volume[..., 0], c32, order=0)
        np.testing.assert_array_equal(masks[i], mask_h)
        np.testing.assert_array_equal(weights[i], w_h)
        # trilinear f32 vs f64: at most the uint8 rounding knife-edge
        diff = np.abs(imgs[i].astype(int)
                      - np.clip(np.round(img_h), 0, 255).astype(int))
        assert diff.max() <= 1
        assert (diff > 0).mean() < 0.005
