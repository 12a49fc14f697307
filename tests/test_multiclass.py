"""Multi-class (>2 labels) segmentation e2e (BASELINE config #3): softmax
head, on-device Dice/IoU, palette round-trip through save/train/predict."""

import numpy as np
import pytest

from interactive_unet_tpu import storage
from interactive_unet_tpu.engine import predict, samples, trainer
from interactive_unet_tpu.ops import colors as C
from interactive_unet_tpu.session.volumedata import VolumeData

N = 48
K = 3  # classes


@pytest.fixture(scope="module")
def ws3(tmp_path_factory):
    """Three-band phantom: class = depth band of the volume."""
    root = tmp_path_factory.mktemp("ws3")
    samples.create_directories(root)
    rng = np.random.default_rng(0)
    base = np.zeros((N, N, N), np.float32)
    base[:, :N // 3] = 60
    base[:, N // 3:2 * N // 3] = 130
    base[:, 2 * N // 3:] = 210
    vol = np.clip(base + rng.normal(0, 6, base.shape), 1, 255).astype(np.uint8)
    storage.create_multiscale_zarr(vol, root / "data" / "image_volumes" /
                                   "bands.zarr", chunk_size=16, shard_size=32)

    vd = VolumeData("bands.zarr", root=root)
    vd.slicer.rng = np.random.default_rng(5)
    for axis in ("x", "z", "x"):
        vd.randomize(sampling_mode="grid", sampling_axis=axis)
        vd.slicer.origin = np.array([N / 2.0] * 3)
        img = vd.get_slice(slice_width=N, order=1).astype(np.uint8)
        mask = np.zeros((N, N, 3), np.uint8)
        mask[img < 95] = C.COLORS[1]
        mask[(img >= 95) & (img < 170)] = C.COLORS[2]
        mask[img >= 170] = C.COLORS[3]
        samples.save_sample(img.astype(float), mask,
                            {"volume": vd.filename,
                             "slicer": vd.slicer.to_dict()},
                            num_classes=K, root=root,
                            rng=np.random.default_rng(2))
    return root, vol


def test_num_classes_inferred(ws3):
    root, _ = ws3
    assert samples.get_num_classes(root) == K


def test_multiclass_train_and_predict(ws3):
    root, vol = ws3
    r = trainer.train_model(lr=3e-3, batch_size=2, epochs=10, num_classes=K,
                            encoder_name="cnn_s", root=root, seed=0)
    assert all(np.isfinite(h["train"]["Loss"]) for h in r["history"])

    vd = VolumeData("bands.zarr", root=root)
    vd.randomize(sampling_mode="grid", sampling_axis="x")
    vd.slicer.origin = np.array([N / 2.0] * 3)
    img = vd.get_slice(slice_width=N, order=1).astype(np.uint8)
    probs = predict.predict_slice(img, num_classes=K, root=root,
                                  return_probabilities=True)
    assert probs.shape == (1, N, N, K)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-3)
    pred_ids = np.argmax(probs[0], -1)
    true_ids = np.where(img < 95, 0, np.where(img < 170, 1, 2))
    acc = (pred_ids == true_ids).mean()
    assert acc > 0.6, f"multiclass accuracy too low: {acc}"

    # colored output uses the first K palette colors
    colored = predict.predict_slice(img, num_classes=K, root=root)
    used = {tuple(c) for c in np.unique(colored.reshape(-1, 3), axis=0)}
    allowed = {tuple(C.COLORS[i + 1]) for i in range(K)}
    assert used <= allowed
