"""End-to-end integration (SURVEY §4): synthetic sphere phantom -> scripted
annotations -> save samples -> train -> slice predict -> full-volume predict
-> Dice above threshold; checkpoint resume continues training."""

import glob
import numpy as np
import pytest

from interactive_unet_tpu import storage
from interactive_unet_tpu.engine import predict, samples, trainer
from interactive_unet_tpu.engine.history import get_training_history
from interactive_unet_tpu.ops import colors as C
from interactive_unet_tpu.session.volumedata import VolumeData


N = 64  # volume + input size


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    """Workspace with a sphere phantom volume and 4 scripted annotations."""
    root = tmp_path_factory.mktemp("ws")
    samples.create_directories(root)

    # sphere phantom: bright ball in dark noise
    rng = np.random.default_rng(0)
    zz, yy, xx = np.mgrid[:N, :N, :N]
    r = np.sqrt((zz - N / 2) ** 2 + (yy - N / 2) ** 2 + (xx - N / 2) ** 2)
    vol = np.where(r < N / 4, 200, 60).astype(np.float32)
    vol += rng.normal(0, 5, vol.shape)
    vol = np.clip(vol, 1, 255).astype(np.uint8)  # keep 0 = out-of-volume
    storage.create_multiscale_zarr(vol, root / "data" / "image_volumes" /
                                   "sphere.zarr", chunk_size=32, shard_size=32)

    vd = VolumeData("sphere.zarr", root=root)
    vd.slicer.rng = np.random.default_rng(7)  # deterministic origins
    rng2 = np.random.default_rng(1)
    for axis_name in ("x", "y", "z", "x"):
        vd.randomize(sampling_mode="grid", sampling_axis=axis_name)
        img = vd.get_slice(slice_width=N, order=1).astype(np.uint8)
        # scripted perfect annotator: threshold -> 2 classes
        mask = np.zeros((N, N, 3), dtype=np.uint8)
        mask[img <= 128] = C.COLORS[1]
        mask[img > 128] = C.COLORS[2]
        # sparsify: only annotate ~40% of pixels (strokes, not full fill)
        keep = rng2.random((N, N)) < 0.4
        mask[~keep] = 0
        slice_data = {"volume": vd.filename, "slicer": vd.slicer.to_dict()}
        samples.save_sample(img.astype(float), mask, slice_data,
                            num_classes=2, root=root, rng=rng2)
    return root


def test_samples_on_disk(workspace):
    assert len(glob.glob(str(workspace / "data/train/images/*.tiff"))) == 4
    assert len(glob.glob(str(workspace / "data/val/weights/*.tiff"))) == 4
    assert samples.get_input_size(workspace) == N
    assert samples.get_num_classes(workspace) == 2
    ann = samples.load_annotations("train", workspace)
    assert len(ann) == 4
    img, mask, wt = ann[0]
    assert img.shape == (N, N, 1) and mask.shape == (N, N, 2)
    # train/val weights are disjoint on labeled pixels
    val = samples.load_annotations("val", workspace)
    overlap = (wt[..., 0] > 0) & (val[0][2][..., 0] > 0)
    assert overlap.mean() < 0.01


@pytest.fixture(scope="module")
def trained(workspace):
    """One shared 20-epoch training run."""
    return trainer.train_model(lr=3e-3, batch_size=4, epochs=20,
                               num_classes=2, architecture="U-Net",
                               encoder_name="cnn_s", root=workspace, seed=0)


def test_train_predict_cycle(workspace, trained):
    from interactive_unet_tpu.engine import checkpoint as ckpt_io

    result = trained
    ckpt_io.wait_pending()  # the click returns before the background save
    assert (workspace / "model" / "model.ckpt").is_file()
    losses = [h["train"]["Loss"] for h in result["history"]]
    assert min(losses[-3:]) < losses[0]  # learning happened

    # CSV history contract
    epochs, train, val = get_training_history("Loss", workspace)
    assert len(epochs) == 20 and len(train) == 20 and len(val) == 20

    # slice prediction on a held-out slice through the volume center (a
    # random origin can miss the sphere entirely, making dice meaningless)
    vd = VolumeData("sphere.zarr", root=workspace)
    vd.randomize(sampling_mode="grid", sampling_axis="y")
    vd.slicer.origin = np.array([N / 2.0] * 3)
    img = vd.get_slice(slice_width=N, order=1).astype(np.uint8)
    colored = predict.predict_slice(img, num_classes=2, root=workspace)
    assert colored.shape == (N, N, 3)
    probs = predict.predict_slice(img, num_classes=2, root=workspace,
                                  return_probabilities=True)
    pred_ids = np.argmax(probs[0], -1)
    true_ids = (img > 128).astype(int)
    inter = ((pred_ids == 1) & (true_ids == 1)).sum()
    dice = 2 * inter / ((pred_ids == 1).sum() + (true_ids == 1).sum() + 1e-9)
    assert dice > 0.5, f"slice dice too low: {dice}"


def test_resume_continues(workspace, trained):
    """Second train run resumes from ckpt (reference trainer.py:32-35)."""
    r2 = trainer.train_model(lr=1e-3, batch_size=4, epochs=2, num_classes=2,
                             architecture="U-Net", encoder_name="cnn_s",
                             root=workspace, seed=1)
    # resumed: loss starts near previous best, not from-scratch levels
    assert r2["history"][0]["train"]["Loss"] < 1.5
    # history aggregation now spans both runs with offset epochs
    epochs, train, val = get_training_history("Loss", workspace)
    assert len(epochs) == 22


def test_full_volume_predict(workspace, trained):
    res = predict.predict_volumes(input_size=N, num_classes=2, root=workspace,
                                  batch_size=16, shard_size=32, chunk_size=32)
    assert len(res) == 1
    out = storage.read_volume(workspace / "data" / "predicted_volumes" /
                              "sphere.zarr", level=0)
    assert out.shape == (N, N, N, 2)
    pred = np.asarray(out[:, :, :, :])
    ids = np.argmax(pred, -1)
    vol = storage.read_volume(workspace / "data" / "image_volumes" /
                              "sphere.zarr", level=0)[:, :, :]
    true_ids = (vol > 128).astype(int)
    inter = ((ids == 1) & (true_ids == 1)).sum()
    dice = 2 * inter / ((ids == 1).sum() + (true_ids == 1).sum() + 1e-9)
    assert dice > 0.5, f"volume dice too low: {dice}"
    # multiscale pyramid exists
    root_group = storage.open(workspace / "data" / "predicted_volumes" /
                              "sphere.zarr")
    assert len(root_group.array_keys()) >= 2
