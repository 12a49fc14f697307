"""Zero-weight batches (empty augmentation crops) must never produce NaN
losses — the failure mode that permanently corrupts optimizer state."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from interactive_unet_tpu.ops import metrics as M


@pytest.mark.parametrize("name", list(M.LOSSES))
def test_zero_weight_losses_finite(name):
    loss_fn = M.LOSSES[name]
    y_pred = jnp.full((1, 8, 8, 2), 0.5)
    y_true = jnp.zeros((1, 8, 8, 2))
    w = jnp.zeros((1, 8, 8, 2))
    val = loss_fn(y_pred, y_true, w, (0, 1, 2))
    assert np.isfinite(float(val)), f"{name} NaN on zero-weight batch"


def test_zero_weight_gradients_finite():
    from interactive_unet_tpu.models import build_model

    model = build_model(architecture="U-Net", encoder_name="cnn_s",
                        num_classes=2)
    x = jnp.ones((1, 32, 32, 1))
    y = jnp.zeros((1, 32, 32, 2))
    w = jnp.zeros((1, 32, 32, 2))
    params = model.init(jax.random.key(0), x)

    def lfn(p):
        return M.mcc_ce_loss(model.apply(p, x), y, w, (0, 1, 2))

    loss, grads = jax.value_and_grad(lfn)(params)
    assert np.isfinite(float(loss))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()


def test_training_survives_sparse_annotations(tmp_path):
    """Train on samples whose labels are tiny localized blobs — crops will
    often miss them entirely; the run must stay finite and checkpoint."""
    from interactive_unet_tpu import storage
    from interactive_unet_tpu.engine import samples, trainer
    from interactive_unet_tpu.ops import colors as C
    from interactive_unet_tpu.session.volumedata import VolumeData

    N = 48
    samples.create_directories(tmp_path)
    rng = np.random.default_rng(0)
    vol = (rng.random((N, N, N)) * 254 + 1).astype(np.uint8)
    storage.create_multiscale_zarr(vol, tmp_path / "data" / "image_volumes" /
                                   "v.zarr", chunk_size=16, shard_size=32)
    vd = VolumeData("v.zarr", root=tmp_path)
    vd.slicer.rng = np.random.default_rng(3)
    for axis in ("x", "y"):
        vd.randomize(sampling_mode="grid", sampling_axis=axis)
        img = vd.get_slice(slice_width=N, order=1).astype(np.uint8)
        mask = np.zeros((N, N, 3), np.uint8)
        mask[2:6, 2:6] = C.COLORS[1]       # tiny blobs only
        mask[40:44, 40:44] = C.COLORS[2]
        samples.save_sample(img.astype(float), mask,
                            {"volume": vd.filename,
                             "slicer": vd.slicer.to_dict()},
                            num_classes=2, root=tmp_path,
                            rng=np.random.default_rng(1))
    r = trainer.train_model(lr=1e-3, batch_size=2, epochs=4, num_classes=2,
                            encoder_name="cnn_s", root=tmp_path, seed=0)
    for h in r["history"]:
        assert np.isfinite(h["train"]["Loss"]), h
        assert np.isfinite(h["val"]["Loss"]), h
    assert np.isfinite(r["best_val_loss"])
    from interactive_unet_tpu.engine import checkpoint as ckpt_io
    ckpt_io.wait_pending()  # the click returns before the background save
    assert (tmp_path / "model" / "model.ckpt").is_file()
