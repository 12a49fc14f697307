"""Checkpoint: save/load round-trip, architecture restoration, resume
override semantics (reference trainer.py:31-49, unet.py:23)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import serialization

from interactive_unet_tpu.config import TrainConfig
from interactive_unet_tpu.engine import checkpoint as ck
from interactive_unet_tpu.models import build_model


@pytest.mark.parametrize("arch,enc", [
    ("U-Net", "cnn_s"),
    ("DeepLabV3+", "mobilenet_v2"),
    ("Segformer", "mit_b0"),
])
def test_roundtrip_restores_architecture(tmp_path, arch, enc):
    model = build_model(architecture=arch, encoder_name=enc, num_classes=3)
    x = jnp.zeros((1, 32, 32, 1), jnp.float32)
    params = model.init(jax.random.key(0), x)
    cfg = TrainConfig(architecture=arch, encoder_name=enc, num_classes=3)
    path = tmp_path / "model.ckpt"
    ck.save_checkpoint(path, params, cfg)

    state_dict, cfg2 = ck.load_checkpoint(path)
    assert cfg2.architecture == arch
    assert cfg2.encoder_name == enc
    assert cfg2.num_classes == 3

    model2 = build_model(architecture=cfg2.architecture,
                         encoder_name=cfg2.encoder_name,
                         num_classes=cfg2.num_classes)
    params2 = model2.init(jax.random.key(1), x)  # different init
    params2 = serialization.from_state_dict(params2, state_dict)

    out1 = np.asarray(model.apply(params, x))
    out2 = np.asarray(model2.apply(params2, x))
    np.testing.assert_allclose(out1, out2, atol=1e-6)


def test_load_with_template(tmp_path):
    model = build_model(architecture="U-Net", encoder_name="cnn_s")
    x = jnp.zeros((1, 32, 32, 1), jnp.float32)
    params = model.init(jax.random.key(0), x)
    ck.save_checkpoint(tmp_path / "m.ckpt", params, TrainConfig())
    template = model.init(jax.random.key(9), x)
    restored, _ = ck.load_checkpoint(tmp_path / "m.ckpt", template)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bad_magic_rejected(tmp_path):
    p = tmp_path / "junk.ckpt"
    p.write_bytes(b"not a checkpoint")
    with pytest.raises(ValueError):
        ck.load_checkpoint(p)


def _make_samples(root, n=2, size=32):
    """Tiny annotated workspace for train_model tests."""
    from interactive_unet_tpu import storage
    from interactive_unet_tpu.engine import samples
    from interactive_unet_tpu.ops import colors as C
    from interactive_unet_tpu.ops.slicer import Slicer

    samples.create_directories(root)
    rng = np.random.default_rng(0)
    vol = (rng.random((40, 40, 40)) * 255).astype(np.uint8)
    storage.create_multiscale_zarr(
        vol, root / "data" / "image_volumes" / "v.zarr",
        chunk_size=16, shard_size=32)
    sl = Slicer(vol.shape, seed=1)
    for _ in range(n):
        sl.randomize()
        img = sl.get_slice(vol, slice_width=size, order=1).astype(np.uint8)
        mask = np.zeros((size, size, 3), np.uint8)
        mask[img > 128] = C.COLORS[2]
        mask[img <= 128] = C.COLORS[1]
        samples.save_sample(img, mask, {"volume": "v",
                                        "slicer": sl.to_dict()}, 2,
                            root=root)


def test_device_resident_resume_cache(tmp_path):
    """A same-process resume click takes the on-device cache (no file
    round-trip) and still honors external checkpoint overwrites."""
    from interactive_unet_tpu.engine import checkpoint as ckpt_io
    from interactive_unet_tpu.engine import trainer

    _make_samples(tmp_path)
    kwargs = dict(batch_size=1, epochs=2, num_classes=2,
                  encoder_name="cnn_s", root=tmp_path, seed=0)
    trainer.train_model(**kwargs)
    path = (tmp_path / "model" / "model.ckpt").resolve()
    entry = trainer._RESUME_CACHE[str(path)]
    assert entry["params"] is not None

    # second click: resumes from the cache; history continues finite
    out2 = trainer.train_model(**kwargs)
    assert np.isfinite(out2["best_val_loss"])

    # external overwrite invalidates the cache (stat mismatch)
    ckpt_io.wait_pending()
    entry = trainer._RESUME_CACHE[str(path)]
    import os
    import time

    time.sleep(0.01)
    os.utime(path)  # simulate an external writer touching the file
    assert not trainer._resume_cache_valid(entry, path)
    # and a deleted checkpoint invalidates it too
    ckpt_io.wait_pending()
    path.unlink()
    assert not trainer._resume_cache_valid(entry, path)
    trainer._RESUME_CACHE.clear()


def test_resume_survives_pretrained_toggle(tmp_path):
    """Toggling the pretrained checkbox between clicks must not break resume:
    the checkpoint's param tree governs the model structure (mobilenet_v2
    pretrained builds a folded-BN tree without GroupNorm scopes)."""
    from interactive_unet_tpu import storage
    from interactive_unet_tpu.engine import samples
    from interactive_unet_tpu.engine.trainer import train_model
    from interactive_unet_tpu.ops import colors as C
    from interactive_unet_tpu.ops.slicer import Slicer

    samples.create_directories(tmp_path)
    rng = np.random.default_rng(0)
    vol = (rng.random((40, 40, 40)) * 255).astype(np.uint8)
    storage.create_multiscale_zarr(
        vol, tmp_path / "data" / "image_volumes" / "v.zarr",
        chunk_size=16, shard_size=32)
    sl = Slicer(vol.shape, seed=1)
    for _ in range(2):
        sl.randomize()
        img = sl.get_slice(vol, slice_width=32, order=1).astype(np.uint8)
        mask = np.zeros((32, 32, 3), np.uint8)
        mask[img > 128] = C.COLORS[2]
        mask[img <= 128] = C.COLORS[1]
        samples.save_sample(img, mask, {"volume": "v",
                                        "slicer": sl.to_dict()}, 2,
                            root=tmp_path)

    kwargs = dict(lr=1e-3, batch_size=2, epochs=1, num_classes=2,
                  architecture="U-Net", encoder_name="mobilenet_v2",
                  root=tmp_path)
    train_model(**kwargs, pretrained=False)
    # click 2 with the checkbox ON: resume must keep the ckpt's structure
    out = train_model(**kwargs, pretrained=True)
    assert np.isfinite(out["best_val_loss"])
