"""Shard-streamed finalize (round-4 perf): the device-accumulator path
finalizes each output shard and ships it as soon as no remaining block can
touch it.  These tests pin that the streamed output is voxel-identical to
the host path on awkward geometry (non-cubic volume, edge shards clipped
below shard_size on every axis, blocks overlapping shard boundaries)."""

import numpy as np


def _workspace(tmp_path, rng, shape):
    from interactive_unet_tpu import storage
    from interactive_unet_tpu.engine import samples

    samples.create_directories(tmp_path)
    vol = (rng.random(shape) * 255).astype(np.uint8)
    storage.create_multiscale_zarr(
        vol, tmp_path / "data" / "image_volumes" / "v.zarr",
        chunk_size=16, shard_size=32)
    return vol


def test_streamed_shards_match_host_noncubic(tmp_path, rng):
    """(80, 48, 40) / shard 32 -> a 3x2x2 shard grid with clipped edge
    shards on every axis; every output shard must be written exactly once
    and match the host accumulator voxel-for-voxel (same knife-edge
    tolerance as the cubic parity test)."""
    import shutil

    from interactive_unet_tpu import storage
    from interactive_unet_tpu.engine.predict import predict_volumes

    _workspace(tmp_path, rng, (80, 48, 40))

    r_dev = predict_volumes(input_size=32, num_classes=2, root=tmp_path,
                            chunk_size=16, shard_size=32)
    assert r_dev[0]["device_accumulator"] is True
    dev = np.asarray(storage.read_volume(
        tmp_path / "data" / "predicted_volumes" / "v.zarr", level=0)[:])
    assert dev.shape == (80, 48, 40, 2)

    shutil.rmtree(tmp_path / "data" / "predicted_volumes")
    r_host = predict_volumes(input_size=32, num_classes=2, root=tmp_path,
                             chunk_size=16, shard_size=32,
                             hbm_budget_bytes=0)
    assert r_host[0]["device_accumulator"] is False
    host = np.asarray(storage.read_volume(
        tmp_path / "data" / "predicted_volumes" / "v.zarr", level=0)[:])

    diff = np.abs(dev.astype(int) - host.astype(int))
    assert (diff <= 1).all()
    assert (diff > 0).mean() < 1e-3


def test_streamed_output_fully_written(tmp_path, rng):
    """A volume whose weight coverage is complete must produce a fully
    normalized output: per-voxel class channels sum to ~255 everywhere
    (a missed shard would leave a zero hole)."""
    from interactive_unet_tpu import storage
    from interactive_unet_tpu.engine.predict import predict_volumes

    _workspace(tmp_path, rng, (64, 32, 32))
    predict_volumes(input_size=32, num_classes=2, root=tmp_path,
                    chunk_size=16, shard_size=32)
    out = np.asarray(storage.read_volume(
        tmp_path / "data" / "predicted_volumes" / "v.zarr", level=0)[:])
    sums = out.astype(np.int64).sum(axis=-1)
    assert (sums >= 253).all() and (sums <= 256).all()
