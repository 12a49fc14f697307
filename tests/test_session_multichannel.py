"""Multi-channel wiring through the SESSION layer (VERDICT r2 weak #5:
the engine handled C>1 but SessionState hardcoded num_channels=1), plus the
HBM-capacity guard on the packed-slice fast path (weak #3).

Reference parity note: the reference is 1-channel only; these cover the
repo's own added capability end-to-end.
"""

import os

import numpy as np
import pytest

from interactive_unet_tpu import storage
from interactive_unet_tpu.engine import samples
from interactive_unet_tpu.ops import colors as C
from interactive_unet_tpu.session.state import SessionState
from interactive_unet_tpu.session.volumedata import VolumeData


@pytest.fixture
def ws2ch(tmp_path, rng):
    """Workspace with one 2-channel volume."""
    samples.create_directories(tmp_path)
    vol = (rng.random((48, 48, 48, 2)) * 255).astype(np.uint8)
    storage.create_multiscale_zarr(
        vol, tmp_path / "data" / "image_volumes" / "twochan.zarr",
        chunk_size=16, shard_size=32)
    return tmp_path


def test_session_infers_channels_and_trains(ws2ch):
    state = SessionState(root=ws2ch, canvas_size=64)
    state.input_size = 32
    state.randomize()

    assert state.num_channels == 2
    assert state.image_slice.shape == (32, 32, 2)
    assert state.status()["num_channels"] == 2
    # the paint canvas shows channel 0 as grayscale
    assert state.frame().shape == (64, 64, 3)

    kw = state.train_kwargs()
    assert kw["num_channels"] == 2

    # annotate every class and save: images round-trip as 2-page TIFFs
    state.color_idx = 1
    state.stroke([(5, 5), (40, 5)])
    state.color_idx = 2
    state.stroke([(5, 40), (40, 40)])
    state.save_sample()

    anns = samples.load_annotations("train", ws2ch)
    assert len(anns) == 1
    image, mask, weight = anns[0]
    assert image.shape == (32, 32, 2)

    # a quick end-to-end train on the saved 2-channel sample
    from interactive_unet_tpu.engine.trainer import train_model

    out = train_model(batch_size=1, epochs=2, num_channels=2, num_classes=2,
                      encoder_name="cnn_s", root=ws2ch)
    assert np.isfinite(out["best_val_loss"])

    # slice prediction consumes the 2-channel slice against the saved model
    colored = state.predict_slice()
    assert colored.shape == (32, 32, 3)


def test_session_suggestor_multichannel(ws2ch):
    state = SessionState(root=ws2ch, canvas_size=64)
    state.input_size = 32
    state.randomize()
    # two strokes in different classes so the suggestor actually fits
    state.color_idx = 1
    state.stroke([(5, 5), (40, 5)])
    state.color_idx = 2
    state.stroke([(5, 40), (40, 40)])

    assert state.image_features.shape == (32, 32, 2)
    assert state.run_suggestor()
    deadline = __import__("time").time() + 120
    while state.suggesting and __import__("time").time() < deadline:
        __import__("time").sleep(0.1)
    assert not state.suggesting
    assert "live_suggestions" in state.annotator.overlays
    assert state.suggestor_model.num_channels == 2


def test_multipage_tiff_roundtrip(tmp_path, rng):
    from interactive_unet_tpu.engine.samples import _imread, _imsave

    arr = (rng.random((16, 16, 2)) * 255).astype(np.uint8)
    _imsave(tmp_path / "x.tiff", arr)
    back = _imread(tmp_path / "x.tiff")
    np.testing.assert_array_equal(back, arr)

    rgb = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
    _imsave(tmp_path / "rgb.tiff", rgb)
    np.testing.assert_array_equal(_imread(tmp_path / "rgb.tiff"), rgb)


def test_hbm_pack_budget_guard(tmp_path, rng, monkeypatch):
    """A volume whose packed table exceeds the budget must fall back to the
    host slicing path instead of OOMing on device (VERDICT r2 weak #3)."""
    samples.create_directories(tmp_path)
    vol = (rng.random((40, 40, 40)) * 255).astype(np.uint8)
    storage.create_multiscale_zarr(
        vol, tmp_path / "data" / "image_volumes" / "big.zarr",
        chunk_size=16, shard_size=32)

    monkeypatch.setenv("IUNET_HBM_PACK_BUDGET", "0")
    vd = VolumeData("big", root=tmp_path)
    vd.resident()
    assert vd._flat_dev is None  # guard kept it on host
    sl = vd.get_slice(slice_width=32, order=1)
    assert sl.shape == (32, 32)

    monkeypatch.setenv("IUNET_HBM_PACK_BUDGET", str(1 << 30))
    vd2 = VolumeData("big", root=tmp_path)
    vd2.slicer.from_dict(vd.slicer.to_dict())  # same oriented plane
    vd2.resident()
    assert vd2._flat_dev is not None  # fits: packs as before
    sl2 = vd2.get_slice(slice_width=32, order=1)
    np.testing.assert_allclose(np.asarray(sl2).astype(float),
                               np.asarray(sl).astype(float), atol=1.0)


def test_sample_batch_host_fallback(tmp_path, rng, monkeypatch):
    """Batched reslice sampling works (slower) when packing is off-budget."""
    samples.create_directories(tmp_path)
    vol = (rng.random((40, 40, 40)) * 255).astype(np.uint8)
    storage.create_multiscale_zarr(
        vol, tmp_path / "data" / "image_volumes" / "v.zarr",
        chunk_size=16, shard_size=32)
    mask = (vol > 128).astype(np.uint8)
    np.save(tmp_path / "data" / "mask_volumes" / "v.npy", mask)
    wt = np.zeros((*vol.shape, 2), np.uint8)
    wt[mask > 0] = 255
    np.save(tmp_path / "data" / "weight_volumes" / "v.npy", wt)

    monkeypatch.setenv("IUNET_HBM_PACK_BUDGET", "0")
    vd = VolumeData("v", annotations=True, root=tmp_path)
    imgs, masks, weights, dicts = vd.sample_batch(3, slice_width=32)
    assert imgs.shape == (3, 32, 32) and imgs.dtype == np.uint8
    assert masks.shape == (3, 32, 32) and weights.shape == (3, 32, 32)
    assert len(dicts) == 3


def test_predict_volumes_action_passes_channels(ws2ch, monkeypatch):
    """The app's predict_volumes action forwards the session's inferred
    num_channels — a fresh (no-checkpoint) predict on a 2-channel volume
    must not build a 1-channel model."""
    import asyncio

    pytest.importorskip("aiohttp")
    from aiohttp.test_utils import TestClient, TestServer
    from interactive_unet_tpu.session.app import build_app

    seen = {}

    def fake_predict_volumes(**kw):
        seen.update(kw)

    from interactive_unet_tpu.engine import predict as pe
    monkeypatch.setattr(pe, "predict_volumes", fake_predict_volumes)

    async def scenario():
        app = build_app(root=str(ws2ch), canvas_size=64)
        app["state"].input_size = 32
        app["state"].randomize()
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            r = await client.post("/action", json={"name": "predict_volumes"})
            assert r.status == 200
            for _ in range(100):  # executor thread
                if seen:
                    break
                await asyncio.sleep(0.05)
        finally:
            await client.close()

    asyncio.run(scenario())
    assert seen["num_channels"] == 2
    assert seen["num_classes"] == 2
    assert seen["input_size"] == 32
