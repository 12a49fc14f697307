"""UI -> worker-process -> filesystem training contract (reference
app.py:692-724: training must not block the UI event loop; the checkpoint and
metrics.csv ARE the IPC)."""

import asyncio
import glob
import time

import numpy as np
import pytest

from interactive_unet_tpu import storage
from interactive_unet_tpu.engine import samples
from interactive_unet_tpu.ops import colors as C

N = 48


@pytest.fixture()
def annotated_ws(tmp_path):
    samples.create_directories(tmp_path)
    rng = np.random.default_rng(0)
    vol = (rng.random((N, N, N)) * 254 + 1).astype(np.uint8)
    storage.create_multiscale_zarr(vol, tmp_path / "data" / "image_volumes" /
                                   "tiny.zarr", chunk_size=16, shard_size=32)
    # two scripted samples
    from interactive_unet_tpu.session.volumedata import VolumeData

    vd = VolumeData("tiny.zarr", root=tmp_path)
    vd.slicer.rng = np.random.default_rng(7)  # deterministic origins
    for axis in ("x", "y"):
        vd.randomize(sampling_mode="grid", sampling_axis=axis)
        img = vd.get_slice(slice_width=N, order=1).astype(np.uint8)
        mask = np.zeros((N, N, 3), np.uint8)
        mask[img <= 128] = C.COLORS[1]
        mask[img > 128] = C.COLORS[2]
        samples.save_sample(img.astype(float), mask,
                            {"volume": vd.filename,
                             "slicer": vd.slicer.to_dict()},
                            num_classes=2, root=tmp_path,
                            rng=np.random.default_rng(1))
    return tmp_path


def test_train_via_subprocess(annotated_ws):
    pytest.importorskip("aiohttp")
    from aiohttp.test_utils import TestClient, TestServer
    from interactive_unet_tpu.session.app import build_app

    async def scenario():
        app = build_app(root=str(annotated_ws), canvas_size=64)
        state = app["state"]
        state.input_size = N
        state.train_config.epochs = 2
        state.train_config.batch_size = 2
        state.train_config.encoder_name = "cnn_s"
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            r = await client.post("/action", json={"name": "train"})
            assert (await r.json())["ok"]
            # poll /status until the worker process finishes
            deadline = time.time() + 360
            while time.time() < deadline:
                s = await (await client.get("/status")).json()
                if not s["training"]:
                    break
                await asyncio.sleep(2)
            assert not s["training"], "training did not finish in time"
            assert (annotated_ws / "model" / "model.ckpt").is_file()
            assert (annotated_ws / "model" / "model_details.json").is_file()
            csvs = glob.glob(str(annotated_ws / "model" / "history" / "*" /
                                 "version_0" / "metrics.csv"))
            assert csvs, "no metrics.csv written by worker"
            r = await client.get("/history?metric=Loss")
            fig = await r.json()
            assert len(fig["data"][0]["x"]) == 2  # two epochs logged
        finally:
            await client.close()

    asyncio.run(scenario())


def test_worker_process_death_recovers(tmp_path):
    """If the train-worker process dies (OOM, crash), the next Train click
    must relaunch it and get a clean reply — and a dead worker must never
    leave the busy flag stuck (status syncs training = worker.busy)."""
    from interactive_unet_tpu.session.app import _TrainWorker

    w = _TrainWorker(cwd=str(tmp_path))  # empty ws: startup warm is a no-op
    w._ensure_proc()
    pid1 = w.proc.pid
    w.proc.kill()
    w.proc.wait()

    assert w.submit({"bogus_kwarg": 1})  # relaunches, replies an error
    for _ in range(1200):
        if not w.busy:
            break
        time.sleep(0.1)
    assert not w.busy
    assert w.last["ok"] is False and "bogus_kwarg" in w.last["error"]
    assert w.proc.pid != pid1 and w.proc.poll() is None  # alive for next job
    w.proc.kill()
