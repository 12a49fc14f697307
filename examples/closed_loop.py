"""Scripted closed interactive loop (BASELINE config #5), headless.

Simulates a full annotation session against a synthetic phantom:

  1. create a workspace + example volume
  2. "paint" two slices with a scripted annotator and save samples
  3. per-stroke live suggestion (30-step few-shot fit on device)
  4. incremental retrain (fused single-program epochs)
  5. uncertainty ranking proposes the next slice to annotate
  6. annotate it, retrain again (checkpoint resume)
  7. full-volume sliding-window inference + Dice report

Run:  python examples/closed_loop.py [workspace_dir]
"""

import os
import sys
import time
from pathlib import Path

import numpy as np

# honor JAX_PLATFORMS even where sitecustomize pins a platform plugin —
# this jax build ignores the env var unless applied via jax.config BEFORE
# the first device use (same handling as __main__.py / tests/conftest.py)
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

sys.path.insert(0, str(Path(__file__).parents[1]))

from interactive_unet_tpu import storage                         # noqa: E402
from interactive_unet_tpu.engine import predict, samples, trainer  # noqa: E402
from interactive_unet_tpu.engine.ranking import rank_slices_for_workspace  # noqa: E402
from interactive_unet_tpu.engine.suggestor import Suggestor      # noqa: E402
from interactive_unet_tpu.ops import colors as C                 # noqa: E402
from interactive_unet_tpu.session.volumedata import VolumeData   # noqa: E402

N = 64


def scripted_annotation(img):
    """Perfect oracle: threshold into 2 classes, sparsified like strokes."""
    mask = np.zeros((*img.shape, 3), np.uint8)
    mask[img <= 128] = C.COLORS[1]
    mask[img > 128] = C.COLORS[2]
    keep = np.random.default_rng(0).random(img.shape) < 0.5
    mask[~keep] = 0
    return mask


def main(root="closed_loop_ws"):
    root = Path(root)
    samples.create_directories(root)

    rng = np.random.default_rng(0)
    zz, yy, xx = np.mgrid[:N, :N, :N]
    r = np.sqrt((zz - N / 2) ** 2 + (yy - N / 2) ** 2 + (xx - N / 2) ** 2)
    vol = np.clip(np.where(r < N / 4, 200, 60)
                  + rng.normal(0, 5, (N, N, N)), 1, 255).astype(np.uint8)
    storage.create_multiscale_zarr(vol, root / "data" / "image_volumes" /
                                   "phantom.zarr", chunk_size=32,
                                   shard_size=32)

    vd = VolumeData("phantom.zarr", root=root)
    sug = Suggestor(num_channels=1, num_classes=2)

    # --- annotate two slices, with live suggestions -------------------------
    for axis in ("x", "y"):
        vd.randomize(sampling_mode="grid", sampling_axis=axis)
        vd.slicer.origin = np.array([N / 2.0] * 3)  # through the sphere
        img = vd.get_slice(slice_width=N, order=1).astype(np.uint8)
        mask = scripted_annotation(img)
        t0 = time.perf_counter()
        suggestion, sug = sug.make_suggestions((img / 255).astype("float32"),
                                               mask)
        print(f"live suggestion after stroke: {time.perf_counter()-t0:.2f}s")
        samples.save_sample(img.astype(float), mask,
                            {"volume": vd.filename,
                             "slicer": vd.slicer.to_dict()}, 2, root=root)

    # --- retrain -------------------------------------------------------------
    t0 = time.perf_counter()
    result = trainer.train_model(lr=3e-3, batch_size=2, epochs=8,
                                 num_classes=2, encoder_name="cnn_s",
                                 root=root, seed=0)
    print(f"retrain round-trip: {time.perf_counter()-t0:.2f}s "
          f"(best val loss {result['best_val_loss']:.3f})")

    # --- active learning: where to annotate next ----------------------------
    ranked = rank_slices_for_workspace(root=root, num_candidates=8,
                                       slice_width=N)
    best = ranked["phantom"][0]
    print(f"most uncertain candidate slice score: {best['score']:.4f}")
    vd.slicer.from_dict(best["slicer"])
    img = vd.get_slice(slice_width=N, order=1).astype(np.uint8)
    samples.save_sample(img.astype(float), scripted_annotation(img),
                        {"volume": vd.filename,
                         "slicer": vd.slicer.to_dict()}, 2, root=root)

    # --- resume training -----------------------------------------------------
    result = trainer.train_model(lr=1e-3, batch_size=2, epochs=4,
                                 num_classes=2, root=root, seed=1)
    print(f"resumed best val loss: {result['best_val_loss']:.3f}")

    # --- full-volume inference ----------------------------------------------
    t0 = time.perf_counter()
    predict.predict_volumes(input_size=N, num_classes=2, root=root,
                            batch_size=16, chunk_size=32, shard_size=32)
    out = storage.read_volume(root / "data" / "predicted_volumes" /
                              "phantom.zarr")[:, :, :, :]
    ids = np.argmax(out, -1)
    true = (vol > 128).astype(int)
    inter = ((ids == 1) & (true == 1)).sum()
    dice = 2 * inter / ((ids == 1).sum() + (true == 1).sum() + 1e-9)
    print(f"full-volume inference: {time.perf_counter()-t0:.2f}s, "
          f"Dice={dice:.3f}")


if __name__ == "__main__":
    main(*sys.argv[1:])
