"""Saved-sample persistence — the annotate -> dataset edge.

Replicates the reference's on-disk sample contract exactly
(reference utils.py:177-213): per sample index NNNN,

  data/{train,val}/images/NNNN.tiff   grayscale (or RGB) uint8 image slice
  data/{train,val}/masks/NNNN.tiff    RGB palette mask
  data/{train,val}/weights/NNNN.tiff  uint8 labeled-pixel weights (train/val
                                      disjoint via a smoothed-noise split)
  data/{train,val}/slices/NNNN.npy    dict {volume, slicer: Slicer.to_dict()}

TIFFs are written with PIL (tifffile is not in this image).  The reference's
corner-pixel class stamp (utils.py:181-186) is kept — with weight zeroed at
the stamped pixels — because downstream class-count inference
(utils.py:160-170) reads the number of unique colors from the first mask.
"""

from __future__ import annotations

import glob
import os
from pathlib import Path

import numpy as np
from PIL import Image
from scipy import ndimage

from ..ops import colors as C


def _imsave(path: Path, arr: np.ndarray):
    # channel counts PIL has no mode for (e.g. 2-channel volumes) are saved
    # as one TIFF page per channel; _imread reassembles them
    if arr.ndim == 3 and arr.shape[2] not in (3, 4):
        if arr.shape[2] == 1:
            arr = arr[:, :, 0]
        else:
            pages = [Image.fromarray(arr[:, :, c])
                     for c in range(arr.shape[2])]
            pages[0].save(str(path), save_all=True, append_images=pages[1:])
            return
    Image.fromarray(arr).save(str(path))


def _imread(path) -> np.ndarray:
    img = Image.open(str(path))
    n = getattr(img, "n_frames", 1)
    if n > 1:  # multi-page TIFF: one page per channel (_imsave)
        chans = []
        for i in range(n):
            img.seek(i)
            chans.append(np.asarray(img))
        return np.stack(chans, axis=-1)
    return np.asarray(img)


def normalize(x):
    x = x - np.min(x)
    return x / np.max(x)


def save_sample(image_slice: np.ndarray, mask_slice: np.ndarray,
                slice_data: dict, num_classes: int | None = None,
                root: str | os.PathLike = ".", rng=None):
    """Persist one annotated slice as train+val sample files."""
    root = Path(root)
    rng = rng or np.random.default_rng()
    mask_slice = np.array(mask_slice)

    if num_classes is not None:
        for i in range(num_classes + 1):
            mask_slice[0, i, :] = C.COLORS[i]

    _, weight_slice = C.colored_to_categorical(mask_slice)
    if num_classes is not None:
        weight_slice = np.array(weight_slice)
        weight_slice[0, : num_classes + 1] = 0

    # smoothed-noise pixel split: ~half the labeled pixels train, half val
    noise = normalize(ndimage.gaussian_filter(
        rng.random((image_slice.shape[0], image_slice.shape[1])), 2)) > 0.5
    train_weight = np.round(weight_slice * noise).astype("uint8")
    val_weight = np.round(weight_slice * (1 - noise)).astype("uint8")

    image_u8 = np.round(image_slice).astype("uint8")
    mask_u8 = np.round(mask_slice).astype("uint8")

    for split, wt in (("train", train_weight), ("val", val_weight)):
        n = len(glob.glob(str(root / "data" / split / "images" / "*.tiff")))
        _imsave(root / "data" / split / "images" / f"{n:04d}.tiff", image_u8)
        _imsave(root / "data" / split / "masks" / f"{n:04d}.tiff", mask_u8)
        _imsave(root / "data" / split / "weights" / f"{n:04d}.tiff", wt)
        np.save(root / "data" / split / "slices" / f"{n:04d}.npy", slice_data)


def load_annotations(set_type: str = "train", root: str | os.PathLike = "."):
    """Load saved samples -> [(image, mask, weight)] float32 HWC in [0,1]
    with the reference's image==0 masking (loader.py:40-42)."""
    root = Path(root)
    folder = root / "data" / ("train" if set_type == "train" else "val")
    image_files = sorted(glob.glob(str(folder / "images" / "*")))
    mask_files = sorted(glob.glob(str(folder / "masks" / "*")))
    weight_files = sorted(glob.glob(str(folder / "weights" / "*")))

    annotations = []
    for img_f, msk_f, wt_f in zip(image_files, mask_files, weight_files):
        image = _imread(img_f)
        mask, _ = C.colored_to_categorical(_imread(msk_f))
        weight = _imread(wt_f)

        if image.ndim == 2:
            image = image[:, :, None]
        weight = np.repeat(weight[:, :, None], mask.shape[-1], axis=2)

        image = (image / 255).astype("float32")
        mask = (mask / 255).astype("float32")
        weight = (weight / 255).astype("float32")

        # black (out-of-volume) pixels carry no supervision
        void = image[:, :, 0] == 0
        mask[void] = 0.0
        weight[void] = 0.0

        annotations.append((image, mask, weight))
    return annotations


def get_input_size(root: str | os.PathLike = ".") -> int:
    """Input size inferred from the first saved mask (utils.py:148-158)."""
    masks = glob.glob(str(Path(root) / "data" / "train" / "masks" / "*.tiff"))
    if masks:
        return _imread(sorted(masks)[0]).shape[0]
    return 512


def get_num_classes(root: str | os.PathLike = ".") -> int:
    """Class count inferred from unique colors - 1 (utils.py:160-170)."""
    masks = glob.glob(str(Path(root) / "data" / "train" / "masks" / "*.tiff"))
    if masks:
        m = _imread(sorted(masks)[0])
        return np.unique(m.reshape(-1, m.shape[-1]), axis=0).shape[0] - 1
    return 2


def create_directories(root: str | os.PathLike = "."):
    """Directory lifecycle (reference utils.py:217-237, sans forced download)."""
    root = Path(root)
    for p in ("image_volumes", "mask_volumes", "weight_volumes",
              "predicted_volumes"):
        (root / "data" / p).mkdir(parents=True, exist_ok=True)
    for split in ("train", "val"):
        for p in ("images", "masks", "weights", "slices"):
            (root / "data" / split / p).mkdir(parents=True, exist_ok=True)
    (root / "model").mkdir(parents=True, exist_ok=True)


def clear_annotations(root: str | os.PathLike = "."):
    import shutil
    root = Path(root)
    for p in ("data/mask_volumes", "data/weight_volumes",
              "data/predicted_volumes", "data/train", "data/val"):
        shutil.rmtree(root / p, ignore_errors=True)
    create_directories(root)


def clear_model(root: str | os.PathLike = "."):
    import shutil
    shutil.rmtree(Path(root) / "model", ignore_errors=True)
    create_directories(root)


def reset_all(root: str | os.PathLike = "."):
    clear_annotations(root)
    clear_model(root)
