"""Training-set assembly: saved samples + optional on-the-fly reslicing
(reference loader.py:15-101).

``load_resliced_annotations`` re-slices the 3-D annotation volumes (built by
VolumeData.build_annotation_volumes from saved 2-D samples) at random
orientations with class-balanced origins, yielding unlimited augmented
training data.  Note: the reference's reslice path is wired but defective —
it swaps class_to_categorical arguments (loader.py:60 vs utils.py:370) and
UNetDataset never indexes the resliced list (loader.py:138-154).  This
implementation actually works; the argument order follows utils.py:370.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..ops import colors as C
from . import samples
from ..session.volumedata import load_dataset


def _finish_reslice(image, mask, weight, num_classes):
    """(S,S) u8 triple -> normalized (image, onehot, weight) training arrays
    (reference loader.py:25-46 value semantics)."""
    cat = C.class_to_categorical(mask, num_classes,
                                 (weight > 0).astype(mask.dtype))
    image = image[:, :, None] if image.ndim == 2 else image
    weight3 = np.repeat(weight[:, :, None], num_classes, axis=2)

    image = (image / 255).astype("float32")
    cat = cat.astype("float32")
    weight3 = (weight3 / 255).astype("float32")

    void = image[:, :, 0] == 0
    cat[void] = 0.0
    weight3[void] = 0.0
    return image, cat, weight3


def load_resliced_annotations(set_type: str = "train", count: int = 100,
                              num_classes: int = 2, root: str | Path = ".",
                              slice_width: int = 512, rng=None,
                              max_rounds: int = 20):
    """Sample ``count`` random oriented slices from annotation volumes.

    Batched device path: per round, every volume extracts its share of
    candidate (image, mask, weight) reslices in three gather dispatches
    (VolumeData.sample_batch over the packed HBM tables); empty slices are
    rejected host-side and re-drawn — the reference's per-slice rejection
    loop (loader.py:62-68) without its 3-scipy-calls-per-try cost."""
    rng = rng or np.random.default_rng()
    dataset = load_dataset(annotations=True, root=root)
    if not dataset:
        return []
    weight_channel = 0 if set_type == "train" else 1

    # reproducibility: the caller's rng seeds each volume's slicer draws
    for vd in dataset:
        vd.slicer.rng = np.random.default_rng(int(rng.integers(2 ** 63)))

    annotations = []
    rejects = []  # reference fallback: after max tries, use the draw anyway
    for _ in range(max_rounds):
        need = count - len(annotations)
        if need <= 0:
            break
        # spread the draw over volumes; modest oversampling absorbs rejects.
        # K is bucketed to a power of two so the batched-gather program's
        # static shape stays stable as `need` shrinks between rounds and as
        # the dataset grows — each distinct K would otherwise be a fresh
        # multi-minute cold compile of the packed-gather program (same
        # rationale as fused_train.capacity_bucket)
        per_vol = -(-need // len(dataset))
        k_bucket = 1 << (per_vol - 1).bit_length() if per_vol > 1 else 1
        for vd in dataset:
            imgs, masks, weights, _ = vd.sample_batch(
                k_bucket, weight_channel=weight_channel,
                slice_width=slice_width)
            # examine every gathered slice, not just per_vol: the bucketed
            # oversampling is paid for, so let it absorb rejects
            for i in range(k_bucket):
                # rejection: the slice must intersect annotated voxels
                if weights[i].max() == 255 and masks[i].max() > 0:
                    annotations.append(_finish_reslice(
                        imgs[i], masks[i], weights[i], num_classes))
                elif len(rejects) < count:
                    rejects.append((imgs[i], masks[i], weights[i]))
    # guarantee exactly ``count`` like the reference's max_tries fallback
    # (loader.py:62-68 keeps the last draw even when unqualified)
    for t in rejects[:max(0, count - len(annotations))]:
        annotations.append(_finish_reslice(*t, num_classes))
    return annotations[:count]


def assemble_training_set(set_type: str = "train", num_classes: int = 2,
                          reslice: bool = False, reslice_factor: int = 2,
                          root: str | Path = ".", rng=None):
    """Saved annotations (+ resliced extras when enabled) as one list."""
    annotations = samples.load_annotations(set_type, root)
    if reslice and annotations:
        slice_width = annotations[0][0].shape[0]
        extra = load_resliced_annotations(
            set_type, count=reslice_factor * len(annotations),
            num_classes=num_classes, root=root, slice_width=slice_width,
            rng=rng)
        annotations = annotations + extra
    return annotations
