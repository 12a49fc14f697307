"""Uncertainty-driven slice ranking (BASELINE north-star capability:
"suggestor uncertainty slice ranking runs on-device").

Samples K candidate oriented slices from a volume, runs the current model on
all of them in one batched forward, scores each by predictive uncertainty,
and returns the candidates ranked most-uncertain-first — the next slice the
annotator should label.  The whole candidate sweep (K slice extractions +
K forwards + entropy reduction) is device-resident: slice extraction uses the
packed single-gather kernel and the scores come back as K floats.

Scores:
- ``entropy``: mean softmax entropy over the slice (default)
- ``margin``:  mean (1 - |p_top1 - p_top2|) — high when classes compete
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fastslice import PackedVolume
from ..ops.slicer import Slicer


@partial(jax.jit, static_argnames=("apply_fn", "score"))
def _score_slices(apply_fn, params, slices, score: str = "entropy"):
    """slices (K,S,S[,C]) float in [0,1] -> (K,) uncertainty scores."""
    if slices.ndim == 3:
        slices = slices[..., None]
    probs = apply_fn(params, slices)  # (K,S,S,C)
    if score == "margin":
        top2 = jax.lax.top_k(probs, 2)[0]
        return jnp.mean(1.0 - (top2[..., 0] - top2[..., 1]), axis=(1, 2))
    ent = -jnp.sum(probs * jnp.log(probs + 1e-9), axis=-1)
    return jnp.mean(ent, axis=(1, 2))


def rank_slices(model, params, volume, num_candidates: int = 16,
                slice_width: int = 256, sampling_mode: str = "random",
                score: str = "entropy", seed: int = 0,
                packed: PackedVolume | None = None):
    """Propose annotation targets: returns a list of dicts
    {"slicer": Slicer.to_dict(), "score": float}, most uncertain first.

    ``volume`` is a (D,H,W[,C]) array-like; pass a prebuilt ``packed``
    PackedVolume to skip re-packing (the interactive session keeps one).
    Multi-channel (4-D) volumes and sessions whose packed table exceeded the
    HBM budget (packed=None after resident()) extract candidates host-side.
    """
    import os

    from ..ops.fastslice import packed_nbytes

    volume_shape = (volume.shape if packed is None else packed.shape)[:3]
    slicer = Slicer(volume_shape, seed=seed)
    pv = packed
    budget = int(os.environ.get("IUNET_HBM_PACK_BUDGET", 6 * 1024 ** 3))
    if pv is None and getattr(volume, "ndim", 3) == 3 \
            and packed_nbytes(volume_shape) <= budget:  # pack ad hoc
        pv = PackedVolume(np.asarray(volume[:, :, :]))

    frames = []
    stack = []
    for _ in range(num_candidates):
        slicer.randomize(sampling_mode=sampling_mode)
        frames.append(slicer.to_dict())
        if pv is not None:
            stack.append(pv.extract_slicer(slicer, axis=0,
                                           slice_width=slice_width, order=1))
        else:  # host bbox path (4-D / over-HBM-budget volumes)
            stack.append(jnp.asarray(slicer.get_slice(
                volume, axis=0, slice_width=slice_width, order=1),
                jnp.float32))
    slices = jnp.stack(stack) / 255.0

    scores = np.asarray(_score_slices(model.apply, params, slices, score))
    order = np.argsort(-scores)
    return [{"slicer": frames[i], "score": float(scores[i])} for i in order]


def rank_slices_for_workspace(root=".", num_candidates: int = 16,
                              slice_width: int | None = None,
                              score: str = "entropy", seed: int = 0):
    """Convenience: rank candidate slices of every workspace volume with the
    current checkpoint; returns {volume_name: ranked list}."""
    from .predict import _load_model
    from .samples import get_input_size, get_num_classes
    from ..session.volumedata import load_dataset

    slice_width = slice_width or get_input_size(root)
    num_classes = get_num_classes(root)
    out = {}
    for vd in load_dataset(root=root):
        vd.resident()
        # channel count follows each volume (multi-channel workspaces)
        model, params, _ = _load_model(root, vd.num_channels, num_classes)
        out[vd.filename] = rank_slices(
            model, params, vd.image_volume,
            num_candidates=num_candidates, slice_width=slice_width,
            score=score, seed=seed, packed=vd._flat_dev)
    return out
