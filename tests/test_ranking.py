"""Uncertainty slice ranking: ordering semantics + workspace integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from interactive_unet_tpu.engine import ranking
from interactive_unet_tpu.models import build_model
from interactive_unet_tpu.ops.fastslice import PackedVolume
from interactive_unet_tpu.ops.slicer import Slicer


def test_rank_slices_ordering(rng):
    vol = (rng.random((48, 48, 48)) * 255).astype(np.uint8)
    model = build_model(architecture="U-Net", encoder_name="cnn_s",
                        num_classes=2)
    params = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 1)))
    ranked = ranking.rank_slices(model, params, vol, num_candidates=6,
                                 slice_width=32, seed=1)
    assert len(ranked) == 6
    scores = [r["score"] for r in ranked]
    assert scores == sorted(scores, reverse=True)
    # slicer states round-trip
    s = Slicer((48, 48, 48))
    s.from_dict(ranked[0]["slicer"])
    assert s.volume_shape.tolist() == [48, 48, 48]


def test_margin_score(rng):
    vol = (rng.random((32, 32, 32)) * 255).astype(np.uint8)
    model = build_model(architecture="U-Net", encoder_name="cnn_s",
                        num_classes=3)
    params = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 1)))
    ranked = ranking.rank_slices(model, params, vol, num_candidates=4,
                                 slice_width=32, score="margin", seed=2)
    assert all(0.0 <= r["score"] <= 1.0 for r in ranked)


def test_entropy_prefers_uncertain():
    """A synthetic 'model' that is certain on dark slices and uncertain on
    bright ones must rank bright-origin slices first."""

    class FakeModel:
        @staticmethod
        def apply(params, x):
            # probability of class 1 = brightness -> entropy peaks at 0.5
            p1 = jnp.clip(x[..., 0], 0.02, 0.98)[..., None]
            return jnp.concatenate([1 - p1, p1], axis=-1)

    vol = np.zeros((32, 32, 32), np.uint8)
    vol[:16] = 2        # dark half: p1 ~ 0 -> certain
    vol[16:] = 128      # half-bright half: p1 ~ 0.5 -> maximally uncertain
    ranked = ranking.rank_slices(FakeModel(), None, vol, num_candidates=12,
                                 slice_width=16, sampling_mode="grid", seed=3)
    # top-ranked slice's origin should sit in the uncertain half
    top = ranked[0]["slicer"]["Origin"]
    bottom = ranked[-1]["slicer"]["Origin"]
    assert ranked[0]["score"] > ranked[-1]["score"]
