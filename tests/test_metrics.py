"""Metric suite vs closed-form confusion matrices, incl. the weighted path
(semantics of reference metrics.py:104-166)."""

import numpy as np
import jax.numpy as jnp
import pytest

from interactive_unet_tpu.ops import metrics as M

EPS = 1e-12


def _np_confusion(y_pred, y_true, weight, axes):
    def per(stat):
        if weight is not None:
            stat = weight * stat
            counts = np.sum(weight, axis=axes)
        else:
            counts = np.prod([y_true.shape[a] for a in axes])
        return np.sum(stat, axis=axes) / counts

    tp = per(y_true * y_pred)
    tn = per((1 - y_pred) * (1 - y_true))
    fp = per((1 - y_true) * y_pred)
    fn = per((1 - y_pred) * y_true)
    return tp, tn, fp, fn


@pytest.mark.parametrize("weighted", [False, True])
@pytest.mark.parametrize("axes", [(2, 3), (0, 2, 3)])
def test_confusion_stats_match_numpy(rng, weighted, axes):
    y_pred = rng.random((2, 3, 8, 8)).astype(np.float32)
    y_true = (rng.random((2, 3, 8, 8)) > 0.5).astype(np.float32)
    weight = rng.random((2, 3, 8, 8)).astype(np.float32) if weighted else None

    tp, tn, fp, fn = _np_confusion(y_pred, y_true, weight, axes)
    w = None if weight is None else jnp.asarray(weight)
    np.testing.assert_allclose(
        M.true_positives(jnp.asarray(y_pred), jnp.asarray(y_true), w, axes), tp, rtol=1e-5)
    np.testing.assert_allclose(
        M.true_negatives(jnp.asarray(y_pred), jnp.asarray(y_true), w, axes), tn, rtol=1e-5)
    np.testing.assert_allclose(
        M.false_positives(jnp.asarray(y_pred), jnp.asarray(y_true), w, axes), fp, rtol=1e-5)
    np.testing.assert_allclose(
        M.false_negatives(jnp.asarray(y_pred), jnp.asarray(y_true), w, axes), fn, rtol=1e-5)


@pytest.mark.parametrize("weighted", [False, True])
def test_scores_match_closed_form(rng, weighted):
    axes = (0, 2, 3)
    y_pred = rng.random((2, 2, 16, 16)).astype(np.float32)
    y_true = (rng.random((2, 2, 16, 16)) > 0.5).astype(np.float32)
    weight = (rng.random((2, 2, 16, 16)) > 0.3).astype(np.float32) if weighted else None

    tp, tn, fp, fn = _np_confusion(y_pred, y_true, weight, axes)
    w = None if weight is None else jnp.asarray(weight)
    yp, yt = jnp.asarray(y_pred), jnp.asarray(y_true)

    dice_exp = np.mean((2 * tp + EPS) / (2 * tp + fp + fn + EPS))
    iou_exp = np.mean((tp + EPS) / (tp + fp + fn + EPS))
    mcc_exp = np.mean(
        (tp * tn - fp * fn + EPS)
        / (((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)) ** 0.5 + EPS))

    np.testing.assert_allclose(M.dice(yp, yt, w, axes), dice_exp,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(M.iou(yp, yt, w, axes), iou_exp,
                               rtol=1e-5, atol=1e-6)
    # mcc can be ~0 where rtol alone is meaningless (f32 vs f64 rounding)
    np.testing.assert_allclose(M.mcc(yp, yt, w, axes), mcc_exp,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(M.dice_loss(yp, yt, w, axes), 1 - dice_exp,
                               rtol=1e-4, atol=1e-6)


def test_crossentropy_matches_numpy(rng):
    axes = (2, 3)
    y_pred = rng.random((2, 2, 8, 8)).astype(np.float32) * 0.98 + 0.01
    y_true = (rng.random((2, 2, 8, 8)) > 0.5).astype(np.float32)
    weight = (rng.random((2, 2, 8, 8)) > 0.3).astype(np.float32)

    ce = weight * y_true * np.log(y_pred + EPS)
    expected = np.mean(-np.sum(ce, axis=axes) / np.sum(weight, axis=axes))
    got = M.crossentropy_loss(jnp.asarray(y_pred), jnp.asarray(y_true),
                              jnp.asarray(weight), axes)
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_perfect_prediction_scores():
    y = jnp.asarray((np.random.default_rng(1).random((1, 2, 8, 8)) > 0.5).astype(np.float32))
    assert float(M.dice(y, y)) == pytest.approx(1.0, abs=1e-6)
    assert float(M.iou(y, y)) == pytest.approx(1.0, abs=1e-6)
    assert float(M.mcc(y, y)) == pytest.approx(1.0, abs=1e-4)
    assert float(M.dice_loss(y, y)) == pytest.approx(0.0, abs=1e-6)


def test_loss_registry_names():
    for name in ["Crossentropy (CE)", "Dice", "Intersection over Union (IoU)",
                 "Matthews correlation coefficient (MCC)", "Dice + CE",
                 "IoU + CE", "MCC + CE"]:
        assert callable(M.loss_name_to_function(name))
