"""Weighted soft confusion-matrix losses and metrics as pure jnp functions.

Semantics match the reference metric suite (reference metrics.py:3-187):
tp/tn/fp/fn are weighted *percentages* reduced over ``axes``; with a weight
the denominator is ``sum(weight, axes)`` so unlabeled pixels drop out of both
numerator and denominator; without a weight it is the static element count of
the reduced axes.  Scores use eps=1e-12 smoothing as ``(num+eps)/(den+eps)``
and are finally averaged over the remaining axes; losses are ``1 - score``;
compound losses add the crossentropy-on-probabilities term
(reference metrics.py:168-187).

All functions are jit-safe pure functions of (y_pred, y_true, weight) and work
for any layout — the reference uses NCHW with axes=[2,3] per-image or
axes=[0,2,3] batch-global (reference unet.py:98); our NHWC trainer passes
axes=(0,1,2).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

_EPS = 1e-12


def _counts(y_true, weight, axes):
    if weight is not None:
        # Guard the all-masked case: an augmentation crop can land on a
        # region with zero labeled pixels; sum(weight)==0 would turn the
        # loss NaN and permanently corrupt AdamW state.  (The reference has
        # this hazard — its counts divide unguarded, metrics.py:14 — and
        # works around it elsewhere with the corner-pixel stamp.)  With the
        # floor, a zero-weight batch contributes exactly 0.
        return jnp.maximum(jnp.sum(weight, axis=axes), _EPS)
    n = math.prod(y_true.shape[a] for a in axes)
    return jnp.asarray(n, dtype=y_true.dtype)


def crossentropy_loss(y_pred, y_true, weight=None, axes=(1, 2)):
    """CE on *probabilities* (the model outputs softmax, reference unet.py:65-69)."""
    ce = y_true * jnp.log(y_pred + _EPS)
    if weight is not None:
        ce = weight * ce
    ce = -jnp.sum(ce, axis=axes) / _counts(y_true, weight, axes)
    return jnp.mean(ce)


def true_positives(y_pred, y_true, weight=None, axes=(1, 2)):
    tp = y_true * y_pred
    if weight is not None:
        tp = weight * tp
    return jnp.sum(tp, axis=axes) / _counts(y_true, weight, axes)


def true_negatives(y_pred, y_true, weight=None, axes=(1, 2)):
    tn = (1 - y_pred) * (1 - y_true)
    if weight is not None:
        tn = weight * tn
    return jnp.sum(tn, axis=axes) / _counts(y_true, weight, axes)


def false_positives(y_pred, y_true, weight=None, axes=(1, 2)):
    fp = (1 - y_true) * y_pred
    if weight is not None:
        fp = weight * fp
    return jnp.sum(fp, axis=axes) / _counts(y_true, weight, axes)


def false_negatives(y_pred, y_true, weight=None, axes=(1, 2)):
    fn = (1 - y_pred) * y_true
    if weight is not None:
        fn = weight * fn
    return jnp.sum(fn, axis=axes) / _counts(y_true, weight, axes)


def dice(y_pred, y_true, weight=None, axes=(1, 2)):
    tp = true_positives(y_pred, y_true, weight, axes)
    fp = false_positives(y_pred, y_true, weight, axes)
    fn = false_negatives(y_pred, y_true, weight, axes)
    return jnp.mean((2 * tp + _EPS) / (2 * tp + fp + fn + _EPS))


def dice_loss(y_pred, y_true, weight=None, axes=(1, 2)):
    return 1 - dice(y_pred, y_true, weight, axes)


def iou(y_pred, y_true, weight=None, axes=(1, 2)):
    tp = true_positives(y_pred, y_true, weight, axes)
    fp = false_positives(y_pred, y_true, weight, axes)
    fn = false_negatives(y_pred, y_true, weight, axes)
    return jnp.mean((tp + _EPS) / (tp + fp + fn + _EPS))


def iou_loss(y_pred, y_true, weight=None, axes=(1, 2)):
    return 1 - iou(y_pred, y_true, weight, axes)


def mcc(y_pred, y_true, weight=None, axes=(1, 2)):
    tp = true_positives(y_pred, y_true, weight, axes)
    tn = true_negatives(y_pred, y_true, weight, axes)
    fp = false_positives(y_pred, y_true, weight, axes)
    fn = false_negatives(y_pred, y_true, weight, axes)
    num = tp * tn - fp * fn
    # the sqrt argument is floored: d/dx sqrt(x) is infinite at 0, which
    # would propagate NaN gradients whenever a batch has an empty confusion
    # matrix (e.g. a zero-weight augmentation crop)
    den = jnp.sqrt(jnp.maximum(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn), _EPS * _EPS))
    return jnp.mean((num + _EPS) / (den + _EPS))


def mcc_loss(y_pred, y_true, weight=None, axes=(1, 2)):
    return 1 - mcc(y_pred, y_true, weight, axes)


def dice_ce_loss(y_pred, y_true, weight=None, axes=(1, 2)):
    return dice_loss(y_pred, y_true, weight, axes) + crossentropy_loss(
        y_pred, y_true, weight, axes
    )


def iou_ce_loss(y_pred, y_true, weight=None, axes=(1, 2)):
    return iou_loss(y_pred, y_true, weight, axes) + crossentropy_loss(
        y_pred, y_true, weight, axes
    )


def mcc_ce_loss(y_pred, y_true, weight=None, axes=(1, 2)):
    return mcc_loss(y_pred, y_true, weight, axes) + crossentropy_loss(
        y_pred, y_true, weight, axes
    )


# UI-name registry, mirroring reference utils.loss_name_to_function (utils.py:458-475)
LOSSES = {
    "Crossentropy (CE)": crossentropy_loss,
    "Dice": dice_loss,
    "Intersection over Union (IoU)": iou_loss,
    "Matthews correlation coefficient (MCC)": mcc_loss,
    "Dice + CE": dice_ce_loss,
    "IoU + CE": iou_ce_loss,
    "MCC + CE": mcc_ce_loss,
}

METRICS = {"Dice": dice, "IoU": iou, "MCC": mcc}


def loss_name_to_function(name: str):
    return LOSSES[name]
