"""Fused training program: epoch semantics, remat equivalence, mesh-sharded
path equals single-device."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from interactive_unet_tpu.engine.fused_train import make_fused_train_fn
from interactive_unet_tpu.models import build_model
from interactive_unet_tpu.ops import metrics as M


def _setup(n=6, s=32, classes=2, seed=0):
    model = build_model(architecture="U-Net", encoder_name="cnn_s",
                        num_classes=classes)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.random((n, s, s, 1)), jnp.float32)
    y = jnp.asarray((rng.random((n, s, s, classes)) > 0.5), jnp.float32)
    w = jnp.ones((n, s, s, classes), jnp.float32)
    params = model.init(jax.random.key(seed), x[:1])
    opt = optax.adamw(1e-3)
    return model, opt, params, (x, y, w)


def _run(fn, params, opt, data, epochs_calls=2, key0=0):
    opt_state = opt.init(params)
    best = jax.tree_util.tree_map(jnp.copy, params)
    bv = jnp.asarray(jnp.inf)
    logs_all = []
    for e in range(epochs_calls):
        params, opt_state, best, bv, logs = fn(
            params, opt_state, best, bv, jax.random.key(key0 + e),
            *data, *data)
        logs_all.append(np.asarray(logs))
    return params, best, float(bv), np.concatenate(logs_all)


def test_epoch_logs_shape_and_best_tracking():
    model, opt, params, data = _setup()
    loss_fn = M.loss_name_to_function("Dice + CE")
    fn = make_fused_train_fn(model, loss_fn, opt, 6, 6, 4, epochs=3)
    opt_state = opt.init(params)
    best = jax.tree_util.tree_map(jnp.copy, params)
    p, o, best, bv, logs = fn(params, opt_state, best, jnp.asarray(jnp.inf),
                              jax.random.key(0), *data, *data)
    assert logs.shape == (3, 8)
    assert np.isfinite(np.asarray(logs)).all()
    # best val loss equals the minimum of the logged val losses
    np.testing.assert_allclose(float(bv), np.asarray(logs)[:, 4].min(),
                               rtol=1e-6)


def test_remat_matches_plain():
    model, opt, params, data = _setup()
    loss_fn = M.loss_name_to_function("Dice + CE")
    f1 = make_fused_train_fn(model, loss_fn, opt, 6, 6, 3, epochs=1)
    f2 = make_fused_train_fn(model, loss_fn, opt, 6, 6, 3, epochs=1,
                             remat=True)
    p1 = jax.tree_util.tree_map(jnp.copy, params)
    p2 = jax.tree_util.tree_map(jnp.copy, params)
    _, _, bv1, logs1 = _run(f1, p1, opt, data, epochs_calls=1)
    _, _, bv2, logs2 = _run(f2, p2, opt, data, epochs_calls=1)
    np.testing.assert_allclose(logs1, logs2, rtol=1e-4, atol=1e-5)


def test_sharded_fused_matches_single():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from interactive_unet_tpu.parallel import make_mesh, batch_sharding, replicated

    model, opt, params, data = _setup(n=8, s=32)
    loss_fn = M.loss_name_to_function("MCC + CE")

    f_single = make_fused_train_fn(model, loss_fn, opt, 8, 8, 4, epochs=2)
    p1 = jax.tree_util.tree_map(jnp.copy, params)
    _, _, bv1, logs1 = _run(f_single, p1, opt, data, epochs_calls=1)

    mesh = make_mesh(4)
    f_shard = make_fused_train_fn(model, loss_fn, opt, 8, 8, 4, epochs=2,
                                  batch_sharding=batch_sharding(mesh))
    rep = replicated(mesh)
    p2 = jax.device_put(jax.tree_util.tree_map(jnp.copy, params), rep)
    data_r = tuple(jax.device_put(d, rep) for d in data)
    _, _, bv2, logs2 = _run(f_shard, p2, opt, data_r, epochs_calls=1)

    # collective reductions reorder float sums; after two optimizer steps the
    # drift is small but nonzero (near-zero MCC values make rtol meaningless)
    np.testing.assert_allclose(logs1, logs2, atol=1.5e-2)


def test_capacity_padding_is_exact():
    """Growing the buffers to a capacity bucket (with garbage in the padded
    rows) must not change a single bit of the run: pads are weight-masked,
    index-clamped, and all-pad batches skip the optimizer update."""
    from interactive_unet_tpu.engine.fused_train import (capacity_bucket,
                                                         pad_to_capacity)

    model, opt, params, data = _setup(n=6, s=32)
    loss_fn = M.loss_name_to_function("Dice + CE")
    x, y, w = [np.asarray(d) for d in data]
    cap = capacity_bucket(6, 4)
    assert cap == 8

    def run(fill):
        xp, yp, wp = pad_to_capacity((x, y, w), cap)
        xp[6:], yp[6:], wp[6:] = fill, fill, fill  # garbage in the pads
        fn = make_fused_train_fn(model, loss_fn, opt, cap, cap, 4, epochs=2)
        p = jax.tree_util.tree_map(jnp.copy, params)
        opt_state = opt.init(p)
        best = jax.tree_util.tree_map(jnp.copy, p)
        p, _, best, bv, logs = fn(p, opt_state, best, jnp.asarray(jnp.inf),
                                  jax.random.key(3),
                                  *(jnp.asarray(a) for a in (xp, yp, wp)),
                                  *(jnp.asarray(a) for a in (xp, yp, wp)),
                                  jnp.int32(6), jnp.int32(6))
        return np.asarray(logs), jax.device_get(p)

    logs_a, pa = run(0.0)
    logs_b, pb = run(123.0)
    np.testing.assert_array_equal(logs_a, logs_b)
    for la, lb in zip(jax.tree_util.tree_leaves(pa),
                      jax.tree_util.tree_leaves(pb)):
        np.testing.assert_array_equal(la, lb)
