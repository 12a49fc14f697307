"""Sharded train step over a virtual 8-device CPU mesh (SURVEY §4 fake
backends) + the driver's dryrun entry."""

import numpy as np
import pytest


def test_mesh_shapes():
    import jax
    from interactive_unet_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    assert mesh.shape == {"data": 8}
    mesh2 = make_mesh(8, spatial=2)
    assert mesh2.shape == {"data": 4, "space": 2}


def test_dryrun_multichip_8():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import jax
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 256, 256, 2)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, atol=1e-3)


def test_sharded_matches_single_device():
    """DP-sharded step must produce the same loss as the unsharded step."""
    import jax
    import jax.numpy as jnp
    import optax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")

    from interactive_unet_tpu.engine.trainer import make_train_step
    from interactive_unet_tpu.models import build_model
    from interactive_unet_tpu.ops import metrics as M
    from interactive_unet_tpu.parallel import (batch_sharding, make_mesh,
                                               make_sharded_train_step,
                                               replicated)

    model = build_model(architecture="U-Net", encoder_name="cnn_s",
                        num_classes=2)
    loss_fn = M.loss_name_to_function("Dice + CE")
    optimizer = optax.adamw(1e-3)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((4, 32, 32, 1)), jnp.float32)
    y = jnp.asarray((rng.random((4, 32, 32, 2)) > 0.5), jnp.float32)
    w = jnp.ones((4, 32, 32, 2), jnp.float32)
    params = model.init(jax.random.key(0), x[:1])
    opt_state = optimizer.init(params)
    key = jax.random.key(42)

    single = make_train_step(model, loss_fn, optimizer)
    p1, _, loss1, _ = single(params, opt_state, key, x, y, w)

    mesh = make_mesh(4)
    sharded = make_sharded_train_step(model, loss_fn, optimizer, mesh)
    params2 = model.init(jax.random.key(0), x[:1])
    opt2 = optimizer.init(params2)
    params2 = jax.device_put(params2, replicated(mesh))
    opt2 = jax.device_put(opt2, replicated(mesh))
    xb = jax.device_put(x, batch_sharding(mesh))
    yb = jax.device_put(y, batch_sharding(mesh))
    wb = jax.device_put(w, batch_sharding(mesh))
    p2, _, loss2, _ = sharded(params2, opt2, key, xb, yb, wb)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4)


@pytest.mark.parametrize("n_dev", [1, 2, 4, 8])
def test_multistep_divergence_across_mesh_shapes(n_dev):
    """10 sharded optimizer steps must track the single-device trajectory
    for every mesh shape (collectives only reorder float sums)."""
    import jax
    import jax.numpy as jnp
    import optax

    if len(jax.devices()) < n_dev:
        pytest.skip(f"needs {n_dev} virtual devices")

    from interactive_unet_tpu.engine.trainer import make_train_step
    from interactive_unet_tpu.models import build_model
    from interactive_unet_tpu.ops import metrics as M
    from interactive_unet_tpu.parallel import (batch_sharding, make_mesh,
                                               make_sharded_train_step,
                                               replicated)

    model = build_model(architecture="U-Net", encoder_name="cnn_s",
                        num_classes=2)
    loss_fn = M.loss_name_to_function("Dice + CE")
    optimizer = optax.adamw(1e-3)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((8, 32, 32, 1)), jnp.float32)
    y = jnp.asarray((rng.random((8, 32, 32, 2)) > 0.5), jnp.float32)
    w = jnp.ones((8, 32, 32, 2), jnp.float32)

    def run(step_fn, put_batch, put_rep):
        params = put_rep(model.init(jax.random.key(0), x[:1]))
        opt_state = put_rep(optimizer.init(params))
        xb, yb, wb = put_batch(x), put_batch(y), put_batch(w)
        losses = []
        for i in range(10):
            params, opt_state, loss, _ = step_fn(
                params, opt_state, jax.random.key(100 + i), xb, yb, wb)
            losses.append(float(loss))
        return np.array(losses)

    single = make_train_step(model, loss_fn, optimizer)
    ref = run(single, lambda a: a, lambda a: a)

    mesh = make_mesh(n_dev)
    sharded = make_sharded_train_step(model, loss_fn, optimizer, mesh)
    got = run(sharded,
              lambda a: jax.device_put(a, batch_sharding(mesh)),
              lambda a: jax.device_put(a, replicated(mesh)))

    # bf16 forward + reduction reordering: growing but bounded drift
    np.testing.assert_allclose(got, ref, atol=2e-2)
    assert np.isfinite(got).all()


def test_parse_mesh_spec():
    """CLI/env mesh syntax (--mesh / IUNET_MESH) -> Mesh or None."""
    import jax
    import pytest as _pytest

    from interactive_unet_tpu.parallel import parse_mesh_spec

    # off-values and None never touch jax devices
    for off in (None, "", "0", "off", "none", "1"):
        assert parse_mesh_spec(off) is None

    if len(jax.devices()) < 8:
        _pytest.skip("needs 8 virtual devices")
    assert parse_mesh_spec("8").shape == {"data": 8}
    assert parse_mesh_spec("4x2").shape == {"data": 4, "space": 2}
    assert parse_mesh_spec("data=4,space=2").shape == {"data": 4, "space": 2}
    assert parse_mesh_spec("data=8").shape == {"data": 8}
    with _pytest.raises(ValueError, match="bad mesh spec"):
        parse_mesh_spec("banana")
    with _pytest.raises(ValueError, match="bad mesh spec"):
        parse_mesh_spec("data=4,rainbow=2")
    # asking for more devices than exist fails with the XLA_FLAGS hint
    with _pytest.raises(ValueError, match="devices"):
        parse_mesh_spec(str(len(jax.devices()) * 2))
