"""Phase-packed conv path (ops/packconv.py + models/layers.py integration):
exact equivalence with the plain conv formulation, checkpoint compatibility
across layouts, and gradient flow (VERDICT r2 #1 — the MXU conv stack)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from interactive_unet_tpu.models.layers import ConvNormAct
from interactive_unet_tpu.ops import packconv as PC


def _plain_conv(x, w, stride):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_space_depth_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)), jnp.float32)
    xp = PC.space_to_depth(x)
    assert xp.shape == (2, 4, 4, 12)
    np.testing.assert_array_equal(PC.depth_to_space(xp), x)
    # channel-major: packed channel c*4 + 2*pi + pj
    np.testing.assert_array_equal(xp[0, 0, 0, 4:8],
                                  [x[0, 0, 0, 1], x[0, 0, 1, 1],
                                   x[0, 1, 0, 1], x[0, 1, 1, 1]])


@pytest.mark.parametrize("stride", [1, 2])
def test_packed_conv_exact(rng, stride):
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 5)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 5, 7)), jnp.float32)
    ref = PC.space_to_depth(_plain_conv(x, w, stride))
    got = PC.packed_conv3x3(x, w, stride)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("stride", [1, 2])
def test_packed_input_conv_exact(rng, stride):
    """Stay-packed formulation: conv over the PACKED domain equals the
    packed plain conv (no unpack/repack between back-to-back convs)."""
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 5)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 5, 7)), jnp.float32)
    ref = PC.space_to_depth(_plain_conv(x, w, stride))
    got = PC.packed_conv3x3_packed_input(PC.space_to_depth(x), w, stride)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_packed_input_conv_gradients(rng):
    """d(loss)/d(w3) through the packed-domain conv matches the plain path
    (the phase embedding is linear in w3, so grads must agree)."""
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 3)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 4)), jnp.float32)

    def loss_plain(w):
        return jnp.sum(jnp.sin(_plain_conv(x, w, 1)))

    def loss_packed(w):
        y = PC.packed_conv3x3_packed_input(PC.space_to_depth(x), w, 1)
        return jnp.sum(jnp.sin(PC.depth_to_space(y)))

    g0 = jax.grad(loss_plain)(w)
    g1 = jax.grad(loss_packed)(w)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               atol=1e-4, rtol=1e-4)


def test_phase_max_pool_matches_maxpool(rng):
    from flax import linen as nn

    x = jnp.asarray(rng.normal(size=(2, 16, 16, 6)), jnp.float32)
    ref = nn.max_pool(x, (2, 2), strides=(2, 2))
    got = PC.phase_max_pool(PC.space_to_depth(x))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("packed_env,stay_env",
                         [("1", "32"), ("1", "0"), ("0", "32")])
def test_convnormact_packed_handoff_contract(rng, packed_env, stay_env,
                                             monkeypatch):
    """packed_in/packed_out are a layout contract honored by EVERY backend
    path: conv1(packed_out) -> conv2(packed_in) equals the plain chain with
    the same params — packed or plain conv, stay-packed engaged or not."""
    monkeypatch.setenv("IUNET_PACKED_CONV", packed_env)
    monkeypatch.setenv("IUNET_STAYPACKED_MAX_CIN", stay_env)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 5)), jnp.float32)
    m1 = ConvNormAct(8, dtype=jnp.float32)
    m2 = ConvNormAct(12, dtype=jnp.float32)
    p1 = m1.init(jax.random.key(0), x)
    mid = m1.apply(p1, x)
    p2 = m2.init(jax.random.key(1), mid)
    ref = m2.apply(p2, mid)

    m1p = ConvNormAct(8, dtype=jnp.float32, packed_out=True)
    m2p = ConvNormAct(12, dtype=jnp.float32, packed_in=True)
    midp = m1p.apply(p1, x)
    assert midp.shape == (2, 8, 8, 32)          # packed handoff
    got = m2p.apply(p2, midp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_staypacked_scope_same_function(rng, monkeypatch):
    """The flagship U-Net computes the same function inside
    staypacked_scope (the inference trace layout) as outside it."""
    from interactive_unet_tpu.models import build_model
    from interactive_unet_tpu.models.layers import staypacked_scope

    monkeypatch.setenv("IUNET_PACKED_CONV", "1")
    x = jnp.asarray(rng.random((1, 64, 64, 1)), jnp.float32)
    model = build_model(architecture="U-Net", encoder_name="cnn_s",
                        num_classes=2, dtype=jnp.float32)
    p = model.init(jax.random.key(0), x)
    ref = np.asarray(model.apply(p, x))
    with staypacked_scope():
        got = np.asarray(model.apply(p, x))
    np.testing.assert_allclose(got, ref, atol=5e-3, rtol=1e-2)


def test_staypacked_gate_wide_channels(rng, monkeypatch):
    """Above the stay-packed width cutoff the packed_in layer unpacks and
    uses the embedded-kernel form — same function either way."""
    monkeypatch.setenv("IUNET_PACKED_CONV", "1")
    monkeypatch.setenv("IUNET_STAYPACKED_MAX_CIN", "32")
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 64)), jnp.float32)  # Cin=64>32
    m = ConvNormAct(64, dtype=jnp.float32, packed_in=True, packed_out=True)
    xp = PC.space_to_depth(x)
    p = m.init(jax.random.key(0), xp)
    got = PC.depth_to_space(m.apply(p, xp))
    ref = ConvNormAct(64, dtype=jnp.float32).apply(p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_packed_group_norm_matches_flax(rng):
    from flax import linen as nn

    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8)), jnp.float32)
    scale = jnp.asarray(rng.normal(size=(8,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(8,)), jnp.float32)
    gn = nn.GroupNorm(num_groups=4, epsilon=1e-6)
    ref = gn.apply({"params": {"scale": scale, "bias": bias}}, x)
    got = PC.depth_to_space(
        PC.packed_group_norm(PC.space_to_depth(x), 4, scale, bias))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("stride,norm", [(1, "group"), (2, "group"),
                                         (1, "none"), (2, "none")])
def test_convnormact_layout_equivalence(rng, stride, norm, monkeypatch):
    """Same params, same function: packed and plain paths interchange."""
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 5)), jnp.float32)
    m = ConvNormAct(12, stride=stride, norm=norm, dtype=jnp.float32)
    monkeypatch.setenv("IUNET_PACKED_CONV", "1")
    p = m.init(jax.random.key(0), x)
    a = np.asarray(m.apply(p, x))
    monkeypatch.setenv("IUNET_PACKED_CONV", "0")
    b = np.asarray(m.apply(p, x))
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_packed_init_params_match_plain(rng, monkeypatch):
    """Param trees are identical across layouts (checkpoint compatibility:
    a round-2 checkpoint loads into the packed model and vice versa)."""
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 3)), jnp.float32)
    m = ConvNormAct(8, dtype=jnp.float32)
    monkeypatch.setenv("IUNET_PACKED_CONV", "1")
    p_packed = m.init(jax.random.key(0), x)
    monkeypatch.setenv("IUNET_PACKED_CONV", "0")
    p_plain = m.init(jax.random.key(0), x)
    s_packed = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), p_packed)
    s_plain = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), p_plain)
    assert s_packed == s_plain


def test_odd_shapes_fall_back(rng):
    """Odd spatial dims use the plain path with the same params."""
    x_even = jnp.asarray(rng.normal(size=(1, 16, 16, 3)), jnp.float32)
    x_odd = jnp.asarray(rng.normal(size=(1, 15, 15, 3)), jnp.float32)
    m = ConvNormAct(8, dtype=jnp.float32)
    p = m.init(jax.random.key(0), x_even)
    out = m.apply(p, x_odd)
    assert out.shape == (1, 15, 15, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_gradients_flow_and_match(rng, monkeypatch):
    """d(loss)/d(kernel) identical across layouts — the packed conv trains
    the same model."""
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 3)), jnp.float32)
    m = ConvNormAct(8, dtype=jnp.float32)
    monkeypatch.setenv("IUNET_PACKED_CONV", "1")
    p = m.init(jax.random.key(0), x)

    def loss(p):
        return jnp.sum(jnp.square(m.apply(p, x)))

    g_packed = jax.grad(loss)(p)
    monkeypatch.setenv("IUNET_PACKED_CONV", "0")
    g_plain = jax.grad(loss)(p)
    for a, b in zip(jax.tree_util.tree_leaves(g_packed),
                    jax.tree_util.tree_leaves(g_plain)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=1e-3)


def test_full_model_layout_equivalence(rng, monkeypatch):
    """The flagship U-Net computes the same function in both layouts."""
    from interactive_unet_tpu.models import build_model

    x = jnp.asarray(rng.random((1, 64, 64, 1)), jnp.float32)
    model = build_model(architecture="U-Net", encoder_name="cnn_s",
                        num_classes=2, dtype=jnp.float32)
    monkeypatch.setenv("IUNET_PACKED_CONV", "1")
    p = model.init(jax.random.key(0), x)
    a = np.asarray(model.apply(p, x))
    monkeypatch.setenv("IUNET_PACKED_CONV", "0")
    b = np.asarray(model.apply(p, x))
    assert a.shape == b.shape == (1, 64, 64, 2)
    np.testing.assert_allclose(a, b, atol=5e-3, rtol=1e-2)
