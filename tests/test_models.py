"""Model zoo: every architecture builds, runs, outputs probabilities at the
input resolution; gradients flow (reference capability of unet.py:33-61)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from interactive_unet_tpu import models


@pytest.mark.parametrize("arch", models.ARCHITECTURES)
def test_architecture_forward(arch):
    m = models.build_model(architecture=arch,
                           encoder_name="mit_b0" if arch == "Segformer" else "cnn_s",
                           num_classes=3)
    x = jnp.zeros((1, 64, 64, 1), jnp.float32)
    params = m.init(jax.random.key(0), x)
    y = m.apply(params, x)
    assert y.shape == (1, 64, 64, 3)
    # probabilities: sum to 1 over class axis
    np.testing.assert_allclose(np.asarray(jnp.sum(y, -1)), 1.0, atol=1e-3)


@pytest.mark.parametrize("enc", ["cnn_s", "mobilenet_v2", "efficientnet_lite0",
                                 "efficientnet_b0", "efficientnet_b2",
                                 "mobilenet_v3_large", "mobilenet_v3_small",
                                 "resnet", "resnet50", "resnext50_32x4d",
                                 "wide_resnet50_2", "vgg16", "densenet121",
                                 "mit_b0", "mit_b1", "mit_b2", "mit_b3"])
def test_encoders_pyramid(enc):
    e = models.registry.build_encoder(enc)
    x = jnp.zeros((1, 64, 64, 1), jnp.bfloat16)
    params = e.init(jax.random.key(0), x)
    feats = e.apply(params, x)
    assert len(feats) == 5
    sizes = [f.shape[1] for f in feats]
    # strides (2, 4, 8, 16, 32): stride-2 stems keep batch-1 narrow-channel
    # convs off the full resolution (models/encoders.py TPU rationale)
    assert sizes == [32, 16, 8, 4, 2]


def test_gradients_flow():
    m = models.build_model(architecture="U-Net", encoder_name="cnn_s",
                           num_classes=2)
    x = jnp.ones((2, 32, 32, 1), jnp.float32)
    y = jnp.zeros((2, 32, 32, 2), jnp.float32).at[..., 0].set(1.0)
    params = m.init(jax.random.key(0), x)

    def loss_fn(p):
        pred = m.apply(p, x)
        return -jnp.mean(y * jnp.log(pred + 1e-9))

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)


def test_unknown_names_raise():
    with pytest.raises(ValueError):
        models.build_model(architecture="nope")
    with pytest.raises(ValueError):
        models.build_model(encoder_name="nope")
