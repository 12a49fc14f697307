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
                                 "wide_resnet50_2", "se_resnet50",
                                 "se_resnext50_32x4d",
                                 "vgg16", "densenet121",
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


def test_smp_encoder_name_normalization():
    """smp spellings from saved reference configs fold to ladder names
    (reference unet.py:28 accepts any smp encoder string); unknown names
    pass through so build_encoder still raises with the canonical list."""
    from interactive_unet_tpu.config import TrainConfig
    from interactive_unet_tpu.models.registry import normalize_encoder_name

    assert normalize_encoder_name("timm-efficientnet-b3") == "efficientnet_b3"
    assert normalize_encoder_name("efficientnet-b0") == "efficientnet_b0"
    assert normalize_encoder_name(
        "timm-tf_efficientnet_lite1") == "efficientnet_lite1"
    assert normalize_encoder_name(
        "timm-mobilenetv3_large_100") == "mobilenet_v3_large"
    # canonical names are untouched, including the pre-existing alias
    assert normalize_encoder_name("resnet50") == "resnet50"
    assert normalize_encoder_name("mit_b2") == "mit_b2"
    # no geometry match -> unchanged -> build_encoder raises
    assert normalize_encoder_name("timm-resnest50d") == "timm-resnest50d"
    # tf_ strips ONLY for the efficientnet_lite family (ADVICE r4): the TF
    # b-variants use SAME padding, a different geometry from the ladder's
    # torchvision-style efficientnet_b*, so they must NOT silently fold
    assert normalize_encoder_name(
        "timm-tf_efficientnet_b3") == "timm-tf_efficientnet_b3"
    with pytest.raises(ValueError):
        models.build_model(encoder_name="timm-tf_efficientnet_b3")
    with pytest.raises(ValueError):
        models.build_model(encoder_name="timm-resnest50d")

    # the saved-config path folds at load time
    cfg = TrainConfig.from_json(
        '{"encoder_name": "timm-efficientnet-b2", "lr": 0.001}')
    assert cfg.encoder_name == "efficientnet_b2"
