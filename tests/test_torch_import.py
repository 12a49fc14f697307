"""torch -> JAX weight import: BN folding math + graft into our encoder."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_bn_folding_exact():
    """Folded conv must equal conv+BN applied sequentially."""
    from interactive_unet_tpu.utils.torch_import import _fold_bn

    rng = np.random.default_rng(0)
    w = rng.normal(size=(8, 4, 3, 3)).astype(np.float32)
    gamma = rng.normal(size=8).astype(np.float32) + 1
    beta = rng.normal(size=8).astype(np.float32)
    mean = rng.normal(size=8).astype(np.float32)
    var = rng.random(8).astype(np.float32) + 0.5

    x = torch.tensor(rng.normal(size=(1, 4, 8, 8)).astype(np.float32))
    conv = torch.nn.Conv2d(4, 8, 3, padding=1, bias=False)
    conv.weight.data = torch.tensor(w)
    bn = torch.nn.BatchNorm2d(8, eps=1e-5).eval()
    bn.weight.data = torch.tensor(gamma)
    bn.bias.data = torch.tensor(beta)
    bn.running_mean.data = torch.tensor(mean)
    bn.running_var.data = torch.tensor(var)
    expected = bn(conv(x)).detach().numpy()

    wf, bf = _fold_bn(w, gamma, beta, mean, var)
    conv2 = torch.nn.Conv2d(4, 8, 3, padding=1, bias=True)
    conv2.weight.data = torch.tensor(wf)
    conv2.bias.data = torch.tensor(bf)
    got = conv2(x).detach().numpy()
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_import_and_graft_mobilenet():
    """Import a torchvision-layout MobileNetV2 state dict and graft matching
    convs into our MobileNetV2Encoder params."""
    try:
        from torchvision.models import mobilenet_v2
    except Exception:
        pytest.skip("torchvision unavailable")

    import jax
    import jax.numpy as jnp

    from interactive_unet_tpu.models.encoders import MobileNetV2Encoder
    from interactive_unet_tpu.utils.torch_import import (
        graft_convs_into_params, import_mobilenet_v2_features)

    tm = mobilenet_v2(weights=None)  # random init; no egress for weights
    imported = import_mobilenet_v2_features(tm.features.state_dict())
    assert len(imported) > 30  # all convs found
    shapes = {v["w"].shape for v in imported.values()}
    assert any(s[-2] == 3 for s in shapes)  # first conv consumes RGB

    enc = MobileNetV2Encoder()
    params = enc.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3), jnp.bfloat16))
    new_params, grafted = graft_convs_into_params(params, imported)
    assert grafted >= 5  # matching-shape convs transferred
    # grafted params still run
    feats = enc.apply(new_params, jnp.zeros((1, 64, 64, 3), jnp.bfloat16))
    assert len(feats) == 5
