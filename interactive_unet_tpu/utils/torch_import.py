"""torch -> JAX pretrained encoder weight import (SURVEY hard part #4).

The reference gets ImageNet encoders from segmentation-models-pytorch
(reference unet.py:28-31).  There is no TPU-native weight source and no
egress in this environment, so the contract is: if the user has a torch
MobileNetV2 checkpoint locally (torchvision ``mobilenet_v2`` state_dict or a
full-model dict), ``maybe_load_pretrained`` grafts it into our encoder at
init time.

How it maps:
- our ``MobileNetV2Encoder`` mirrors torchvision's ``features`` stage
  geometry block-for-block (models/encoders.py), so every conv has a unique
  NAME-mapped destination — no shape guessing;
- torch BatchNorm (eval mode) is folded into the preceding conv
  (w' = w * gamma/sqrt(var+eps), b' = beta - mean * gamma/sqrt(var+eps));
  the destination encoder must be built with ``norm="none"``
  (``build_model(pretrained=True)`` does this), which computes exactly the
  torch eval-mode function;
- torch OIHW kernels transpose to flax HWIO; depthwise (C,1,3,3) -> (3,3,1,C).

Checkpoint discovery: $IUNET_PRETRAINED_DIR or ~/.cache/interactive_unet_tpu/
pretrained/, file ``<encoder_name>.pt[h]``.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np


def _oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _fold_bn(conv_w, bn_gamma, bn_beta, bn_mean, bn_var, eps=1e-5):
    """Absorb eval-mode BatchNorm into the conv; returns (w', b') in OIHW."""
    scale = bn_gamma / np.sqrt(bn_var + eps)
    w = conv_w * scale[:, None, None, None]  # OIHW: scale output channels
    b = bn_beta - bn_mean * scale
    return w, b


# torchvision mobilenet_v2 inverted_residual_setting: (expand, out, n, stride)
_MNV2_SETTING = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2),
                 (6, 64, 4, 2), (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]


def _np(v):
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)


def _folded(sd, conv_key, bn_key):
    w, b = _fold_bn(_np(sd[f"{conv_key}.weight"]),
                    _np(sd[f"{bn_key}.weight"]), _np(sd[f"{bn_key}.bias"]),
                    _np(sd[f"{bn_key}.running_mean"]),
                    _np(sd[f"{bn_key}.running_var"]))
    return {"kernel": _oihw_to_hwio(w), "bias": b}


def mobilenet_v2_to_flax(state_dict: dict) -> dict:
    """torchvision ``mobilenet_v2`` (full model or ``.features``) state_dict
    -> nested flax param dict for ``MobileNetV2Encoder(norm="none")``.

    Raises KeyError if the dict doesn't have the torchvision layout."""
    sd = {k.removeprefix("features.") if k.startswith("features.") else k:
          v for k, v in state_dict.items()}
    # accept full-model dicts ("features.0.0.weight") already stripped above;
    # drop the classifier and the final 1280-wide ConvBNReLU (features.18) —
    # our pyramid stops at the 320-channel stage like smp's depth-5 cut
    out = {}
    out["ConvNormAct_0"] = {"Conv_0": _folded(sd, "0.0", "0.1")}  # stem

    block = 0
    feat_idx = 1
    for expand, _c_out, n, _s in _MNV2_SETTING:
        for _ in range(n):
            scope = {}
            if expand == 1:
                # torchvision: conv.0 = ConvBNReLU(depthwise), conv.1/2 = project
                scope["ConvNormAct_0"] = {"Conv_0": _folded(
                    sd, f"{feat_idx}.conv.0.0", f"{feat_idx}.conv.0.1")}
                scope["ConvNormAct_1"] = {"Conv_0": _folded(
                    sd, f"{feat_idx}.conv.1", f"{feat_idx}.conv.2")}
            else:
                # conv.0 = expand 1x1, conv.1 = depthwise, conv.2/3 = project
                scope["ConvNormAct_0"] = {"Conv_0": _folded(
                    sd, f"{feat_idx}.conv.0.0", f"{feat_idx}.conv.0.1")}
                scope["ConvNormAct_1"] = {"Conv_0": _folded(
                    sd, f"{feat_idx}.conv.1.0", f"{feat_idx}.conv.1.1")}
                scope["ConvNormAct_2"] = {"Conv_0": _folded(
                    sd, f"{feat_idx}.conv.2", f"{feat_idx}.conv.3")}
            out[f"InvertedResidual_{block}"] = scope
            block += 1
            feat_idx += 1
    return out


def adapt_input_channels(kernel: np.ndarray, num_channels: int) -> np.ndarray:
    """ImageNet stems expect 3 input channels; volumes here are usually 1.
    Sum the RGB taps for 1 channel (standard grayscale adaptation; preserves
    response magnitude), or tile-and-rescale for other counts."""
    h, w, c_in, c_out = kernel.shape
    if c_in == num_channels:
        return kernel
    if num_channels == 1:
        return kernel.sum(axis=2, keepdims=True)
    reps = -(-num_channels // c_in)
    k = np.tile(kernel, (1, 1, reps, 1))[:, :, :num_channels, :]
    return k * (c_in / num_channels)


def resnet_to_flax(state_dict: dict, layers=(2, 2, 2, 2),
                   bottleneck: bool = False) -> dict:
    """torchvision ``resnet18/34`` (BasicBlock) or ``resnet50/101``
    (Bottleneck, ``bottleneck=True``) state_dict -> nested flax param dict
    for ``TorchResNetEncoder(norm="none")`` (models/encoders.py).
    The fc head is ignored; BN folds into biased convs."""
    sd = state_dict
    out = {"ConvNormAct_0": {"Conv_0": _folded(sd, "conv1", "bn1")}}
    kind = "TorchBottleneckBlock" if bottleneck else "TorchBasicBlock"
    block = 0
    for stage, n in enumerate(layers):
        for b in range(n):
            pre = f"layer{stage + 1}.{b}"
            scope = {
                "ConvNormAct_0": {"Conv_0": _folded(sd, f"{pre}.conv1",
                                                    f"{pre}.bn1")},
                "ConvNormAct_1": {"Conv_0": _folded(sd, f"{pre}.conv2",
                                                    f"{pre}.bn2")},
            }
            if bottleneck:
                scope["ConvNormAct_2"] = {"Conv_0": _folded(
                    sd, f"{pre}.conv3", f"{pre}.bn3")}
            if f"{pre}.downsample.0.weight" in sd:
                scope["Conv_0"] = _folded(sd, f"{pre}.downsample.0",
                                          f"{pre}.downsample.1")
            out[f"{kind}_{block}"] = scope
            block += 1
    return out


def efficientnet_lite_to_flax(state_dict: dict,
                              variant: str = "efficientnet_lite0") -> dict:
    """timm ``efficientnet_lite{0,1,2}`` state_dict -> nested flax params
    for ``TimmEfficientNetLiteEncoder(norm="none")``.

    Key layout is timm's EfficientNet: conv_stem/bn1, blocks.0.* depthwise-
    separable (conv_dw/bn1, conv_pw/bn2), blocks.1-6.* inverted residual
    (conv_pw/bn1, conv_dw/bn2, conv_pwl/bn3); conv_head and the classifier
    are ignored (the pyramid stops at the 320 stage, smp depth-5 cut).
    Padding caveat: timm's ``tf_`` prefixed variants use TF-SAME
    (asymmetric) padding on stride-2 convs; this encoder uses standard
    symmetric torch padding, i.e. the ``efficientnet_lite*`` (non-tf)
    variants' exact function."""
    from ..models.encoders import _efflite_arch

    sd = state_dict
    reps, _ = _efflite_arch(variant)
    out = {"ConvNormAct_0": {"Conv_0": _folded(sd, "conv_stem", "bn1")}}
    block = 0
    for stage, r in enumerate(reps):
        for b in range(r):
            pre = f"blocks.{stage}.{b}"
            if stage == 0:  # DepthwiseSeparableConv: dw then pw
                scope = {
                    "ConvNormAct_0": {"Conv_0": _folded(
                        sd, f"{pre}.conv_dw", f"{pre}.bn1")},
                    "ConvNormAct_1": {"Conv_0": _folded(
                        sd, f"{pre}.conv_pw", f"{pre}.bn2")},
                }
            else:           # InvertedResidual: expand, dw, project
                scope = {
                    "ConvNormAct_0": {"Conv_0": _folded(
                        sd, f"{pre}.conv_pw", f"{pre}.bn1")},
                    "ConvNormAct_1": {"Conv_0": _folded(
                        sd, f"{pre}.conv_dw", f"{pre}.bn2")},
                    "ConvNormAct_2": {"Conv_0": _folded(
                        sd, f"{pre}.conv_pwl", f"{pre}.bn3")},
                }
            out[f"InvertedResidual_{block}"] = scope
            block += 1
    return out


def efficientnet_to_flax(state_dict: dict,
                         variant: str = "efficientnet_b0") -> dict:
    """torchvision ``efficientnet_b0-b5`` state_dict -> nested flax params
    for ``TorchEfficientNetEncoder(norm="none")``.

    torchvision key layout (models/efficientnet.py): ``features.0`` is the
    stem Conv2dNormActivation; ``features.{1..7}.{b}.block`` is a
    Sequential of [expand CNA (stages 2-7 only),] depthwise CNA,
    SqueezeExcitation (``fc1``/``fc2`` biased 1x1 convs), project CNA;
    ``features.8`` (head conv) and the classifier are ignored (depth-5
    pyramid cut)."""
    from ..models.encoders import _effnet_arch

    sd = state_dict
    _, reps, _ = _effnet_arch(variant)
    out = {"ConvNormAct_0": {"Conv_0": _folded(sd, "features.0.0",
                                               "features.0.1")}}
    block = 0
    for stage, r in enumerate(reps):
        for b in range(r):
            pre = f"features.{stage + 1}.{b}.block"
            scope = {}
            i = 0
            if stage != 0:                    # expand conv present
                scope["ConvNormAct_0"] = {"Conv_0": _folded(
                    sd, f"{pre}.0.0", f"{pre}.0.1")}
                i = 1
                dw, proj = "ConvNormAct_1", "ConvNormAct_2"
            else:
                dw, proj = "ConvNormAct_0", "ConvNormAct_1"
            scope[dw] = {"Conv_0": _folded(sd, f"{pre}.{i}.0",
                                           f"{pre}.{i}.1")}
            scope["SqueezeExcite_0"] = {
                "Conv_0": _conv(sd, f"{pre}.{i + 1}.fc1"),
                "Conv_1": _conv(sd, f"{pre}.{i + 1}.fc2"),
            }
            scope[proj] = {"Conv_0": _folded(sd, f"{pre}.{i + 2}.0",
                                             f"{pre}.{i + 2}.1")}
            out[f"MBConvSE_{block}"] = scope
            block += 1
    return out


def mobilenet_v3_to_flax(state_dict: dict,
                         variant: str = "mobilenet_v3_large") -> dict:
    """torchvision ``mobilenet_v3_large/small`` state_dict -> nested flax
    params for ``TorchMobileNetV3Encoder(norm="none")``.

    Key layout (models/mobilenetv3.py): ``features.0`` stem CNA;
    ``features.{i}.block`` is a Sequential of [expand CNA (when expanded !=
    input channels),] depthwise CNA, [SqueezeExcitation (fc1/fc2),] project
    CNA; the trailing 1x1 head CNA and classifier are ignored."""
    from ..models.encoders import _MNV3_CONFS

    sd = state_dict
    out = {"ConvNormAct_0": {"Conv_0": _folded(sd, "features.0.0",
                                               "features.0.1")}}
    cin = 16
    for i, (_k, exp, c, se, _act, _s) in enumerate(_MNV3_CONFS[variant]):
        pre = f"features.{i + 1}.block"
        scope = {}
        j = n = 0           # torch submodule index / our call counter
        if exp != cin:
            scope[f"ConvNormAct_{n}"] = {"Conv_0": _folded(
                sd, f"{pre}.{j}.0", f"{pre}.{j}.1")}
            j += 1
            n += 1
        scope[f"ConvNormAct_{n}"] = {"Conv_0": _folded(
            sd, f"{pre}.{j}.0", f"{pre}.{j}.1")}
        j += 1
        n += 1
        if se:
            scope["SqueezeExciteV3_0"] = {
                "Conv_0": _conv(sd, f"{pre}.{j}.fc1"),
                "Conv_1": _conv(sd, f"{pre}.{j}.fc2"),
            }
            j += 1
        scope[f"ConvNormAct_{n}"] = {"Conv_0": _folded(
            sd, f"{pre}.{j}.0", f"{pre}.{j}.1")}
        out[f"MobileNetV3Block_{i}"] = scope
        cin = c
    return out


def vgg_to_flax(state_dict: dict, variant: str = "vgg16") -> dict:
    """torchvision ``vgg11/13/16/19`` (plain or ``_bn``; auto-detected from
    the state dict) -> nested flax params for ``TorchVGGEncoder(norm="none")``.
    Plain VGG convs already carry biases and map directly; _bn variants fold
    eval-mode BN into the conv.  The classifier head is ignored."""
    from ..models.encoders import _VGG_CFGS

    sd = state_dict
    out = {}
    idx = 0      # torchvision features.<idx> module counter
    k = 0        # our ConvNormAct call-order counter
    bn = "features.1.running_mean" in sd
    for reps in _VGG_CFGS[variant]:
        for _ in range(reps):
            if bn:
                out[f"ConvNormAct_{k}"] = {"Conv_0": _folded(
                    sd, f"features.{idx}", f"features.{idx + 1}")}
                idx += 3                     # conv, bn, relu
            else:
                out[f"ConvNormAct_{k}"] = {"Conv_0": _conv(
                    sd, f"features.{idx}")}
                idx += 2                     # conv, relu
            k += 1
        idx += 1                             # maxpool
    return out


def densenet_to_flax(state_dict: dict, variant: str = "densenet121") -> dict:
    """torchvision ``densenet121/161/169/201`` state_dict -> nested flax
    params for ``TorchDenseNetEncoder(norm="none")``.

    DenseNet BN is pre-activation (norm-relu-conv), so instead of folding it
    maps each BN onto an ``_Affine`` module (scale = gamma/sqrt(var+eps),
    bias = beta - mean*scale — the exact eval-mode BN function); all convs
    are bias-free, exactly like torch.  The classifier is ignored."""
    from ..models.encoders import _DENSENET_FORMS

    sd = state_dict
    block_config, _, _ = _DENSENET_FORMS[variant]

    def _aff(key):
        g, b = _np(sd[f"{key}.weight"]), _np(sd[f"{key}.bias"])
        m, v = _np(sd[f"{key}.running_mean"]), _np(sd[f"{key}.running_var"])
        s = g / np.sqrt(v + 1e-5)
        return {"scale": s, "bias": b - m * s}

    def _k(key):
        return {"kernel": _oihw_to_hwio(_np(sd[f"{key}.weight"]))}

    out = {"Conv_0": _k("features.conv0"), "_Affine_0": _aff("features.norm0")}
    layer, aff, conv = 0, 1, 1
    for i, n in enumerate(block_config):
        for j in range(n):
            pre = f"features.denseblock{i + 1}.denselayer{j + 1}"
            out[f"TorchDenseLayer_{layer}"] = {
                "_Affine_0": _aff(f"{pre}.norm1"),
                "Conv_0": _k(f"{pre}.conv1"),
                "_Affine_1": _aff(f"{pre}.norm2"),
                "Conv_1": _k(f"{pre}.conv2"),
            }
            layer += 1
        if i < len(block_config) - 1:
            t = f"features.transition{i + 1}"
            out[f"_Affine_{aff}"] = _aff(f"{t}.norm")
            out[f"Conv_{conv}"] = _k(f"{t}.conv")
            aff += 1
            conv += 1
    out[f"_Affine_{aff}"] = _aff("features.norm5")
    return out


def _dense(sd, key):
    """torch nn.Linear -> flax nn.Dense (kernel transposed)."""
    return {"kernel": _np(sd[f"{key}.weight"]).T,
            "bias": _np(sd[f"{key}.bias"])}


def _ln(sd, key):
    """torch nn.LayerNorm -> flax nn.LayerNorm."""
    return {"scale": _np(sd[f"{key}.weight"]),
            "bias": _np(sd[f"{key}.bias"])}


def _conv(sd, key):
    """Biased torch conv (incl. depthwise (C,1,k,k)) -> flax HWIO."""
    return {"kernel": _oihw_to_hwio(_np(sd[f"{key}.weight"])),
            "bias": _np(sd[f"{key}.bias"])}


def mit_to_flax(state_dict: dict, depths=(2, 2, 2, 2)) -> dict:
    """Official SegFormer ``mit_b0`` state_dict (NVlabs mix_transformer.py
    layout; also what smp/timm redistribute) -> nested flax params for
    ``models.segformer.TorchMiTEncoder``.  The stride-2 ``stem`` feat has no
    torch counterpart and stays at its fresh init (overlay only touches
    mapped keys).  mmseg-style ``backbone.`` prefixes are stripped; the
    segmentation head (``head.*``/``decode_head.*``) is ignored."""
    sd = {k.removeprefix("backbone."): v for k, v in state_dict.items()
          if not k.startswith(("head.", "decode_head."))}
    out = {}
    for i, depth in enumerate(depths):
        s = i + 1
        out[f"patch_embed{s}_proj"] = _conv(sd, f"patch_embed{s}.proj")
        out[f"patch_embed{s}_norm"] = _ln(sd, f"patch_embed{s}.norm")
        for j in range(depth):
            pre = f"block{s}.{j}"
            attn = {
                "q": _dense(sd, f"{pre}.attn.q"),
                "kv": _dense(sd, f"{pre}.attn.kv"),
                "proj": _dense(sd, f"{pre}.attn.proj"),
            }
            if f"{pre}.attn.sr.weight" in sd:
                attn["sr"] = _conv(sd, f"{pre}.attn.sr")
                attn["norm"] = _ln(sd, f"{pre}.attn.norm")
            out[f"block{s}_{j}"] = {
                "norm1": _ln(sd, f"{pre}.norm1"),
                "norm2": _ln(sd, f"{pre}.norm2"),
                "attn": attn,
                "mlp": {
                    "fc1": _dense(sd, f"{pre}.mlp.fc1"),
                    "dwconv": _conv(sd, f"{pre}.mlp.dwconv.dwconv"),
                    "fc2": _dense(sd, f"{pre}.mlp.fc2"),
                },
            }
        out[f"norm{s}"] = _ln(sd, f"norm{s}")
    return out


import functools as _functools

_IMPORTERS = {
    "mit_b0": mit_to_flax,
    "mit_b1": mit_to_flax,
    "mit_b2": _functools.partial(mit_to_flax, depths=(3, 4, 6, 3)),
    "mit_b3": _functools.partial(mit_to_flax, depths=(3, 4, 18, 3)),
    "mit_b4": _functools.partial(mit_to_flax, depths=(3, 8, 27, 3)),
    "mit_b5": _functools.partial(mit_to_flax, depths=(3, 6, 40, 3)),
    "mobilenet_v2": mobilenet_v2_to_flax,
    "mobilenet_v3_large": _functools.partial(
        mobilenet_v3_to_flax, variant="mobilenet_v3_large"),
    "mobilenet_v3_small": _functools.partial(
        mobilenet_v3_to_flax, variant="mobilenet_v3_small"),
    "resnet18": _functools.partial(resnet_to_flax, layers=(2, 2, 2, 2)),
    "resnet": _functools.partial(resnet_to_flax, layers=(2, 2, 2, 2)),
    "resnet34": _functools.partial(resnet_to_flax, layers=(3, 4, 6, 3)),
    "resnet50": _functools.partial(resnet_to_flax, layers=(3, 4, 6, 3),
                                   bottleneck=True),
    # resnext/wide share torchvision's resnet key layout exactly (the
    # groups/base_width changes touch only tensor shapes, which the
    # destination encoder determines)
    "resnet101": _functools.partial(resnet_to_flax, layers=(3, 4, 23, 3),
                                    bottleneck=True),
    "resnet152": _functools.partial(resnet_to_flax, layers=(3, 8, 36, 3),
                                    bottleneck=True),
    "resnext50_32x4d": _functools.partial(resnet_to_flax,
                                          layers=(3, 4, 6, 3),
                                          bottleneck=True),
    "resnext101_32x8d": _functools.partial(resnet_to_flax,
                                           layers=(3, 4, 23, 3),
                                           bottleneck=True),
    "wide_resnet50_2": _functools.partial(resnet_to_flax,
                                          layers=(3, 4, 6, 3),
                                          bottleneck=True),
    "vgg11": _functools.partial(vgg_to_flax, variant="vgg11"),
    "vgg13": _functools.partial(vgg_to_flax, variant="vgg13"),
    "vgg16": _functools.partial(vgg_to_flax, variant="vgg16"),
    "vgg19": _functools.partial(vgg_to_flax, variant="vgg19"),
    "vgg11_bn": _functools.partial(vgg_to_flax, variant="vgg11"),
    "vgg13_bn": _functools.partial(vgg_to_flax, variant="vgg13"),
    "vgg16_bn": _functools.partial(vgg_to_flax, variant="vgg16"),
    "vgg19_bn": _functools.partial(vgg_to_flax, variant="vgg19"),
    "densenet121": _functools.partial(densenet_to_flax,
                                      variant="densenet121"),
    "densenet161": _functools.partial(densenet_to_flax,
                                      variant="densenet161"),
    "densenet169": _functools.partial(densenet_to_flax,
                                      variant="densenet169"),
    "densenet201": _functools.partial(densenet_to_flax,
                                      variant="densenet201"),
    "efficientnet_b0": _functools.partial(
        efficientnet_to_flax, variant="efficientnet_b0"),
    "efficientnet_b1": _functools.partial(
        efficientnet_to_flax, variant="efficientnet_b1"),
    "efficientnet_b2": _functools.partial(
        efficientnet_to_flax, variant="efficientnet_b2"),
    "efficientnet_b3": _functools.partial(
        efficientnet_to_flax, variant="efficientnet_b3"),
    "efficientnet_b4": _functools.partial(
        efficientnet_to_flax, variant="efficientnet_b4"),
    "efficientnet_b5": _functools.partial(
        efficientnet_to_flax, variant="efficientnet_b5"),
    "efficientnet_b6": _functools.partial(
        efficientnet_to_flax, variant="efficientnet_b6"),
    "efficientnet_b7": _functools.partial(
        efficientnet_to_flax, variant="efficientnet_b7"),
    "efficientnet_lite0": _functools.partial(
        efficientnet_lite_to_flax, variant="efficientnet_lite0"),
    "timm-tf_efficientnet_lite0": _functools.partial(
        efficientnet_lite_to_flax, variant="efficientnet_lite0"),
    "efficientnet_lite1": _functools.partial(
        efficientnet_lite_to_flax, variant="efficientnet_lite1"),
    "efficientnet_lite2": _functools.partial(
        efficientnet_lite_to_flax, variant="efficientnet_lite2"),
}


def default_search_dirs():
    env = os.environ.get("IUNET_PRETRAINED_DIR")
    dirs = [Path(env)] if env else []
    dirs.append(Path.home() / ".cache" / "interactive_unet_tpu" / "pretrained")
    return dirs


def find_checkpoint(encoder_name: str, search_dirs=None):
    for d in (search_dirs or default_search_dirs()):
        for ext in (".pt", ".pth"):
            p = Path(d) / f"{encoder_name}{ext}"
            if p.is_file():
                return p
    return None


def load_torch_state_dict(path):
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if isinstance(obj, dict) and isinstance(obj.get("state_dict"), dict):
        # mmseg/lightning-style wrapper: {"meta": ..., "state_dict": {...}}
        # (the usual container for backbone.-prefixed SegFormer ckpts)
        obj = obj["state_dict"]
    return obj


def graft_encoder_params(params, encoder_params: dict):
    """Overlay imported encoder weights onto a full model pytree (the
    encoder submodule scope is named 'encoder')."""
    import jax

    params = jax.tree_util.tree_map(np.asarray, params)
    scope = params["params"]["encoder"]
    count = 0

    def overlay(dst: dict, src: dict):
        nonlocal count
        for k, v in src.items():
            if isinstance(v, dict):
                overlay(dst[k], v)
            else:
                v = np.asarray(v)
                if dst[k].shape != v.shape:
                    if k == "kernel" and dst[k].shape[:2] == v.shape[:2] \
                            and dst[k].shape[3] == v.shape[3]:
                        v = adapt_input_channels(v, dst[k].shape[2])
                    else:
                        raise ValueError(
                            f"shape mismatch for {k}: ours {dst[k].shape} "
                            f"vs imported {v.shape}")
                dst[k] = v.astype(dst[k].dtype)
                count += 1

    overlay(scope, encoder_params)
    return params, count


def maybe_load_pretrained(params, encoder_name: str, search_dirs=None):
    """Graft local torch pretrained weights into ``params`` if available.
    Returns (params, n_arrays_grafted); (params, 0) when no checkpoint or no
    importer exists for this encoder."""
    if encoder_name not in _IMPORTERS:
        return params, 0
    ckpt = find_checkpoint(encoder_name, search_dirs)
    if ckpt is None:
        return params, 0
    encoder_params = _IMPORTERS[encoder_name](load_torch_state_dict(ckpt))
    return graft_encoder_params(params, encoder_params)
