"""One-time torch -> JAX encoder weight import (SURVEY hard part #4).

ImageNet-pretrained encoders have no TPU-native source; when a user has a
torchvision MobileNetV2 checkpoint locally (e.g. exported from an existing
reference install), this converts its features into our
``MobileNetV2Encoder`` parameter pytree.

Layout conversion: torch conv weights are OIHW, flax wants HWIO; torch
BatchNorm (gamma, beta, mean, var) folds into our GroupNorm-free inference
path by *absorbing* BN into the preceding conv (w' = w * gamma/sqrt(var+eps),
b' = beta - mean * gamma/sqrt(var+eps)) — our blocks are Conv + GroupNorm,
so the BN statistics are folded into the conv and the GroupNorm scale/bias
start at identity.  This preserves the pretrained features' scale while
keeping our stateless normalization.
"""

from __future__ import annotations

import numpy as np


def _oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _fold_bn(conv_w, bn_gamma, bn_beta, bn_mean, bn_var, eps=1e-5):
    """Absorb BatchNorm into the conv; returns (w', b')."""
    scale = bn_gamma / np.sqrt(bn_var + eps)
    w = conv_w * scale[:, None, None, None]  # OIHW: scale output channels
    b = bn_beta - bn_mean * scale
    return w, b


def import_mobilenet_v2_features(state_dict: dict) -> dict:
    """torchvision mobilenet_v2().features state_dict -> flat layer list.

    Returns {idx: {"w": HWIO conv kernel with BN folded, "b": bias}} for each
    conv in traversal order — a neutral form callers can map onto
    models.encoders.MobileNetV2Encoder params (which share the block
    structure: expand 1x1 -> depthwise 3x3 -> project 1x1).
    """
    # torchvision layout: features.N... with Conv2d / BatchNorm2d pairs
    convs = {}
    for k, v in state_dict.items():
        v = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        convs[k] = v

    out = {}
    idx = 0
    # walk module names in order; a conv followed by a bn with matching prefix
    names = sorted({k.rsplit(".", 1)[0] for k in convs})

    def is_conv(name):
        return f"{name}.weight" in convs and convs[f"{name}.weight"].ndim == 4

    def bn_for(name):
        # the sibling module with running_mean present and nearest index
        prefix = name.rsplit(".", 1)[0]
        for cand in names:
            if cand.startswith(prefix) and f"{cand}.running_mean" in convs:
                return cand
        return None

    for name in names:
        if not is_conv(name):
            continue
        w = convs[f"{name}.weight"]
        bn = bn_for(name)
        if bn is not None:
            w, b = _fold_bn(w, convs[f"{bn}.weight"], convs[f"{bn}.bias"],
                            convs[f"{bn}.running_mean"],
                            convs[f"{bn}.running_var"])
        else:
            b = convs.get(f"{name}.bias", np.zeros(w.shape[0], w.dtype))
        out[idx] = {"name": name, "w": _oihw_to_hwio(w), "b": b}
        idx += 1
    return out


def graft_convs_into_params(params: dict, imported: dict) -> tuple[dict, int]:
    """Best-effort graft: walks the flax param pytree in definition order and
    copies every imported conv whose kernel shape matches.  Returns
    (new_params, num_grafted)."""
    import jax

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    imported_list = list(imported.values())
    used = [False] * len(imported_list)
    grafted = 0

    new_flat = []
    for path, leaf in flat:
        leaf_np = np.asarray(leaf)
        replaced = False
        if leaf_np.ndim == 4 and path[-1].key == "kernel":
            for i, item in enumerate(imported_list):
                if not used[i] and item["w"].shape == leaf_np.shape:
                    new_flat.append(type(leaf)(item["w"])
                                    if not hasattr(leaf, "dtype")
                                    else item["w"].astype(leaf_np.dtype))
                    used[i] = True
                    grafted += 1
                    replaced = True
                    break
        if not replaced:
            new_flat.append(leaf)
    leaves = [np.asarray(l) for l in new_flat]
    return jax.tree_util.tree_unflatten(treedef, leaves), grafted
