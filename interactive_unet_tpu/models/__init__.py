"""Native JAX segmentation model zoo.

Covers the architecture capability surface of the reference model layer
(reference unet.py:10-69: 11 selectable smp architectures x selectable
encoders) with a from-scratch flax implementation designed for TPU:

- NHWC layout end-to-end (XLA's preferred conv layout on TPU)
- bfloat16 compute / float32 params (reference uses 16-mixed, trainer.py:59)
- GroupNorm instead of BatchNorm: batch-size-1 training is the common case
  in this tool (trainer default batch_size=1), where BatchNorm is degenerate;
  GroupNorm also keeps the train step a pure function (no mutable state)
- models output softmax *probabilities* (reference unet.py:65-69 — the loss
  suite consumes probabilities, not logits)

``build_model(architecture, encoder_name, num_channels, num_classes)`` is the
single entry point; see ARCHITECTURES/ENCODERS for the registry.
"""

from ..jaxsetup import enable_compile_cache as _ecc
_ecc()
del _ecc

from .registry import (ARCHITECTURES, ENCODERS, build_model,  # noqa: F401
                       restore_pretrained_flag)
