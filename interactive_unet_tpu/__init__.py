"""interactive_unet_tpu — a TPU-native interactive 3D segmentation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
laprade117/interactive-unet (reference layout: /root/reference/interactive_unet):
paint annotations on arbitrarily-oriented 2D slices of large 3D volumes
(multiscale Zarr v3 stores), train a 2D encoder-decoder segmentation network on
the accumulated slices, get live few-shot suggestions after every stroke, and
run full-volume sliding-window inference with Gaussian overlap blending.

Layering (mirrors reference SURVEY §1, re-designed TPU-first):
  L1 storage   : interactive_unet_tpu.storage (self-contained Zarr v3 + sharding)
  L2 geometry  : interactive_unet_tpu.ops.slicer / ops.resample (device resample)
  L3 model     : interactive_unet_tpu.models + ops.metrics + engine.loader
  L4 drivers   : interactive_unet_tpu.engine.trainer / engine.predict
  L5 session   : interactive_unet_tpu.session (annotator, suggestor, volumedata)
  L6 UI        : interactive_unet_tpu.session.app (web UI)
Parallel scale-out lives in interactive_unet_tpu.parallel (jax.sharding mesh).
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (avoids importing jax for `import interactive_unet_tpu`)."""
    if name == "train_model":
        from .engine.trainer import train_model
        return train_model
    if name == "predict_volumes":
        from .engine.predict import predict_volumes
        return predict_volumes
    if name == "predict_slice":
        from .engine.predict import predict_slice
        return predict_slice
    if name == "Suggestor":
        from .engine.suggestor import Suggestor
        return Suggestor
    if name == "build_model":
        from .models import build_model
        return build_model
    if name == "Slicer":
        from .ops.slicer import Slicer
        return Slicer
    if name == "PackedVolume":
        from .ops.fastslice import PackedVolume
        return PackedVolume
    if name == "VolumeData":
        from .session.volumedata import VolumeData
        return VolumeData
    raise AttributeError(name)
