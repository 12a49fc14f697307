"""TPU compute ops: resampling, metrics, color codecs, augmentation, blending."""
