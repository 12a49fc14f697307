"""TPU compute ops: resampling, metrics, color codecs, augmentation, blending."""

from ..jaxsetup import enable_compile_cache as _ecc
_ecc()
del _ecc
