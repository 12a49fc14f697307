"""Workload drivers: training, inference, suggestor, checkpointing, history."""

from ..jaxsetup import enable_compile_cache as _ecc
_ecc()
del _ecc
