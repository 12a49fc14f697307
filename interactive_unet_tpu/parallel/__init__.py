"""Device-mesh parallelism (SURVEY §2.2/§2.3 TPU plan).

The reference is single-device (trainer.py:61-62) with a dead multi-GPU
inference sketch (predict.py:137-147).  Here scale-out is first-class:
training batch-shards over a ``data`` mesh axis (XLA inserts the gradient
all-reduce over ICI), optionally spatially shards H over a ``space`` axis
(GSPMD handles conv halo exchange), and full-volume inference block-shards
across devices.
"""

from ..jaxsetup import enable_compile_cache as _ecc
_ecc()
del _ecc

from .mesh import (make_mesh, batch_sharding, parse_mesh_spec,  # noqa: F401
                   replicated)
from .train import make_sharded_train_step  # noqa: F401
from .infer import make_sharded_block_predictor  # noqa: F401
