"""Host storage: self-contained Zarr v3 store with sharding + multiscale pyramids."""

from .zarr3 import open_group, Array, Group, open  # noqa: F401
from .multiscale import (  # noqa: F401
    read_volume,
    resize_volume,
    add_multiscales,
    create_multiscale_zarr,
)
