"""Color codecs: RGB class-palette masks <-> categorical one-hot planes.

Replaces the reference's numba-JIT decode (reference utils.py:304-380,
``_colored_to_categorical_ultrafast``) with a vectorized numpy path for
host-side I/O decode and a jnp path that fuses into on-device pipelines.

Semantics preserved exactly:
- The palette ``COLORS`` is the reference's 11-color palette (utils.py:304).
- ``get_unique_colors(mask)`` returns the palette colors present in the mask,
  in palette order (utils.py:308-323).
- ``colored_to_categorical`` one-hot encodes only *present* colors (first
  match wins), drops channel 0 (background) and returns
  ``weight = 255 - onehot[..., 0]`` (utils.py:325-349).
- ``categorical_to_colored`` maps channel i -> COLORS[i+1] where the plane is
  255 (utils.py:351-357).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

COLORS = np.array(
    [
        [0, 0, 0],
        [230, 25, 75],
        [60, 180, 75],
        [255, 225, 25],
        [0, 130, 200],
        [245, 130, 48],
        [145, 30, 180],
        [70, 240, 240],
        [240, 50, 230],
        [210, 245, 60],
        [170, 255, 195],
    ],
    dtype=np.uint8,
)

_PALETTE_KEYS = (
    (COLORS[:, 0].astype(np.uint32) << 16)
    | (COLORS[:, 1].astype(np.uint32) << 8)
    | COLORS[:, 2].astype(np.uint32)
)


def _rgb_keys(colored_mask: np.ndarray) -> np.ndarray:
    flat = colored_mask.reshape(-1, 3)
    return (
        (flat[:, 0].astype(np.uint32) << 16)
        | (flat[:, 1].astype(np.uint32) << 8)
        | flat[:, 2].astype(np.uint32)
    )


def get_unique_colors(colored_mask: np.ndarray) -> np.ndarray:
    """Palette colors present in the mask, in palette order."""
    present = np.isin(_PALETTE_KEYS, np.unique(_rgb_keys(colored_mask)))
    return COLORS[present]


_NATIVE = None
try:
    from ..native import nativelib as _nl

    if _nl.available():
        _NATIVE = _nl
except Exception:  # pragma: no cover
    pass


def colored_to_categorical(colored_mask: np.ndarray):
    """RGB mask -> (one-hot[..., 1:], weight) in uint8 {0,255}.

    Equivalent of the reference numba kernel (utils.py:325-349): each pixel is
    matched against the colors *present* in this mask (first match wins);
    channel 0 (the first present palette color, normally black background)
    becomes the weight complement.  Uses the native C++ decoder when built,
    vectorized numpy otherwise.
    """
    h, w, _ = colored_mask.shape
    unique_colors = get_unique_colors(colored_mask)
    if _NATIVE is not None:
        onehot, weight = _NATIVE.colored_to_categorical(colored_mask,
                                                        unique_colors)
        return onehot[:, :, 1:], weight
    keys = _rgb_keys(colored_mask)  # (h*w,)
    color_keys = (
        (unique_colors[:, 0].astype(np.uint32) << 16)
        | (unique_colors[:, 1].astype(np.uint32) << 8)
        | unique_colors[:, 2].astype(np.uint32)
    )
    onehot = (keys[:, None] == color_keys[None, :]).astype(np.uint8) * 255
    onehot = onehot.reshape(h, w, len(unique_colors))
    weight = 255 - onehot[:, :, 0]
    return onehot[:, :, 1:], weight


def categorical_to_colored(mask: np.ndarray) -> np.ndarray:
    """One-hot (255-coded) planes -> RGB using palette colors 1..N."""
    h, w, c = mask.shape
    out = np.zeros((h, w, 3), dtype=np.uint8)
    for i in range(c):
        out[mask[:, :, i] == 255, :] = COLORS[i + 1]
    return out


def class_to_colored(class_ids: np.ndarray, num_classes: int) -> np.ndarray:
    """Integer class-id plane -> RGB uint8 using palette colors 1..N (host
    twin of ``class_to_colored_device``; same clip convention)."""
    pal = np.asarray(COLORS[1:num_classes + 1], dtype=np.uint8)
    return pal[np.clip(class_ids, 0, num_classes - 1)]


def colored_to_class(colored_mask: np.ndarray) -> np.ndarray:
    """RGB mask -> integer class-id plane (0 = background / first class off)."""
    categorical, _ = colored_to_categorical(colored_mask)
    out = np.zeros(categorical.shape[:2], dtype=np.uint8)
    for i in range(categorical.shape[-1]):
        out[categorical[..., i] > 0] = i
    return out


def class_to_categorical(
    class_mask: np.ndarray, num_classes: int, weight: np.ndarray | None = None
) -> np.ndarray:
    """Class-id plane -> one-hot planes, optionally weighted.

    Keeps the reference signature (utils.py:370) — the reference's reslice
    caller passes arguments swapped (loader.py:60); we do not replicate that
    defect (SURVEY §7 "known defects").
    """
    if weight is None:
        weight = np.ones(class_mask.shape)
    out = np.zeros((*class_mask.shape, num_classes), dtype=np.uint8)
    for i in range(num_classes):
        out[:, :, i] = (class_mask == i) * weight
    return out


# ---------------------------------------------------------------------------
# On-device (jnp) variants — full-palette, fixed shapes, fusable under jit.
# ---------------------------------------------------------------------------

_PALETTE_J = jnp.asarray(COLORS)


def colored_to_categorical_device(colored_mask, num_classes: int):
    """Device decode against the *full fixed palette* (channels 1..num_classes).

    Unlike the host variant this uses a static channel count so shapes stay
    fixed under jit.  Returns (onehot[..., :num_classes] for classes 1..N,
    weight) as float32 in [0, 255].
    """
    m = colored_mask.astype(jnp.int32)
    keys = (m[..., 0] << 16) | (m[..., 1] << 8) | m[..., 2]
    pal = _PALETTE_J.astype(jnp.int32)
    pal_keys = (pal[:, 0] << 16) | (pal[:, 1] << 8) | pal[:, 2]
    onehot = (keys[..., None] == pal_keys[None, None, : num_classes + 1]) * 255.0
    weight = 255.0 - onehot[..., 0]
    return onehot[..., 1:], weight


def class_to_colored_device(class_ids, num_classes: int):
    """Integer class-id plane -> RGB uint8 using palette colors 1..N (device)."""
    pal = _PALETTE_J[1 : num_classes + 1].astype(jnp.uint8)
    return pal[jnp.clip(class_ids, 0, num_classes - 1)]
