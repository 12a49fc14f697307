"""Color codec round-trips (reference utils.py:304-380 semantics)."""

import numpy as np
import jax.numpy as jnp

from interactive_unet_tpu.ops import colors as C


def _random_colored_mask(rng, num_classes=3, size=16):
    ids = rng.integers(0, num_classes + 1, size=(size, size))
    return C.COLORS[ids], ids


def test_unique_colors_palette_order(rng):
    mask, ids = _random_colored_mask(rng, num_classes=3)
    uc = C.get_unique_colors(mask)
    present = sorted(np.unique(ids).tolist())
    np.testing.assert_array_equal(uc, C.COLORS[present])


def test_colored_categorical_roundtrip(rng):
    mask, ids = _random_colored_mask(rng, num_classes=3)
    onehot, weight = C.colored_to_categorical(mask)
    assert onehot.shape == (16, 16, 3)
    # weight: 255 where any class painted, 0 on background
    np.testing.assert_array_equal(weight > 0, ids > 0)
    back = C.categorical_to_colored(onehot)
    np.testing.assert_array_equal(back, np.where((ids > 0)[..., None], mask, 0))


def test_colored_to_class(rng):
    mask, ids = _random_colored_mask(rng, num_classes=3)
    cls = C.colored_to_class(mask)
    # reference semantics: class channel i of the categorical (bg dropped)
    expected = np.maximum(ids.astype(int) - 1, 0)
    np.testing.assert_array_equal(cls, expected)


def test_class_to_categorical_signature():
    ids = np.array([[0, 1], [2, 0]])
    cat = C.class_to_categorical(ids, 3)
    assert cat.shape == (2, 2, 3)
    assert cat[0, 1, 1] == 1 and cat[1, 0, 2] == 1
    w = np.array([[1, 0], [1, 1]])
    cat_w = C.class_to_categorical(ids, 3, w)
    assert cat_w[0, 1, 1] == 0  # masked out


def test_device_decode_matches_host(rng):
    mask, ids = _random_colored_mask(rng, num_classes=3)
    onehot_d, weight_d = C.colored_to_categorical_device(jnp.asarray(mask), 3)
    onehot_h, weight_h = C.colored_to_categorical(mask)
    np.testing.assert_array_equal(np.asarray(onehot_d), onehot_h.astype(np.float32))
    np.testing.assert_array_equal(np.asarray(weight_d), weight_h.astype(np.float32))


def test_class_to_colored_device():
    ids = jnp.asarray(np.array([[0, 1], [2, 0]]))
    rgb = np.asarray(C.class_to_colored_device(ids, 3))
    np.testing.assert_array_equal(rgb[0, 0], C.COLORS[1])
    np.testing.assert_array_equal(rgb[0, 1], C.COLORS[2])
    np.testing.assert_array_equal(rgb[1, 0], C.COLORS[3])
