"""Fused on-device augmentation: joint geometry, label preservation, flip
exactness (reference loader.py:125-133 / suggestor.py:76-79 capabilities)."""

import jax
import jax.numpy as jnp
import numpy as np

from interactive_unet_tpu.ops import augment as aug


def _batch(rng, b=2, s=32, c=2):
    img = rng.random((b, s, s, 1)).astype(np.float32)
    mask = (rng.random((b, s, s, c)) > 0.5).astype(np.float32)
    wt = np.ones((b, s, s, c), np.float32)
    return jnp.asarray(img), jnp.asarray(mask), jnp.asarray(wt)


def test_joint_geometry(rng):
    """Image and mask must receive the identical transform."""
    img = rng.random((1, 32, 32, 1)).astype(np.float32)
    # mask channel 0 = copy of the image: must stay equal after aug
    mask = np.repeat(img, 2, axis=-1)
    wt = np.ones_like(mask)
    xi, xm, xw = aug.augment_batch(jax.random.key(3), jnp.asarray(img),
                                   jnp.asarray(mask), jnp.asarray(wt))
    np.testing.assert_allclose(np.asarray(xi)[..., 0], np.asarray(xm)[..., 0],
                               atol=1e-6)


def test_mask_values_preserved(rng):
    """NEAREST interp: augmented masks contain only original values {0,1}."""
    img, mask, wt = _batch(rng)
    _, xm, _ = aug.augment_batch(jax.random.key(0), img, mask, wt)
    vals = np.unique(np.asarray(xm))
    assert set(vals.tolist()) <= {0.0, 1.0}


def test_batch_members_get_different_transforms(rng):
    img = jnp.asarray(np.repeat(rng.random((1, 32, 32, 1)), 4, 0).astype(np.float32))
    mask = jnp.ones((4, 32, 32, 1), jnp.float32)
    wt = jnp.ones((4, 32, 32, 1), jnp.float32)
    xi, _, _ = aug.augment_batch(jax.random.key(1), img, mask, wt)
    xi = np.asarray(xi)
    assert not np.allclose(xi[0], xi[1])


def test_flip_rotate_preserves_center_mass(rng):
    """flips+rotation (no crop) keep total labeled mass roughly constant for
    a centered blob."""
    s = 64
    mask = np.zeros((1, s, s, 1), np.float32)
    mask[0, 24:40, 24:40, 0] = 1.0
    img = mask.copy()
    wt = np.ones_like(mask)
    for seed in range(5):
        _, xm, _ = aug.flip_rotate_batch(jax.random.key(seed),
                                         jnp.asarray(img), jnp.asarray(mask),
                                         jnp.asarray(wt))
        mass = float(np.asarray(xm).sum())
        assert abs(mass - 256) / 256 < 0.15  # nearest resample jitter only


def test_deterministic_given_key(rng):
    img, mask, wt = _batch(rng)
    a1 = aug.augment_batch(jax.random.key(7), img, mask, wt)
    a2 = aug.augment_batch(jax.random.key(7), img, mask, wt)
    for x, y in zip(a1, a2):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
