"""Live few-shot suggestor (reference suggestor.py:14-116, re-designed).

After every completed stroke the reference trains a fresh/cached
MobileNetV2-U-Net for 30 AdamW steps on the single annotated slice (flip/rot
augmentation, MCC+CE loss on stroke-covered pixels), keeps the best-loss
weights, reinitializes on NaN, then predicts the full slice.

TPU-first re-design: the ENTIRE fit-and-predict — 30 x (augment -> forward ->
loss -> backward -> AdamW) + best-params tracking + NaN-reinit + final
inference — is one jit-compiled ``lax.scan`` program.  It compiles once per
(input size, num_classes) and afterwards every stroke costs a single device
dispatch, which is what makes the <2 s round-trip target reachable
(SURVEY §7 step 6: "compile once, reuse").
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models import build_model
from ..ops import augment as aug
from ..ops import colors as C
from ..ops import metrics as M


class Suggestor:
    """Caches compiled programs and warm-started params across strokes."""

    def __init__(self, num_channels: int = 1, num_classes: int = 2,
                 steps: int = 30, lr: float = 1e-4, seed: int = 0,
                 encoder_name: str = "cnn_s"):
        # cnn_s (dense convs -> MXU) is ~1.6x faster per stroke on TPU than
        # the reference's MobileNetV2 (suggestor.py:22-26), whose depthwise
        # convolutions are VPU-bound; mobilenet_v2 remains selectable.
        self.num_channels = num_channels
        self.num_classes = num_classes
        self.steps = steps
        self.lr = lr
        self.seed = seed
        self.model = build_model(architecture="U-Net",
                                 encoder_name=encoder_name,
                                 num_channels=num_channels,
                                 num_classes=num_classes,
                                 dtype=jnp.bfloat16)
        self.params = None
        self._fit_fn = None
        self._key = jax.random.key(seed)

    # -- compiled program ---------------------------------------------------

    def _build_fit_fn(self):
        import optax

        model = self.model
        optimizer = optax.adamw(self.lr)
        steps = self.steps

        def fit_and_predict(params, init_params, key, x, y, w):
            """x (1,H,W,C) image; y (1,H,W,K) one-hot; w same-shaped weight."""
            opt_state = optimizer.init(params)

            def body(carry, k):
                params, opt_state, best_params, best_loss = carry
                xa, ya, wa = aug.flip_rotate_batch(k, x, y, w)

                def lfn(p):
                    pred = model.apply(p, xa)
                    return M.mcc_ce_loss(pred, ya, wa, axes=(1, 2))

                loss, grads = jax.value_and_grad(lfn)(params)

                # NaN watchdog: restart from the pristine init (reference
                # suggestor.py:92-95)
                bad = jnp.isnan(loss)
                params = jax.tree_util.tree_map(
                    lambda p0, p: jnp.where(bad, p0, p), init_params, params)
                opt_state_reset = optimizer.init(init_params)
                opt_state = jax.tree_util.tree_map(
                    lambda o0, o: jnp.where(bad, o0, o), opt_state_reset,
                    opt_state)
                best_loss = jnp.where(bad, jnp.inf, best_loss)

                # keep the best-loss params (reference suggestor.py:97-100)
                better = loss < best_loss
                best_params = jax.tree_util.tree_map(
                    lambda b, p: jnp.where(better & ~bad, p, b),
                    best_params, params)
                best_loss = jnp.where(better & ~bad, loss, best_loss)

                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state, best_params, best_loss), loss

            keys = jax.random.split(key, steps)
            (params, _, best_params, best_loss), losses = jax.lax.scan(
                body, (params, opt_state, params, jnp.inf), keys)

            pred = model.apply(best_params, x)
            class_ids = jnp.argmax(pred[0], axis=-1)
            return best_params, class_ids, best_loss, losses

        return jax.jit(fit_and_predict)

    # -- public API ---------------------------------------------------------

    def make_suggestions(self, image_features, mask):
        """image_features: (1,1,H,W)/(H,W)/(1,H,W,C) float image in [0,1];
        mask: (H,W,3) RGB stroke mask.  Returns (suggestion RGB, self)."""
        mask = np.asarray(mask)
        image_size = mask.shape[0]
        unique_colors = C.get_unique_colors(mask)[1:]
        num_classes = len(unique_colors)

        if num_classes <= 1:
            if num_classes == 0:
                return None, self
            suggestion = np.ones((image_size, image_size, 3), dtype=np.uint8) \
                * unique_colors[0][None, None, :]
            return suggestion.astype("uint8"), self

        x = np.asarray(image_features, dtype=np.float32)
        if x.ndim == 2:
            x = x[None, :, :, None]
        elif x.ndim == 4 and x.shape[1] <= 4 and x.shape[-1] > 4:
            x = np.moveaxis(x, 1, -1)  # NCHW -> NHWC

        onehot, _ = C.colored_to_categorical(mask)
        y = (onehot > 127).astype(np.float32)[None]  # (1,H,W,K)
        covered = (y.sum(-1, keepdims=True) > 0).astype(np.float32)
        w = np.repeat(covered, num_classes, axis=-1)

        if num_classes != self.num_classes or self.num_channels != x.shape[-1]:
            self.__init__(num_channels=x.shape[-1], num_classes=num_classes,
                          steps=self.steps, lr=self.lr, seed=self.seed)

        if self._fit_fn is None:
            self._fit_fn = self._build_fit_fn()

        self._key, k_init, k_fit = jax.random.split(self._key, 3)
        init_params = self.model.init(k_init, jnp.asarray(x))
        params = self.params if self.params is not None else init_params

        best_params, class_ids, best_loss, _ = self._fit_fn(
            params, init_params, k_fit, jnp.asarray(x), jnp.asarray(y),
            jnp.asarray(w))
        self.params = best_params

        ids = np.asarray(class_ids)
        suggestion = np.zeros((image_size, image_size, 3), dtype=np.uint8)
        for i in range(num_classes):
            suggestion[ids == i, :] = unique_colors[i]
        return suggestion, self


def make_suggestions(image_features, mask, lr=1e-4, steps=30, model=None):
    """Functional entry point mirroring reference suggestor.make_suggestions."""
    sug = model if isinstance(model, Suggestor) else Suggestor(lr=lr, steps=steps)
    return sug.make_suggestions(image_features, mask)
