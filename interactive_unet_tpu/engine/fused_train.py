"""Whole-training-run-as-one-XLA-program (the <2 s retrain path).

The reference's retrain loop round-trips host<->device every step (Lightning
step loop, reference trainer.py:56-63).  On TPU — especially through a
remote-tunnel runtime where each dispatch costs ~100 ms RTT — that's fatal
for the "retrain in seconds" goal (SURVEY hard part #2).

Here the ENTIRE run is one jit-compiled program:

    scan over epochs:
        device-side shuffle (key-sort: real samples shuffled first, pads last)
        scan over train steps: fused augmentation -> bf16 forward ->
                               weighted loss -> AdamW update
        scan over val batches: loss + rounded Dice/IoU/MCC
        keep the best-val-loss params in carry (ModelCheckpoint semantics,
        reference trainer.py:46-49)

One dispatch, one device->host transfer (the per-epoch metric table +
final/best params).

Compile-stability: the program is shaped by a CAPACITY (dataset buffers
padded up to a bucket size), while the *actual* sample counts are traced
int32 scalars — so saving one more annotation does NOT recompile; only
crossing a power-of-two bucket does.  Batches are masked exactly:
  - padded slots inside a batch carry zero labels/weights, which is exact
    for the weighted loss/metric suite (the denominator is sum(weight));
  - all-pad batches skip the optimizer update entirely (no phantom AdamW
    weight-decay steps) and are excluded from the epoch means;
  - epoch means weight each batch by its real-sample count, matching
    Lightning's batch-size-weighted epoch aggregation (reference
    unet.py:75-86 logging semantics).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import optax

from ..ops import augment as aug
from ..ops import metrics as M

AXES = (0, 1, 2)


def _num_batches(n: int, batch: int) -> int:
    return max(1, math.ceil(n / batch))


def capacity_bucket(n: int, batch_size: int) -> int:
    """Smallest power-of-two multiple of batch_size holding n samples.
    Using bucketed capacities keeps the fused program's signature stable as
    the dataset grows sample-by-sample."""
    cap = max(batch_size, 1)
    while cap < n:
        cap *= 2
    return cap


def pad_to_capacity(arrs, capacity: int):
    """Zero-pad each (N, ...) array up to capacity rows."""
    import numpy as np

    out = []
    for a in arrs:
        n = a.shape[0]
        if n < capacity:
            pad = np.zeros((capacity - n, *a.shape[1:]), a.dtype)
            a = np.concatenate([np.asarray(a), pad], axis=0)
        out.append(a)
    return out


def _metrics(pred, y, w):
    yr, pr = jnp.round(y), jnp.round(pred)
    return jnp.stack([
        M.dice(pr, yr, w, AXES),
        M.iou(pr, yr, w, AXES),
        M.mcc(pr, yr, w, AXES),
    ])


def make_fused_train_fn(model, loss_fn, optimizer, n_train: int, n_val: int,
                        batch_size: int, epochs: int, batch_sharding=None,
                        remat: bool = False):
    """Returns jit fn(params, opt_state, best_params, best_val, key,
    x_tr, y_tr, w_tr, x_va, y_va, w_va[, n_tr, n_va])
    -> (final_params, opt_state, best_params, best_val, logs); logs has shape
    (epochs, 8): [train Loss/Dice/IoU/MCC, val Loss/Dice/IoU/MCC].

    ``n_train``/``n_val`` are the buffer CAPACITIES (the static shapes of the
    data arrays); the optional trailing ``n_tr``/``n_va`` arguments are the
    actual live sample counts (default: the full capacity) and may be traced
    scalars — growing the dataset within a capacity bucket reuses the
    compiled program.

    The (params, opt_state, best_params, best_val) carry is an explicit
    input/output so callers can run one fused dispatch per epoch (keeping the
    live metrics.csv plot) or one for the whole run — the buffers are donated
    either way.  NOTE: params and best_params are both donated, so the caller
    must pass distinct buffers (copy params for the initial best_params)."""
    steps = _num_batches(n_train, batch_size)
    val_steps = _num_batches(n_val, batch_size)
    pad_train = steps * batch_size
    pad_val = val_steps * batch_size

    def gather(x, y, w, idx, n_real):
        """Fixed-size batch; padded slots get zeroed labels/weights.  With a
        mesh, the gathered batch is sharding-constrained so the step runs
        data-parallel (GSPMD inserts the gradient all-reduce over ICI)."""
        safe = jnp.minimum(idx, n_real - 1)
        mask = (idx < n_real).astype(w.dtype)[:, None, None, None]
        out = (jnp.take(x, safe, axis=0),
               jnp.take(y, safe, axis=0) * mask,
               jnp.take(w, safe, axis=0) * mask)
        if batch_sharding is not None:
            out = tuple(jax.lax.with_sharding_constraint(t, batch_sharding)
                        for t in out)
        return out

    def where_tree(pred, a, b):
        return jax.tree_util.tree_map(
            lambda x, y: jnp.where(pred, x, y), a, b)

    # rematerialization trades FLOPs for activation memory: lets large
    # batches / large inputs fit HBM at ~1.3x step cost
    apply_fn = (jax.checkpoint(model.apply) if remat else model.apply)

    def fused(params, opt_state, best_params, best_val, key,
              x_tr, y_tr, w_tr, x_va, y_va, w_va,
              n_tr=n_train, n_va=n_val):

        def epoch_body(carry, key):
            params, opt_state, best_params, best_val = carry
            k_perm, k_aug = jax.random.split(key)

            # Device-side shuffle with the real samples first: sort indices
            # by (is_pad, random).  The leading ceil(n/batch) batches then
            # reproduce exactly the reference's "shuffle n, batch, pad the
            # last partial batch"; trailing all-pad batches are masked out.
            r = jax.random.uniform(k_perm, (pad_train,))
            sort_key = jnp.where(jnp.arange(pad_train) < n_tr, r, 2.0 + r)
            perm = jnp.argsort(sort_key)
            batches = perm.reshape(steps, batch_size)

            def train_step(carry, inp):
                params, opt_state = carry
                idx, k = inp
                cnt = jnp.sum(idx < n_tr)
                xb, yb, wb = gather(x_tr, y_tr, w_tr, idx, n_tr)
                xa, ya, wa = aug.augment_batch(k, xb, yb, wb)

                def lfn(p):
                    pred = apply_fn(p, xa)
                    return loss_fn(pred, ya, wa, AXES), pred

                (loss, pred), grads = jax.value_and_grad(
                    lfn, has_aux=True)(params)
                updates, new_opt = optimizer.update(grads, opt_state, params)
                new_params = optax.apply_updates(params, updates)
                # an all-pad batch must be a true no-op (no AdamW decay step)
                live = cnt > 0
                params = where_tree(live, new_params, params)
                opt_state = where_tree(live, new_opt, opt_state)
                stats = jnp.concatenate([loss[None], _metrics(pred, ya, wa)])
                return (params, opt_state), (stats, cnt)

            keys = jax.random.split(k_aug, steps)
            (params, opt_state), (tr_stats, tr_cnt) = jax.lax.scan(
                train_step, (params, opt_state), (batches, keys))
            tr_w = tr_cnt.astype(jnp.float32)
            tr_mean = (jnp.sum(tr_stats * tr_w[:, None], axis=0)
                       / jnp.maximum(jnp.sum(tr_w), 1.0))

            def val_step(_, idx):
                cnt = jnp.sum(idx < n_va)
                xb, yb, wb = gather(x_va, y_va, w_va, idx, n_va)
                pred = model.apply(params, xb)
                loss = loss_fn(pred, yb, wb, AXES)
                return None, (jnp.concatenate([loss[None],
                                               _metrics(pred, yb, wb)]), cnt)

            val_idx = jnp.arange(pad_val).reshape(val_steps, batch_size)
            _, (va_stats, va_cnt) = jax.lax.scan(val_step, None, val_idx)
            va_w = va_cnt.astype(jnp.float32)
            va_mean = (jnp.sum(va_stats * va_w[:, None], axis=0)
                       / jnp.maximum(jnp.sum(va_w), 1.0))

            better = va_mean[0] < best_val
            best_params = where_tree(better, params, best_params)
            best_val = jnp.where(better, va_mean[0], best_val)

            return ((params, opt_state, best_params, best_val),
                    jnp.concatenate([tr_mean, va_mean]))

        keys = jax.random.split(key, epochs)
        carry = (params, opt_state, best_params, best_val)
        (params, opt_state, best_params, best_val), logs = jax.lax.scan(
            epoch_body, carry, keys)
        return params, opt_state, best_params, best_val, logs

    return jax.jit(fused, donate_argnums=(0, 1, 2, 3))
