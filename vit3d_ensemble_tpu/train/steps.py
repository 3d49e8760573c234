"""Jitted step primitives shared by the trainers.

The training loops themselves live as lax.scan programs inside
`train/trainer.py`, `train/ensemble_trainer.py`, and `sweep/engine.py`
(every hot loop is one compiled program — host-dispatched steps pay
multiple remote-link round trips each).  This module holds the pieces they
share plus the standalone eval steps used by the test/statistics drivers.

The reference's per-step host work (sklearn class weights, `.item()` syncs
— `train_baseline_cv.py:163-187`) is folded into these: pos_weight is a
closed-form jnp expression and padded rows are masked.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def masked_balanced_pos_weight(labels: jax.Array,
                               mask: jax.Array) -> jax.Array:
    """Per-batch sklearn 'balanced' positive-class weight over valid rows
    (`train_baseline_cv.py:168-169`)."""
    y = labels.astype(jnp.float32) * mask
    n = jnp.sum(mask)
    n_pos = jnp.sum(y)
    n_neg = n - n_pos
    both = (n_pos > 0) & (n_neg > 0)
    return jnp.where(both, n / (2.0 * jnp.maximum(n_pos, 1.0)), 1.0)


def masked_bce_with_logits(logits: jax.Array, labels: jax.Array,
                           mask: jax.Array,
                           pos_weight: jax.Array) -> jax.Array:
    logits = logits.reshape(-1)
    labels = labels.reshape(-1).astype(logits.dtype)
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    per_example = -(pos_weight * labels * log_p + (1.0 - labels) * log_not_p)
    return jnp.sum(per_example * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def make_baseline_eval_step(model) -> Callable:
    """Returns jitted (params, vols) -> (probs, cls_features).

    One forward for the whole validation split; probs = sigmoid(logits)
    (`tools.py:50`), features = CLS token of the encoded sequence
    (`train_baseline_cv.py:80` — the reference runs each eval forward TWICE
    for logits and features; one forward returns both here).
    """

    @jax.jit
    def step(params, vols):
        out = model.apply({"params": params}, vols, deterministic=True)
        return jax.nn.sigmoid(out.logits.reshape(-1)), out.tokens[:, 0]

    return step


def make_ensemble_eval_step(model) -> Callable:
    @jax.jit
    def step(params, vols):
        return model.apply({"params": params}, vols,
                           deterministic=True).reshape(-1)

    return step
