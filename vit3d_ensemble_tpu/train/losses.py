"""Losses matching the reference's training objectives.

* `bce_with_logits` — torch.nn.BCEWithLogitsLoss(pos_weight=w) semantics
  (`models/modeling.py:283-286`): numerically stable log-sigmoid form, the
  positive term scaled by pos_weight, mean reduction.
* `balanced_pos_weight` — per-batch sklearn 'balanced' class weight as used
  by the baseline trainers (`train_baseline_cv.py:168-169`): the reference
  computes sklearn class weights on host every step (a CPU sync per step!);
  here it is a closed-form jnp expression inside the jitted step:
  w_pos = B / (2 * n_pos) when both classes are present, else 1.0.
* `bce_on_probs` — torch.nn.BCELoss on sigmoid outputs, the ensemble
  objective (`train_ensemble_cv.py:63,152`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def balanced_pos_weight(labels: jax.Array) -> jax.Array:
    """sklearn compute_class_weight('balanced')[positive] for a binary batch.

    labels: (B,) float or int in {0, 1}.  Returns a scalar.
    """
    labels = labels.astype(jnp.float32)
    n = labels.shape[-1] if labels.ndim else labels.size
    n_pos = jnp.sum(labels, axis=-1)
    n_neg = n - n_pos
    both = (n_pos > 0) & (n_neg > 0)
    return jnp.where(both, n / (2.0 * jnp.maximum(n_pos, 1.0)), 1.0)


def bce_with_logits(
    logits: jax.Array,
    labels: jax.Array,
    pos_weight: Optional[jax.Array] = None,
) -> jax.Array:
    """Mean BCE-with-logits; pos_weight scales the positive-label term."""
    logits = logits.reshape(-1)
    labels = labels.reshape(-1).astype(logits.dtype)
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    w = 1.0 if pos_weight is None else pos_weight
    per_example = -(w * labels * log_p + (1.0 - labels) * log_not_p)
    return jnp.mean(per_example)


def bce_on_probs(probs: jax.Array, labels: jax.Array,
                 eps: float = 1e-12) -> jax.Array:
    """torch.nn.BCELoss semantics on probabilities in [0, 1]."""
    probs = probs.reshape(-1)
    labels = labels.reshape(-1).astype(probs.dtype)
    probs = jnp.clip(probs, eps, 1.0 - eps)
    per_example = -(labels * jnp.log(probs)
                    + (1.0 - labels) * jnp.log(1.0 - probs))
    return jnp.mean(per_example)
