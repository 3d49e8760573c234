"""Jitted train/eval steps for baseline ViTs and end-to-end ensembles.

The reference's per-step host work (sklearn class weights, `.item()` syncs —
`train_baseline_cv.py:163-187`) is folded entirely into the compiled step:
pos_weight is a closed-form jnp expression, padded rows are masked, and the
whole validation split is evaluated in ONE forward (the reference loops
batch-size-1, `train_baseline_cv.py:74-90`, and runs each forward TWICE for
logits and features, `:79-80` — here a single forward returns both).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax.training import train_state



class TrainState(train_state.TrainState):
    pass


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


def make_baseline_train_step(model, balanced_weights: bool = True) -> Callable:
    """Returns jitted (state, vols, labels, mask, rng) -> (state, loss).

    Loss = BCEWithLogits(pos_weight=balanced) over valid rows, matching
    `models/modeling.py:283-286` + `train_baseline_cv.py:168-171`.
    `balanced_weights=False` reproduces the whole-dataset driver's
    unweighted loss (`train_baseline_whole_dataset.py:186`).
    """

    @jax.jit
    def step(state: TrainState, vols, labels, mask, rng):
        def loss_fn(params):
            out = model.apply({"params": params}, vols,
                              deterministic=False, rngs={"dropout": rng})
            pw = (masked_balanced_pos_weight(labels, mask)
                  if balanced_weights else jnp.float32(1.0))
            return masked_bce_with_logits(out.logits, labels, mask, pw)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    return step


def make_baseline_eval_step(model) -> Callable:
    """Returns jitted (params, vols) -> (probs, cls_features).

    One forward for the whole validation split; probs = sigmoid(logits)
    (`tools.py:50`), features = CLS token of the encoded sequence
    (`train_baseline_cv.py:80`).
    """

    @jax.jit
    def step(params, vols):
        out = model.apply({"params": params}, vols, deterministic=True)
        return jax.nn.sigmoid(out.logits.reshape(-1)), out.tokens[:, 0]

    return step


def make_ensemble_train_step(model) -> Callable:
    """End-to-end ensemble step: BCELoss on sigmoid outputs, Adam over ALL
    parameters (backbones included — the reference does not freeze them,
    `train_ensemble_cv.py:82-83`)."""

    @jax.jit
    def step(state: TrainState, vols, labels, mask, rng):
        def loss_fn(params):
            probs = model.apply({"params": params}, vols,
                                deterministic=False,
                                rngs={"dropout": rng}).reshape(-1)
            labels_f = labels.reshape(-1).astype(probs.dtype)
            p = jnp.clip(probs, 1e-12, 1.0 - 1e-12)
            per = -(labels_f * jnp.log(p) + (1 - labels_f) * jnp.log(1 - p))
            return jnp.sum(per * mask) / jnp.maximum(jnp.sum(mask), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    return step


def make_ensemble_eval_step(model) -> Callable:
    @jax.jit
    def step(params, vols):
        return model.apply({"params": params}, vols,
                           deterministic=True).reshape(-1)

    return step
