"""LR schedules matching `utils/scheduler.py:8-63` exactly.

The reference implements torch LambdaLR multipliers; these are the same
curves as optax schedule functions (multiplier x base_lr).  Step indexing
matches torch: the g-th optimizer update (g = 0, 1, ...) uses factor(g), so
factor(0) = 0 for warmup schedules — the reference's first update is a
zero-LR step.

`shift=1` reproduces reference defect D15 (`train_baseline_whole_dataset.py:
198-199`, bootstrap same): those drivers call scheduler.step() BEFORE
optimizer.step(), off-by-one'ing the curve.  The CV driver has the correct
order (`train_baseline_cv.py:180-181`), which is the default here.
"""

from __future__ import annotations

import jax.numpy as jnp


def constant_schedule(learning_rate: float):
    def schedule(count):
        return jnp.asarray(learning_rate, jnp.float32)

    return schedule


def warmup_constant_schedule(learning_rate: float, warmup_steps: int,
                             shift: int = 0):
    def schedule(count):
        step = count + shift
        warm = step / jnp.maximum(1.0, warmup_steps)
        return learning_rate * jnp.where(step < warmup_steps, warm, 1.0)

    return schedule


def warmup_linear_schedule(learning_rate: float, warmup_steps: int,
                           t_total: int, shift: int = 0):
    def schedule(count):
        step = count + shift
        warm = step / jnp.maximum(1.0, warmup_steps)
        decay = jnp.maximum(
            0.0, (t_total - step) / jnp.maximum(1.0, t_total - warmup_steps))
        return learning_rate * jnp.where(step < warmup_steps, warm, decay)

    return schedule


def warmup_cosine_schedule(learning_rate: float, warmup_steps: int,
                           t_total: int, cycles: float = 0.5,
                           shift: int = 0):
    """Reference default (decay_type='cosine', `train_baseline_cv.py:116-117`).

    NOTE: with the reference's default flags warmup_steps=1000 > t_total=100
    (defect D17), training never leaves the warmup ramp; the formula below
    reproduces that faithfully.
    """

    def schedule(count):
        step = (count + shift).astype(jnp.float32) if hasattr(count, "astype") \
            else jnp.asarray(count + shift, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        progress = (step - warmup_steps) / jnp.maximum(1.0,
                                                       t_total - warmup_steps)
        decay = jnp.maximum(
            0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * cycles * 2.0 * progress)))
        return learning_rate * jnp.where(step < warmup_steps, warm, decay)

    return schedule


def make_schedule(decay_type: str, learning_rate: float, warmup_steps: int,
                  t_total: int, shift: int = 0):
    """Driver-facing factory mirroring the reference's --decay_type flag."""
    if decay_type == "cosine":
        return warmup_cosine_schedule(learning_rate, warmup_steps, t_total,
                                      shift=shift)
    if decay_type == "linear":
        return warmup_linear_schedule(learning_rate, warmup_steps, t_total,
                                      shift=shift)
    if decay_type == "warmup_constant":
        return warmup_constant_schedule(learning_rate, warmup_steps,
                                        shift=shift)
    if decay_type == "constant":
        return constant_schedule(learning_rate)
    raise ValueError(f"unknown decay_type: {decay_type!r}")
