"""Mesh + NamedSharding constructors for the sweep engine and DP training.

Replaces (net-new; nothing functional to mirror) the reference's vestigial
torch.distributed hooks (`utils/data_utils.py:19-53`, never initialized)
with the JAX single-controller model: one program, sharded arrays, compiler-
inserted collectives over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_model: int, n_data: int,
              devices: Optional[Sequence] = None) -> Mesh:
    """A ('model', 'data') mesh.

    'model' shards the config/ensemble-member axis; 'data' shards folds /
    replicates / batch.  On a v4-8 the natural shape is (2, 4) or (1, 8).
    """
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) < n_model * n_data:
        raise ValueError(
            f"need {n_model * n_data} devices, have {len(devices)}")
    grid = np.asarray(devices[:n_model * n_data]).reshape(n_model, n_data)
    return Mesh(grid, ("model", "data"))


def mesh_from_spec(spec: Optional[str]) -> Optional[Mesh]:
    """Parse the CLI --mesh flag into a Mesh (or None for single-chip).

    'MxN' -> Mesh((M, N), ('model', 'data')); 'auto' -> use every visible
    device (model axis 2 when the count is even, else 1); None/'none'/'1x1'
    -> single-device behavior, unchanged.
    """
    if spec is None or str(spec).lower() in ("", "none", "1x1", "1"):
        return None
    if str(spec).lower() == "auto":
        n = len(jax.devices())
        if n <= 1:
            return None
        n_model = 2 if n % 2 == 0 else 1
        return make_mesh(n_model, n // n_model)
    try:
        m, d = (int(tok) for tok in str(spec).lower().split("x"))
    except ValueError:
        raise ValueError(f"--mesh expects 'MxN' or 'auto', got {spec!r}")
    if m <= 0 or d <= 0:
        # a typo like '0x8' must not silently degrade to single-chip
        raise ValueError(f"--mesh axes must be positive, got {spec!r}")
    if m * d == 1:
        return None
    return make_mesh(m, d)


def sweep_shardings(mesh: Mesh):
    """Shardings for `sweep.engine.run_group` arrays.

    Returns (param_sharding, fold_sharding, replicated): stacked params
    (G, F, ...) shard over ('model', 'data'); per-fold arrays (F, ...) over
    ('data',); the volume pool replicates (every chip reads all volumes —
    at 99 patients the pool is ~45 MB, far cheaper to replicate than to
    gather rows over ICI every step).
    """
    return (
        NamedSharding(mesh, P("model", "data")),
        NamedSharding(mesh, P("data")),
        NamedSharding(mesh, P()),
    )


def shard_group_inputs(mesh: Mesh, params, keys, data_arrays):
    """Place sweep-engine inputs according to `sweep_shardings`.

    data_arrays: dict with pool under 'pool' and per-fold arrays otherwise.
    """
    p_sh, f_sh, rep = sweep_shardings(mesh)
    params = jax.device_put(params, p_sh)
    keys = jax.device_put(keys, p_sh)
    out = {}
    for name, arr in data_arrays.items():
        out[name] = jax.device_put(
            jnp.asarray(arr), rep if name == "pool" else f_sh)
    return params, keys, out


def make_dp_train_step(model, tx, mesh: Mesh, balanced_weights: bool = True):
    """Single-model data-parallel train step over the WHOLE mesh.

    Batch shards over every device ('model' and 'data' axes both act as
    data axes here); parameters replicate; XLA inserts the gradient
    all-reduce.  This is the multi-chip path for training ONE config fast
    (as opposed to the sweep, which shards whole models).
    """
    from vit3d_ensemble_tpu.train.steps import (
        masked_balanced_pos_weight,
        masked_bce_with_logits,
    )

    import optax

    batch_sharding = NamedSharding(mesh, P(("model", "data")))
    replicated = NamedSharding(mesh, P())

    def step(params, opt_state, vols, labels, mask, rng):
        def loss_fn(p):
            out = model.apply({"params": p}, vols, deterministic=False,
                              rngs={"dropout": rng})
            pw = (masked_balanced_pos_weight(labels, mask)
                  if balanced_weights else jnp.float32(1.0))
            return masked_bce_with_logits(out.logits, labels, mask, pw)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return jax.jit(
        step,
        in_shardings=(replicated, replicated, batch_sharding,
                      batch_sharding, batch_sharding, replicated),
        out_shardings=(replicated, replicated, replicated),
    ), batch_sharding
