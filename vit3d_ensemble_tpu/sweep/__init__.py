"""The sweep engine: all 18 baseline configs x all folds as vmapped batches.

This is the framework's core TPU-native inversion (SURVEY.md §7): the
reference trains the (config x fold) grid as nested Python processes/loops
(18 configs x 5 folds = 90 separate torch runs); here the grid IS the batch.
Configs sharing (hidden_size, num_heads) differ only in depth and MLP width,
which the model expresses as runtime capacities — so the 18-config grid
compiles to 3 programs, each training `n_configs x n_folds` models
simultaneously under `jax.vmap`, with data/model axes shardable over a
`jax.sharding.Mesh` for multi-chip scaling.
"""

from vit3d_ensemble_tpu.sweep.stack import (  # noqa: F401
    ConfigGroup,
    group_configs,
    init_group_params,
    unpad_params,
)
