"""Multi-chip scaling: mesh construction + sharding rules.

The reference has no functional distribution layer (only dead
torch.distributed remnants, SURVEY.md §2 row 25).  This framework's
parallel design (SURVEY.md §2 'Parallelism strategies'):

  * the real parallel axes at this model scale are the MODEL-BATCH axis
    (the 18-config grid / ensemble members — the EP analogue) and the DATA
    axis (volumes / folds / bootstrap replicates);
  * both are leading vmap axes of the sweep engine, so multi-chip scaling
    is pure sharding: annotate those axes over a Mesh('model', 'data') and
    XLA partitions the program, inserting collectives only where needed
    (the sweep is embarrassingly parallel; single-model data-parallel
    training all-reduces gradients over 'data');
  * TP/PP/SP are deliberately absent: the largest model is 1.2M params
    with 65 tokens — sharding weights or sequence would spend ICI
    bandwidth to fragment MXU tiles that are already below 128x128.
"""

from vit3d_ensemble_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    sweep_shardings,
    make_dp_train_step,
)
