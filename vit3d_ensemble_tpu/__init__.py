"""vit3d_ensemble_tpu — a TPU-native 3D-ViT stacking-ensemble framework.

A from-scratch JAX/Flax/pjit/Pallas re-design of the capabilities of
evapachetti/3d_vit_ensemble (3D-Vision-Transformer stacking ensembles for
prostate-cancer aggressiveness, MDPI Bioengineering 10(9):1015, 2023).

Design stance (TPU-first):
  * The unit of parallelism is the (config x fold x batch) grid, not the layer.
    All 18 baseline ViT configurations train simultaneously as one vmapped,
    jit-compiled multi-model batch (see `sweep/`).
  * Data is preloaded once into device-resident arrays; augmentation is an
    on-device vmapped transform (reference precomputes augmented PNGs on disk).
  * Attention for the tiny-head regime (65 tokens, head_dim 4..16) ships as a
    fused Pallas kernel (`ops/`) with a plain-XLA fallback.
  * Multi-chip scaling is expressed with jax.sharding.Mesh + NamedSharding
    ('model' axis for the config grid, 'data' axis for volumes); collectives
    are inserted by the compiler, never hand-written.

Reference parity: every module docstring cites the reference file:line it is
capability-equivalent to.  Behavioral contract: SURVEY.md Appendix B.
"""

__version__ = "0.1.0"

from vit3d_ensemble_tpu.configs import (  # noqa: F401
    ViTConfig,
    parameters_config,
    get_config,
)
