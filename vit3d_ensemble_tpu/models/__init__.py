"""Flax model families: 3D VisionTransformer baselines + stacking ensemble."""

from vit3d_ensemble_tpu.models.vit3d import (  # noqa: F401
    VisionTransformer3D,
    ViTOutput,
)
from vit3d_ensemble_tpu.models.ensemble import TransformerEnsemble  # noqa: F401
