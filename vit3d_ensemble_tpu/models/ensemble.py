"""Stacking ensemble: N ViT backbones + Linear meta-classifier.

Capability-equivalent to the reference's `TransformerEnsemble`
(`models/modeling.py:347-356`): per-backbone CLS logits are concatenated and
fed to a Linear(N, 1) + sigmoid meta-classifier.

NOTE on reference defect D6 (SURVEY.md): the reference's default
`in_features=3` builds Linear(9, 1) which crashes on the (B, 3) concat; the
working/intended head is Linear(N * num_classes, 1), which is what this
module builds.

Two execution modes (the reference only has the first):
  * end-to-end — backbones are live submodules and receive gradients, like
    the reference's non-frozen `Adam(ensemble.parameters())`
    (`train_ensemble_cv.py:82-83`).
  * frozen-logit — the sweep engine precomputes all 18 baselines' logits for
    the whole dataset in one batched forward, then trains only the meta
    head over all C(18,3)=816 combinations as a single vmapped program
    (`sweep/ensemble_sweep.py`).  This module's `MetaHead` is that head.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vit3d_ensemble_tpu.configs import ViTConfig
from vit3d_ensemble_tpu.models.vit3d import (
    VisionTransformer3D,
    torch_linear_bias_init,
    torch_linear_kernel_init,
)


class MetaHead(nn.Module):
    """Linear(N, 1) + sigmoid meta-classifier (`modeling.py:351,356`)."""

    n_members: int = 3
    n_classes: int = 1

    @nn.compact
    def __call__(self, member_logits: jax.Array) -> jax.Array:
        # member_logits: (B, N * num_classes)
        fan_in = member_logits.shape[-1]
        out = nn.Dense(
            self.n_classes,
            kernel_init=torch_linear_kernel_init,
            bias_init=torch_linear_bias_init(fan_in),
            name="classifier",
        )(member_logits)
        return jax.nn.sigmoid(out)


class TransformerEnsemble(nn.Module):
    """End-to-end stacking ensemble over heterogeneous ViT configs.

    `member_masks` (optional, one (num_layers_active, mlp_active) pair per
    member) enables PADDED members: every config of a (hidden, heads) shape
    class can run as the class-wide template with runtime depth/width masks
    (exactness proven in test_sweep), so all C(18,3) combinations of a
    class-multiset share ONE compiled program instead of one per
    combination — the difference between ~10 compiles and 816 for the
    reference-faithful end-to-end sweep.
    """

    configs: Tuple[ViTConfig, ...]
    zero_head: bool = True
    remat: bool = False          # see vit3d.Encoder.remat

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True,
                 member_masks=None) -> jax.Array:
        member_logits = []
        for i, cfg in enumerate(self.configs):
            la, ml = (member_masks[i] if member_masks is not None
                      else (None, None))
            out = VisionTransformer3D(
                cfg, zero_head=self.zero_head, vis=False,
                remat=self.remat, name=f"transformer_{i}",
            )(x, deterministic=deterministic, num_layers_active=la,
              mlp_active=ml)
            member_logits.append(out.logits)
        concat = jnp.concatenate(member_logits, axis=-1)   # (B, N*C)
        return MetaHead(
            n_members=len(self.configs), name="meta",
        )(concat)
