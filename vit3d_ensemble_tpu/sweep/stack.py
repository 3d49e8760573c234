"""Shape-class grouping and stacked/padded parameter construction.

The 18 README configs span 3 (hidden_size, num_heads) shape classes x
{2048, 3072} MLP widths x {4, 6, 8} depths.  Hidden size cannot be padded
without changing LayerNorm semantics, so (D, k) defines the compiled shape
class; depth and MLP width are padded to the class maximum with ZEROS and
masked at runtime (exact — see `models/vit3d.py` docstring).

Each group trains as ONE jitted program over stacked parameters with leading
axes (n_configs_in_group, n_folds).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vit3d_ensemble_tpu.configs import ViTConfig, parameters_config
from vit3d_ensemble_tpu.models import VisionTransformer3D


@dataclasses.dataclass(frozen=True)
class ConfigGroup:
    hidden_size: int
    num_heads: int
    confs: Tuple[int, ...]            # config numbers, length G
    mlp_dims: Tuple[int, ...]         # per conf
    num_layers: Tuple[int, ...]       # per conf

    @property
    def max_mlp(self) -> int:
        return max(self.mlp_dims)

    @property
    def max_layers(self) -> int:
        return max(self.num_layers)

    def template_config(self, img_size: int = 128) -> ViTConfig:
        """The padded architecture this group compiles to."""
        return ViTConfig(
            patch_size=(16, 16, 5),
            hidden_size=self.hidden_size,
            mlp_dim=self.max_mlp,
            num_heads=self.num_heads,
            num_layers=self.max_layers,
            img_size=img_size,
        )

    def member_config(self, i: int, img_size: int = 128) -> ViTConfig:
        return ViTConfig.from_conf(self.confs[i], img_size=img_size)


def group_configs(confs: Sequence[int]) -> List[ConfigGroup]:
    """Partition config numbers into (hidden, heads) shape classes."""
    buckets: Dict[Tuple[int, int], List[int]] = {}
    for c in confs:
        ps, mlp, L, hs, nh = parameters_config(c)
        if ps != 16:
            raise ValueError(
                f"conf {c} uses patch {ps}; sweep groups assume the README "
                "16-patch grid")
        buckets.setdefault((hs, nh), []).append(c)
    groups = []
    for (hs, nh), members in sorted(buckets.items(), reverse=True):
        members = sorted(members)
        groups.append(ConfigGroup(
            hidden_size=hs,
            num_heads=nh,
            confs=tuple(members),
            mlp_dims=tuple(parameters_config(c)[1] for c in members),
            num_layers=tuple(parameters_config(c)[2] for c in members),
        ))
    return groups


def _pad_to(small: jnp.ndarray, target_shape: Tuple[int, ...]) -> jnp.ndarray:
    """Zero-pad `small` up to target_shape (trailing-region padding)."""
    if tuple(small.shape) == tuple(target_shape):
        return small
    pads = [(0, t - s) for s, t in zip(small.shape, target_shape)]
    return jnp.pad(small, pads)


def _member_init_fn(group: ConfigGroup, i: int, seed: int, img_size: int):
    """Traceable body: init config i with its TRUE shapes, then zero-pad to
    the group template.  Zero padding + runtime masks keeps padded regions
    exactly inert under any optimizer (grads are 0; weight decay of 0 is 0).
    """
    cfg = group.member_config(i, img_size)
    model = VisionTransformer3D(cfg, zero_head=True, vis=False)
    dummy = jnp.zeros((1, img_size, img_size, cfg.z_size, cfg.in_channels))
    params = model.init({"params": jax.random.key(seed)}, dummy)["params"]

    template = group.template_config(img_size)
    tmodel = VisionTransformer3D(template, zero_head=True, vis=False)
    tshapes = jax.eval_shape(
        lambda: tmodel.init({"params": jax.random.key(0)}, dummy)["params"])
    return jax.tree.map(lambda p, t: _pad_to(p, t.shape), params, tshapes)


def init_member_params(group: ConfigGroup, i: int, seed: int,
                       img_size: int = 128) -> dict:
    """One member's padded init, as a single compiled program (eager linen
    init dispatches hundreds of tiny ops — ruinous over a remote-device
    tunnel: ~13s/member eager vs milliseconds jitted)."""
    return jax.jit(lambda: _member_init_fn(group, i, seed, img_size))()


def init_group_params(group: ConfigGroup, n_folds: int, seed: int,
                      img_size: int = 128) -> dict:
    """Stacked params with leading axes (G, F), built in ONE jitted program.

    The reference re-seeds identically before every fold's model creation
    (`train_baseline_cv.py:270-275`), so folds share their init; we keep
    that: the fold axis is a broadcast of one init per config.
    """

    def build():
        members = [_member_init_fn(group, i, seed, img_size)
                   for i in range(len(group.confs))]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *members)
        return jax.tree.map(
            lambda x: jnp.broadcast_to(x[:, None], (x.shape[0], n_folds)
                                       + x.shape[1:]),
            stacked)

    return jax.jit(build)()


def unpad_group_params(padded: dict, group: ConfigGroup,
                       img_size: int = 128, lead_axes: int = 1):
    """Crop EVERY member's true-shape tree out of stacked padded params in
    one jitted call.

    padded: leading axes (G, *lead) — e.g. (G, F) from the sweep engine.
    Returns a list of G trees, each with the `lead_axes` leading axes kept
    (per-fold) and trailing dims cropped to the member's true shapes.
    Doing this on device in one program matters: per-leaf eager slicing is
    ~26 leaves x G dispatches over the remote link, and fetching padded
    params moves ~4x the bytes.
    """
    targets = []
    for i in range(len(group.confs)):
        cfg = group.member_config(i, img_size)
        model = VisionTransformer3D(cfg, zero_head=True, vis=False)
        dummy = jnp.zeros((1, img_size, img_size, cfg.z_size,
                           cfg.in_channels))
        targets.append(jax.eval_shape(
            lambda m=model: m.init({"params": jax.random.key(0)},
                                   dummy)["params"]))

    @jax.jit
    def crop_all(padded):
        out = []
        for i, tshapes in enumerate(targets):
            def crop(p, t):
                lead = tuple(slice(None) for _ in range(lead_axes))
                return p[(i,) + lead + tuple(slice(0, s) for s in t.shape)]

            out.append(jax.tree.map(crop, padded, tshapes))
        return tuple(out)

    return jax.device_get(crop_all(padded))


def unpad_params(padded: dict, group: ConfigGroup, i: int,
                 img_size: int = 128) -> dict:
    """Slice one member's TRUE-shape param tree back out of padded params."""
    cfg = group.member_config(i, img_size)
    model = VisionTransformer3D(cfg, zero_head=True, vis=False)
    dummy = jnp.zeros((1, img_size, img_size, cfg.z_size, cfg.in_channels))
    tshapes = jax.eval_shape(
        lambda: model.init({"params": jax.random.key(0)}, dummy)["params"])

    def crop(p, t):
        slices = tuple(slice(0, s) for s in t.shape)
        return p[slices]

    return jax.tree.map(crop, padded, tshapes)
