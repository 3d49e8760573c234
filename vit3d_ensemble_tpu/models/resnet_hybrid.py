"""Pre-activation ResNetV2 hybrid backbone (Flax).

Capability-equivalent to the reference's `models/modeling_resnet.py:35-164`
(StdConv2d / PreActBottleneck / ResNetV2): weight-standardized convs,
GroupNorm(32), pre-activation bottlenecks, root 7x7/2 conv + 3x3/2 maxpool,
three stages with `block_units` repeats and `width_factor` scaling.

Status note (SURVEY.md §2 row 10): in the reference this backbone is DEAD
code — the hybrid branch is never taken ('grid' never appears in any
config, `modeling.py:137-152`) and its 2D convs could not consume the 3D
input anyway.  Here it is implemented and *reachable*: when
`ViTConfig.hybrid_grid` is set, `Embeddings` runs each z-slice through the
backbone (vmapped over depth) before 3D patchification, which is the only
semantics under which the reference's design is well-defined.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class StdConv(nn.Conv):
    """Weight-standardized conv (`modeling_resnet.py:35-42`): kernel is
    normalized to zero mean / unit variance over (spatial, in) dims."""

    def param(self, name, init_fn, *args, **kwargs):
        p = super().param(name, init_fn, *args, **kwargs)
        if name == "kernel":
            mean = jnp.mean(p, axis=(0, 1, 2), keepdims=True)
            var = jnp.var(p, axis=(0, 1, 2), keepdims=True)
            p = (p - mean) / jnp.sqrt(var + 1e-5)
        return p


def _gn(name: str):
    return nn.GroupNorm(num_groups=32, epsilon=1e-6, name=name)


class PreActBottleneck(nn.Module):
    """Pre-activation (v2) bottleneck (`modeling_resnet.py:45-126`)."""

    cout: int
    cmid: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        needs_proj = (self.stride != 1) or (cin != self.cout)
        residual = x
        if needs_proj:
            residual = StdConv(self.cout, (1, 1), strides=self.stride,
                               use_bias=False, name="downsample")(x)
            residual = _gn("gn_proj")(residual)

        y = StdConv(self.cmid, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(_gn("gn1")(y))
        y = StdConv(self.cmid, (3, 3), strides=self.stride, use_bias=False,
                    padding=1, name="conv2")(y)
        y = nn.relu(_gn("gn2")(y))
        y = StdConv(self.cout, (1, 1), use_bias=False, name="conv3")(y)
        y = _gn("gn3")(y)
        return nn.relu(residual + y)


class ResNetV2(nn.Module):
    """3-stage ResNetV2 feature extractor (`modeling_resnet.py:129-164`)."""

    block_units: Sequence[int] = (3, 4, 9)
    width_factor: int = 1

    @nn.compact
    def __call__(self, x):
        width = 64 * self.width_factor
        x = StdConv(width, (7, 7), strides=2, use_bias=False, padding=3,
                    name="root_conv")(x)
        x = nn.relu(_gn("root_gn")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        for stage, units in enumerate(self.block_units):
            cout = width * 4 * (2 ** stage)
            cmid = width * (2 ** stage)
            for unit in range(units):
                stride = 2 if (stage > 0 and unit == 0) else 1
                x = PreActBottleneck(cout=cout, cmid=cmid, stride=stride,
                                     name=f"block{stage + 1}_unit{unit + 1}")(x)
        return x

    @property
    def width(self) -> int:
        return 64 * self.width_factor


class HybridBackbone3D(nn.Module):
    """Apply the 2D ResNetV2 to each z-slice of a (B, H, W, Z, C) volume.

    Returns (B, H', W', Z, C') feature volumes for 3D patchification.
    """

    block_units: Sequence[int] = (3, 4, 9)
    width_factor: int = 1

    @nn.compact
    def __call__(self, x):
        resnet = ResNetV2(self.block_units, self.width_factor,
                          name="resnet")
        # (B, H, W, Z, C) -> (Z, B, H, W, C) -> vmap -> back
        xz = jnp.moveaxis(x, 3, 0)
        feats = nn.vmap(
            lambda mdl, a: mdl(a),
            in_axes=0, out_axes=0,
            variable_axes={"params": None},
            split_rngs={"params": False},
        )(resnet, xz)
        return jnp.moveaxis(feats, 0, 3)
