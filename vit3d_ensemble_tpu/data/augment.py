"""On-device augmentation: vmapped jnp transforms replacing on-disk folders.

The reference ships three PRECOMPUTED augmented copies of every slice on
disk ('rotation', 'vertical_flip', 'horizontal_flip' folders —
`README.md:10-18`) and appends them to the trainset in its loaders
(`utils/data_utils_cv.py:29-40`).  Inspection of the shipped data shows:

  * vertical_flip   == np.flipud (exact, bit-parity verified);
  * horizontal_flip == np.fliplr (exact);
  * rotation        == per-patient random in-plane rotation (angle varies
                       by patient, roughly within +-30 deg, nearest-neighbor
                       resampling; NOT bit-reproducible from the code).

This module reimplements all three as jit/vmap-friendly jnp ops applied to
whole (N, H, W, Z, C) batches on device, so the aug pipeline costs no host
I/O and no HBM round-trips beyond the source batch.  Disk-folder loading
remains available in `data.pipeline` for bit-parity comparisons.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp

#: Angle range (degrees) matching the observed spread of the reference's
#: precomputed rotation folders.
ROTATION_RANGE_DEG: Tuple[float, float] = (-30.0, 30.0)


def vertical_flip(vol: jax.Array) -> jax.Array:
    """np.flipud per slice: flip the H axis. vol: (..., H, W, Z, C)."""
    return jnp.flip(vol, axis=-4)


def horizontal_flip(vol: jax.Array) -> jax.Array:
    """np.fliplr per slice: flip the W axis. vol: (..., H, W, Z, C)."""
    return jnp.flip(vol, axis=-3)


def rotate_inplane(vol: jax.Array, angle_deg: jax.Array) -> jax.Array:
    """In-plane (H, W) rotation by `angle_deg` about the image center.

    Nearest-neighbor gather formulated as a static-shape jnp op (no
    scipy.ndimage): for each output pixel, compute the source coordinate
    under the inverse rotation and gather with out-of-bounds -> 0.
    vol: (H, W, Z, C) single volume; use jax.vmap for batches.
    """
    H, W = vol.shape[0], vol.shape[1]
    theta = angle_deg * (math.pi / 180.0)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) - cy
    xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) - cx
    # inverse map (rotate output grid by -theta into source space)
    src_y = cos * yy - sin * xx + cy
    src_x = sin * yy + cos * xx + cx
    iy = jnp.round(src_y).astype(jnp.int32)
    ix = jnp.round(src_x).astype(jnp.int32)
    valid = (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)
    iy = jnp.clip(iy, 0, H - 1)
    ix = jnp.clip(ix, 0, W - 1)
    gathered = vol[iy, ix]                      # (H, W, Z, C)
    return jnp.where(valid[..., None, None], gathered, 0.0)


@functools.partial(jax.jit, static_argnames=("rotation_range",))
def augment_batch(
    volumes: jax.Array,
    rng: jax.Array,
    rotation_range: Tuple[float, float] = ROTATION_RANGE_DEG,
) -> jax.Array:
    """The reference's 3-variant augmentation for a batch, on device.

    volumes: (N, H, W, Z, C).  Returns (3, N, H, W, Z, C) stacked
    [rotation, vertical_flip, horizontal_flip] — the same append order as
    `utils/data_utils_cv.py:30,37-40`.
    """
    n = volumes.shape[0]
    angles = jax.random.uniform(
        rng, (n,), minval=rotation_range[0], maxval=rotation_range[1]
    )
    rotated = jax.vmap(rotate_inplane)(volumes, angles)
    return jnp.stack([rotated, vertical_flip(volumes),
                      horizontal_flip(volumes)])
