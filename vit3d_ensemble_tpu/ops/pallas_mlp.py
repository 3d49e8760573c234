"""Fused FFN (fc1 -> GELU -> fc2) Pallas kernel.

The reference MLP widths are extreme relative to the hidden size
(d in {2048, 3072} vs D in {16, 32, 64} — `tools.py:84-97`), so the FFN
intermediate (tokens x 3072) dominates the model's HBM traffic: XLA cannot
fuse through two matmuls, and at batch 128 the per-layer intermediate is
~50 MB written + read back.  This kernel tiles tokens and keeps the
intermediate entirely in VMEM; both weight matrices (64x3072 — well under
VMEM) are resident per program.

Supports the sweep's runtime width masking: `mlp_active` zeroes trailing
hidden columns after the GELU (exactly the `models.vit3d.Mlp` semantics),
passed as a scalar-prefetch argument.

Backward: custom VJP recomputes through the XLA formulation, so the kernel
drops into training code unchanged (fused forward, exact gradients).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 512


def _erf_approx(x):
    """erf via Abramowitz & Stegun 7.1.26 (max abs err 1.5e-7) — Mosaic has
    no erf/erfc primitive; this uses only exp and rational ops."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _erf_gelu(h):
    """Exact-GELU (erf formulation) to ~1.5e-7, the same activation as
    torch F.gelu / jax.nn.gelu(approximate=False)."""
    return 0.5 * h * (1.0 + _erf_approx(h * (2.0 ** -0.5)))


def _mlp_kernel(active_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[...]
    h = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)
    h = _erf_gelu(h)
    cols = jax.lax.broadcasted_iota(jnp.int32, h.shape, 1)
    h = jnp.where(cols < active_ref[0], h, 0.0).astype(x.dtype)
    out = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] = (out + b2_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _fused_mlp_impl(x, w1, b1, w2, b2, mlp_active):
    """x: (..., D) -> (..., D); weights (D, M), (M,), (M, D), (D,)."""
    orig_shape = x.shape
    D = x.shape[-1]
    M = w1.shape[-1]
    n = 1
    for d in orig_shape[:-1]:
        n *= d
    x2 = x.reshape(n, D)
    n_pad = -(-n // TILE_N) * TILE_N
    if n_pad != n:
        x2 = jnp.pad(x2, [(0, n_pad - n), (0, 0)])

    active = jnp.asarray(mlp_active, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // TILE_N,),
        in_specs=[
            pl.BlockSpec((TILE_N, D), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, M), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M,), lambda i, *_: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, D), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i, *_: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, D), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _mlp_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, D), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * n_pad * D * M,
            bytes_accessed=(n_pad * D * 2 + 2 * D * M) * x2.dtype.itemsize,
            transcendentals=n_pad * M,
        ),
    )(active, x2, w1, b1, w2, b2)
    return out[:n].reshape(orig_shape)


def _reference_mlp(x, w1, b1, w2, b2, mlp_active):
    h = jax.nn.gelu(x @ w1 + b1, approximate=False)
    cols = jnp.arange(h.shape[-1])
    h = h * (cols < mlp_active).astype(h.dtype)
    return h @ w2 + b2


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_mlp(x, w1, b1, w2, b2, mlp_active):
    return _fused_mlp_impl(x, w1, b1, w2, b2, mlp_active)


def _fwd(x, w1, b1, w2, b2, mlp_active):
    return _fused_mlp_impl(x, w1, b1, w2, b2, mlp_active), \
        (x, w1, b1, w2, b2, mlp_active)


def _bwd(res, g):
    x, w1, b1, w2, b2, mlp_active = res
    _, vjp = jax.vjp(lambda x, w1, b1, w2, b2:
                     _reference_mlp(x, w1, b1, w2, b2, mlp_active),
                     x, w1, b1, w2, b2)
    return (*vjp(g), None)


fused_mlp.defvjp(_fwd, _bwd)
