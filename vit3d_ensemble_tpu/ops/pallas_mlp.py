"""Fused FFN (fc1 -> GELU -> fc2) Pallas kernel.

The reference MLP widths are extreme relative to the hidden size
(d in {2048, 3072} vs D in {16, 32, 64} — `tools.py:84-97`), so the FFN
intermediate (tokens x 3072) dominates the model's HBM traffic AND its VPU
time: XLA cannot fuse through two matmuls, and every elementwise pass over
the intermediate costs more than the matmuls themselves at these hidden
sizes.  This kernel tiles tokens, keeps the intermediate entirely in VMEM,
and spends the fewest possible VPU passes on it:

  * the sweep's runtime width mask (`mlp_active`) is folded into the fc2
    ROWS in the wrapper (`w2 * (col < active)` — exact: the mask is 0/1 and
    h is finite), so the kernel does no iota/compare/where over the
    intermediate at all;
  * GELU uses erf evaluated WITHOUT exp or divide: measured on v5e, the
    erf evaluation was ~46% of total 18-model inference time.  The f32
    path keeps the A&S 7.1.26 approximation (1.5e-7, parity grade; Mosaic
    has no erf primitive).  The bf16 path uses a clamped odd polynomial
    fitted DIRECTLY to gelu (constants folded, endpoint-exact tail):
    gelu(h) ~= h*(0.5 + y*Q(y^2)), y = clamp(h, +-3.6) — max abs error
    5.7e-4, >=13x under the local bf16 ulp everywhere, 11 VPU
    ops/element vs ~30 for the exp-based form and 17 for the round-2
    deg-8 erf-level polynomial.

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

#: gelu(h) ~= h * (0.5 + y * Q(y^2)), y = clamp(h, -A, A) — constrained LP
#: minimax fit of Q DIRECTLY against gelu error over h in [0, 12] (fitted
#: 2026-08-16): the 0.5 and 1/sqrt(2) constants are folded into Q, and the
#: endpoint constraint A*Q(A^2) = 0.5 makes the tail exact (approx -> h for
#: |h| > A, true gelu - h = -0.5*h*erfc(h/sqrt2) <= 1.1e-4 there).  Max abs
#: gelu error 5.73e-4 at h~=2.27, where the bf16 ulp is 1.6e-2 — 27x under;
#: never worse than 13x under the local bf16 ulp.  Degree 5 in y^2 = 11 VPU
#: ops/element vs 17 for the previous erf-level deg-8 form (the GELU pass
#: over the (tokens, mlp_dim) intermediate is the kernel's dominant VPU
#: cost, so op count here is throughput).
_BF16_GELU_A = 3.6
_BF16_GELU_COEFS = (
    3.961523962e-01, -6.220111867e-02, 7.701753005e-03,
    -5.935066324e-04, 2.512920360e-05, -4.423316663e-07,
)


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


def _poly_gelu(h):
    """GELU via the clamped odd polynomial fitted to gelu itself — no exp,
    no divide, no sign/abs; 11 VPU ops.  bf16-output accuracy."""
    y = jnp.clip(h, -_BF16_GELU_A, _BF16_GELU_A)
    v = y * y
    acc = jnp.float32(_BF16_GELU_COEFS[-1])
    for c in _BF16_GELU_COEFS[-2::-1]:
        acc = acc * v + c
    return h * (0.5 + y * acc)


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
                fast_gelu: bool):
    x = x_ref[...]
    h = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    h = h + b1_ref[0].astype(jnp.float32)
    h = _poly_gelu(h) if fast_gelu else _erf_gelu(h)
    out = jnp.dot(h.astype(x.dtype), w2_ref[...],
                  preferred_element_type=jnp.float32)
    o_ref[...] = (out + b2_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


# NOTE (measured, v5e, 2026-08-16): a software-pipelined variant (grid of
# n_tiles+1 steps, fc1_i under one pl.when and gelu+fc2_{i-1} under another,
# double-buffered h scratch) benchmarked 20% SLOWER than this sequential
# kernel (3485 vs 4317 vol/s on the 18-model bench) — Mosaic does not
# overlap the predicated MXU/VPU regions, and the extra grid step plus
# scratch round-trip cost more than they save.  Keep the kernel sequential.
#
# Round-2b experiments (benchmarks/kernel_variants.py mlp_chunked /
# mlp_pipelined2) re-tested MXU/VPU overlap WITHOUT predicates:
#   * "chunked": fc1 whole-tile, then an unrolled chunk loop interleaving
#     gelu(chunk k) with the fc2 partial dot of chunk k-1 — chunk k's VPU
#     work is independent of chunk k-1's MXU dot, so the hardware could
#     in principle overlap them with no pl.when in sight.
#   * "pipelined2": n_tiles+1 grid steps, clamped index maps (the first
#     step's gelu+fc2 consumes uninitialised scratch and its output is
#     overwritten in step 1 before the block leaves VMEM), fc1_i issued
#     LAST so its consumer sits a full grid step away.
# MEASURED (v5e, 18-model bench, B=512, bit-exact vs seq): seq 7954,
# chunked 7932 (tie), pipelined2 7331 (-8%: the extra grid step + scratch
# round-trip cost, zero overlap gained).  Conclusion: Mosaic issues MXU
# and VPU work strictly in order regardless of predication or issue
# distance — the gelu pass is architecturally serialized with the matmuls
# on this toolchain, and the serialized matmul+GELU floor in
# docs/RESULTS.md is the true kernel floor.  "seq" stays the default.
_MLP_VARIANT = "seq"  # "seq" | "chunked" | "pipelined2"
_CHUNK_M = 512


def _chunked_mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
                        fast_gelu: bool):
    gelu = _poly_gelu if fast_gelu else _erf_gelu
    x = x_ref[...]
    h = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    h = h + b1_ref[0].astype(jnp.float32)
    M = h.shape[-1]
    acc = jnp.zeros((x.shape[0], o_ref.shape[-1]), jnp.float32)
    # unrolled: gelu(chunk c) is independent of the dot of chunk c-1
    for c in range(0, M, _CHUNK_M):
        g = gelu(h[:, c:c + _CHUNK_M]).astype(x.dtype)
        acc = acc + jnp.dot(g, w2_ref[c:c + _CHUNK_M, :],
                            preferred_element_type=jnp.float32)
    o_ref[...] = (acc + b2_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def _pipelined2_mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                           h_scr, *, fast_gelu: bool):
    gelu = _poly_gelu if fast_gelu else _erf_gelu
    i = pl.program_id(0)
    # stage B: gelu+fc2 of the PREVIOUS step's fc1 (step 0 consumes
    # uninitialised scratch; its output block is overwritten in step 1
    # before Pallas copies the block out).
    g = gelu(h_scr[(i + 1) % 2]).astype(o_ref.dtype)
    out = jnp.dot(g, w2_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] = (out + b2_ref[0].astype(jnp.float32)).astype(o_ref.dtype)
    # stage A: fc1 of THIS step's tile, issued last — its consumer is a
    # grid step away, the longest distance the hardware can hide it over.
    x = x_ref[...]
    h = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    h_scr[i % 2] = h + b1_ref[0].astype(jnp.float32)


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

    # fold the width mask into fc2 rows: (h * m) @ w2 == h @ (m[:, None] *
    # w2) exactly (m is 0/1), so the kernel never touches the (TILE_N, M)
    # intermediate with mask ops.
    mask = (jnp.arange(M) < jnp.asarray(mlp_active, jnp.int32))
    w2m = w2 * mask[:, None].astype(w2.dtype)

    # bf16 outputs tolerate the short polynomial erf; f32 keeps A&S.
    fast_gelu = x.dtype == jnp.bfloat16
    n_tiles = n_pad // TILE_N
    cost = pl.CostEstimate(
        flops=4 * n_pad * D * M,
        bytes_accessed=(n_pad * D * 2 + 2 * D * M) * x2.dtype.itemsize,
        transcendentals=0 if fast_gelu else n_pad * M,
    )
    w_specs = [
        pl.BlockSpec((D, M), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, M), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((M, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = (x2, w1, b1.reshape(1, M), w2m, b2.reshape(1, D))

    if _MLP_VARIANT == "pipelined2":
        grid_spec = pl.GridSpec(
            grid=(n_tiles + 1,),
            in_specs=[
                pl.BlockSpec((TILE_N, D),
                             lambda i: (jnp.minimum(i, n_tiles - 1), 0),
                             memory_space=pltpu.VMEM),
                *w_specs,
            ],
            out_specs=pl.BlockSpec((TILE_N, D),
                                   lambda i: (jnp.maximum(i - 1, 0), 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((2, TILE_N, M), jnp.float32)],
        )
        kernel = functools.partial(_pipelined2_mlp_kernel,
                                   fast_gelu=fast_gelu)
    else:
        grid_spec = pl.GridSpec(
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((TILE_N, D), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                *w_specs,
            ],
            out_specs=pl.BlockSpec((TILE_N, D), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )
        kernel = functools.partial(
            _chunked_mlp_kernel if _MLP_VARIANT == "chunked"
            else _mlp_kernel, fast_gelu=fast_gelu)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, D), x.dtype),
        cost_estimate=cost,
    )(*args)
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
