"""Per-volume fused attention-core kernel: scores -> softmax -> context
for ALL heads of a block of volumes in one VMEM residency.

The round-2 bound on the headline bench (docs/RESULTS.md "The attention
24%"): at the reference regime (65 tokens, head_dim 1..16, B=512 bf16)
the attention sublayer's cost is NOT FLOPs but the HBM round-trips of the
(B*H, 65, 65) scores/probs — padded to 128 lanes — between ops XLA cannot
fuse through.  Three narrower attacks all lost end-to-end: impl='vpu'
still materializes scores in HBM; the MXU-batched kernel burns 128^3
passes per tiny dot; the per-head-block VPU kernel
(`pallas_attention._tiny_attention_kernel`) does 1-3 us of work per grid
step, so step overhead dominates.

This kernel keeps that tiny kernel's VPU formulation — broadcast-FMA
scores in the natural orientation, f32 softmax, masked lane-reduction
context rows — but blocks by VOLUME, processing every head of NB=64
volumes per grid step (>= 30 us of work, the threshold the round-2
analysis set).  The scores/probs tensors never exist in HBM; what
remains are the q / k^T|v^T inputs and the ctx^T output, each
volume-sized (65 x D), ~16x smaller than one padded scores pass at
D=16.  The QKV and output projections stay in XLA, where the MXU path
is already the measured floor, and the k/v transpose + ctx^T transpose
are relayouts XLA folds into the adjacent matmuls.

Deliberately NO in-kernel reshape/transpose: Mosaic rejects shape casts
whose collapsed sublane dim (65 tokens) is not tile-aligned (verified:
`tpu.reshape (64x65x16) -> (4160x16)` fails "unsupported shape cast"),
so the kernel only lane-slices q and sublane-slices k^T/v^T — the access
patterns the round-2 tiny kernel already proved on this toolchain.

Training path: a custom VJP whose backward recomputes through the XLA
einsum formulation (the same recompute-through-XLA contract as
`ops/pallas_mlp.fused_mlp`) — fused forward, exact gradients, so the
kernel drops into the sequential trainers unchanged.  The kernel itself
has no dropout (the reference's attention dropout is 0.0 in every
config, `tools.py:93`) and never materializes probs (vis mode falls
back).  Dispatch: attention impl 'layer' (`models/vit3d.Attention`), on
probs-free paths where attention dropout is inactive.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: Volumes per grid step.  VMEM at the worst class (D=64, H=4, T=65):
#: q (64, 65, 64) bf16 0.5 MB + kvT (64, 128, 65) bf16 1 MB + oT
#: (64, 64, 65) 0.5 MB (each double-buffered) + scores/probs
#: (64, 65, 65->128 lanes) f32 ~4 MB live — inside the ~16 MB budget.
#: MEASURED limits (AOT, v5e): NB=64 fits the standalone B<=768 bench
#: programs but OOMs scoped VMEM at B=1024 (16.59M/16M) and inside the
#: fused-18 mega-program even at B=512 (20.59M/16M — XLA's surrounding
#: fusions share the scoped region).  The env override
#: VIT3D_ATTN_LAYER_NB=32 halves the footprint for those contexts.
NB_BLOCK = 64


def _nb_block() -> int:
    import os

    return int(os.environ.get("VIT3D_ATTN_LAYER_NB", NB_BLOCK))


def _attn_core_kernel(q_ref, kvT_ref, oT_ref, *, n_heads: int,
                      head_dim: int, scale: float):
    """q_ref (NB, T, D); kvT_ref (NB, 2D, T) = [k^T | v^T]; oT_ref
    (NB, D, T) = ctx^T."""
    D = n_heads * head_dim
    q = q_ref[...]
    kvT = kvT_ref[...]
    for head in range(n_heads):
        lo = head * head_dim
        # scores: i on sublanes (q lane slices), j on lanes (k^T rows)
        scores = (q[:, :, lo:lo + 1].astype(jnp.float32)
                  * kvT[:, lo:lo + 1, :].astype(jnp.float32))
        for d in range(1, head_dim):
            scores += (q[:, :, lo + d:lo + d + 1].astype(jnp.float32)
                       * kvT[:, lo + d:lo + d + 1, :].astype(jnp.float32))
        scores *= scale                                  # (NB, T, T)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        for d in range(head_dim):
            vrow = kvT[:, D + lo + d:D + lo + d + 1, :].astype(jnp.float32)
            oT_ref[:, lo + d, :] = jnp.sum(p * vrow, axis=-1).astype(
                oT_ref.dtype)


def _attention_core(q: jax.Array, kvT: jax.Array, n_heads: int,
                    head_dim: int) -> jax.Array:
    """(B, T, D), (B, 2D, T) -> ctx^T (B, D, T)."""
    B, T, D = q.shape
    scale = 1.0 / math.sqrt(head_dim)
    nb = min(_nb_block(), B)
    B_pad = -(-B // nb) * nb
    if B_pad != B:
        q = jnp.pad(q, [(0, B_pad - B), (0, 0), (0, 0)])
        kvT = jnp.pad(kvT, [(0, B_pad - B), (0, 0), (0, 0)])

    oT = pl.pallas_call(
        functools.partial(_attn_core_kernel, n_heads=n_heads,
                          head_dim=head_dim, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B_pad, D, T), q.dtype),
        grid=(B_pad // nb,),
        in_specs=[pl.BlockSpec((nb, T, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((nb, 2 * D, T), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((nb, D, T), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B_pad * n_heads * T * T * head_dim,
            bytes_accessed=4 * B_pad * T * D * q.dtype.itemsize,
            transcendentals=B_pad * n_heads * T * T,
        ),
    )(q, kvT)
    return oT[:B]


def _fused_attention_layer_impl(h, wqkv, bqkv, wout, bout, n_heads):
    B, T, D = h.shape
    head_dim = D // n_heads
    qkv = h @ wqkv + bqkv                                # (B, T, 3D)
    q = qkv[..., :D]
    kvT = jnp.swapaxes(qkv[..., D:], 1, 2)               # (B, 2D, T)
    ctxT = _attention_core(q, kvT, n_heads, head_dim)
    ctx = jnp.swapaxes(ctxT, 1, 2)                       # (B, T, D)
    return ctx @ wout + bout


def _reference_attention_layer(h, wqkv, bqkv, wout, bout, n_heads):
    """The identical sublayer math in XLA einsums — the backward pass
    recomputes through this (and it is what the kernel is tested
    against)."""
    B, T, D = h.shape
    hd = D // n_heads
    qkv = h @ wqkv + bqkv
    split = lambda a: a.reshape(B, T, n_heads, hd).transpose(  # noqa: E731
        0, 2, 1, 3)
    q, k, v = (split(qkv[..., i * D:(i + 1) * D]) for i in range(3))
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hd)
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, D)
    return ctx @ wout + bout


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_attention_layer(h: jax.Array, wqkv: jax.Array, bqkv: jax.Array,
                          wout: jax.Array, bout: jax.Array,
                          n_heads: int) -> jax.Array:
    """The attention sublayer (sans LN and residual): XLA MXU projections
    around the VMEM-resident attention core.

    h: (B, T, D) LN-normed tokens; wqkv (D, 3D) / bqkv (3D,) the fused
    q|k|v projection; wout (D, D) / bout (D,).  Returns (B, T, D) — the
    caller adds the residual (`modeling.py:184-188` order).

    Differentiable: the VJP recomputes through the XLA formulation
    (exact same math), so the kernel's saved residuals are just the
    inputs — the (B, H, T, T) probs tensor is never stored between
    passes, mirroring `jax.checkpoint`-style rematerialisation.
    """
    return _fused_attention_layer_impl(h, wqkv, bqkv, wout, bout, n_heads)


def _fal_fwd(h, wqkv, bqkv, wout, bout, n_heads):
    return (_fused_attention_layer_impl(h, wqkv, bqkv, wout, bout,
                                        n_heads),
            (h, wqkv, bqkv, wout, bout))


def _fal_bwd(n_heads, res, g):
    h, wqkv, bqkv, wout, bout = res
    _, vjp = jax.vjp(
        lambda *a: _reference_attention_layer(*a, n_heads),
        h, wqkv, bqkv, wout, bout)
    return vjp(g)


fused_attention_layer.defvjp(_fal_fwd, _fal_bwd)
