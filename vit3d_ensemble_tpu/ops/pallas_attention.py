"""Fused multi-head attention Pallas kernel for the tiny-head 3D-ViT regime.

Shapes in play (reference grid, `tools.py:84-97`): sequence 65 tokens,
head_dim in {1, 4, 8, 16}, heads 4-16.  At this size the cost of attention
is NOT FLOPs — it is the HBM round-trip of the (batch*heads, 65, 65)
probability tensor between the two matmuls, which XLA cannot fuse through.
This kernel keeps scores/softmax/context for a block of batch-heads
entirely in VMEM.

Design:
  * leading dims x heads flatten to one BH axis; the grid tiles it in
    blocks of BH_BLOCK; each program fori-loops over its block computing
    (S, hd) @ (hd, S) -> masked softmax -> (S, S) @ (S, hd) per head on
    the MXU/VPU without leaving VMEM;
  * head_dim is zero-padded up to 8 lanes in the wrapper (zeros change
    neither scores nor context);
  * backward: `jax.custom_vjp` recomputes through the einsum formulation
    (XLA autodiff) — standard fused-forward / recompute-backward scheme;
    attention dropout is 0.0 in every reference config so the kernel only
    serves the no-dropout path (`ops.attention` guards dispatch).

Kernel-language details follow the Pallas TPU guide (pallas_guide.md):
VMEM BlockSpecs, static shapes, masked softmax over the padded lane tail.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: batch-heads processed per program instance.
BH_BLOCK = 16
#: minimum head_dim lanes fed to the kernel (zero-padded below this).
MIN_HD = 8
#: head_dim at or below which the VPU-formulation kernel dispatches.
TINY_HD = 16
#: batch-heads per program instance for the tiny kernel (~2.5 MB VMEM).
TINY_BH_BLOCK = 32


def _tiny_attention_kernel(q_ref, kT_ref, vT_ref, o_ref, *, scale: float,
                           hd: int):
    """VPU formulation for head_dim <= 16: no MXU dots at all.

    At hd 1-16 a batched (S, hd)x(hd, S) MXU dot wastes >99% of its 128^3
    pass, and via XLA the (BH, S, S) scores/probs round-trip HBM with the
    65-token minor dim padded to 128 lanes.  Here scores build as hd
    broadcast-FMA passes in the natural orientation (i on sublanes from
    q's (S, 1) lane slices, j on lanes from kT's (1, S) sublane slices),
    softmax runs in VMEM, and context comes back as hd masked lane
    reductions — everything stays on the VPU in VMEM.

    Refs: q (blk, S, hd);  kT, vT, o (blk, hd, S) — o holds context^T.
    """
    q = q_ref[...]
    kT = kT_ref[...]
    vT = vT_ref[...]
    scores = q[:, :, 0:1].astype(jnp.float32) * kT[:, 0:1, :].astype(
        jnp.float32)
    for d in range(1, hd):
        scores += q[:, :, d:d + 1].astype(jnp.float32) * kT[
            :, d:d + 1, :].astype(jnp.float32)
    scores *= scale                                      # (blk, S, S)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    for d in range(hd):
        ctx_d = jnp.sum(p * vT[:, d:d + 1, :].astype(jnp.float32),
                        axis=-1)                         # (blk, S_i)
        o_ref[:, d, :] = ctx_d.astype(o_ref.dtype)


def _tiny_attention_impl(q: jax.Array, k: jax.Array,
                         v: jax.Array) -> jax.Array:
    """q, k, v: (..., H, S, hd) -> context (..., H, S, hd), hd <= 16."""
    orig_shape = q.shape
    *lead, S, hd = q.shape
    scale = 1.0 / math.sqrt(hd)
    bh = 1
    for d in lead:
        bh *= d
    q2 = q.reshape(bh, S, hd)
    kT = k.reshape(bh, S, hd).transpose(0, 2, 1)
    vT = v.reshape(bh, S, hd).transpose(0, 2, 1)

    blk = min(TINY_BH_BLOCK, bh)
    bh_pad = -(-bh // blk) * blk
    if bh_pad != bh:
        q2 = jnp.pad(q2, [(0, bh_pad - bh), (0, 0), (0, 0)])
        kT = jnp.pad(kT, [(0, bh_pad - bh), (0, 0), (0, 0)])
        vT = jnp.pad(vT, [(0, bh_pad - bh), (0, 0), (0, 0)])

    grid = (bh_pad // blk,)
    q_spec = pl.BlockSpec((blk, S, hd), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec((blk, hd, S), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    oT = pl.pallas_call(
        functools.partial(_tiny_attention_kernel, scale=scale, hd=hd),
        out_shape=jax.ShapeDtypeStruct((bh_pad, hd, S), q2.dtype),
        grid=grid,
        in_specs=[q_spec, t_spec, t_spec],
        out_specs=t_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bh_pad * S * S * hd,
            bytes_accessed=4 * bh_pad * S * hd * q2.dtype.itemsize,
            transcendentals=bh_pad * S * S,
        ),
    )(q2, kT, vT)
    return oT[:bh].transpose(0, 2, 1).reshape(orig_shape)


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """One block: q/k/v/o refs are (BH_BLOCK, S, hd_pad) in VMEM.

    Both matmuls are BATCHED dot_generals over the block's batch-head dim
    (Mosaic lowers 3D batched dots natively); scores/softmax/context never
    leave VMEM.
    """
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale          # (B, S, S)
    probs = jax.nn.softmax(scores, axis=-1)
    o_ref[...] = jax.lax.dot_general(
        probs.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _fused_attention_impl(q: jax.Array, k: jax.Array,
                          v: jax.Array) -> jax.Array:
    """q, k, v: (..., H, S, hd) -> context (..., H, S, hd)."""
    if q.shape[-1] <= TINY_HD:
        return _tiny_attention_impl(q, k, v)
    orig_shape = q.shape
    *lead, S, hd = q.shape
    scale = 1.0 / math.sqrt(hd)        # true head_dim, before padding

    bh = 1
    for d in lead:
        bh *= d
    q2 = q.reshape(bh, S, hd)
    k2 = k.reshape(bh, S, hd)
    v2 = v.reshape(bh, S, hd)

    hd_pad = max(hd, MIN_HD)
    if hd_pad != hd:
        pad = [(0, 0), (0, 0), (0, hd_pad - hd)]
        q2, k2, v2 = (jnp.pad(a, pad) for a in (q2, k2, v2))

    # adapt the block size to VMEM: per batch-head the kernel holds
    # 3x(S, hd) inputs + (S, S) scores + (S, hd) out in f32; Mosaic
    # double-buffers pipeline blocks and pads lanes, so budget ~3 MB.
    bytes_per_head = (4 * S * hd_pad + S * S) * 4
    bh_block = max(1, min(BH_BLOCK, (3 * 1024 * 1024) // bytes_per_head))

    bh_pad = -(-bh // bh_block) * bh_block
    if bh_pad != bh:
        pad = [(0, bh_pad - bh), (0, 0), (0, 0)]
        q2, k2, v2 = (jnp.pad(a, pad) for a in (q2, k2, v2))

    grid = (bh_pad // bh_block,)
    spec = pl.BlockSpec((bh_block, S, hd_pad), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attention_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh_pad, S, hd_pad), q2.dtype),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bh_pad * S * S * hd_pad,
            bytes_accessed=4 * bh_pad * S * hd_pad * 4,
            transcendentals=bh_pad * S * S,
        ),
    )(q2, k2, v2)
    return out[:bh, :, :hd].reshape(orig_shape)


def _reference_attention(q, k, v):
    hd = q.shape[-1]
    scores = jnp.einsum("...hqd,...hkd->...hqk", q, k) / math.sqrt(hd)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("...hqk,...hkd->...hqd", probs, v)


@jax.custom_vjp
def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    return _fused_attention_impl(q, k, v)


def _fwd(q, k, v):
    return _fused_attention_impl(q, k, v), (q, k, v)


def _bwd(residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(_reference_attention, q, k, v)
    return vjp(g)


fused_attention.defvjp(_fwd, _bwd)
