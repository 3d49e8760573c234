"""Int8 (W8A8) matmul path for inference — the last untested perf lever.

The reference has no quantization anywhere (pure f32 eager torch); this is
net-new TPU capability.  Motivation (VERDICT r4): the stretch 3D ViT-B/16
@128^3 runs ~48 TFLOPS effective in bf16 — genuinely MXU-bound — and the
v5e MXU's int8 peak is 2x its bf16 peak (394 TOPS vs 197 TFLOPS), so int8
projections are the one remaining headroom direction.  The tiny reference
models are N-tile-priced (the MXU charges a full tile at D <= 64), where
int8 should be ~neutral — both hypotheses are measured in
`benchmarks/int8_ab.py` and reported in docs/RESULTS.md.

Recipe (standard dynamic W8A8):
  * weights: symmetric per-OUTPUT-channel scales (absmax/127 over the
    input axis) — constant per matmul, quantized in-graph (cost is one
    elementwise pass over the weight, O(K*N) vs the matmul's O(T*K*N));
  * activations: symmetric per-TOKEN scales (absmax/127 over the feature
    axis), recomputed each call — no calibration pass needed;
  * int8 x int8 -> int32 accumulation on the MXU
    (`lax.dot_general(..., preferred_element_type=int32)`), dequantized
    by the rank-1 outer product of the two scale vectors.

Scope: the Q/K/V/out projections and the MLP fc1/fc2 — the FLOPs carriers
(at ViT-B/16 128^3: projections+MLP are ~80% of forward FLOPs).  The
attention scores/softmax/context stay in the ambient dtype: they are
~4T^2D vs the projections' 8TD^2 FLOPs (1:4 at T=513, D=768) and are the
numerically delicate part.  Patch embedding and the classifier head stay
unquantized (<10% of FLOPs).

Process-wide selector mirrors `ops.mlp` / `ops.attention`; inference-only
by construction — the flax modules only take this path when dropout is
inactive, and the grid/trainer program caches key on the selector (same
stale-program contract as the impl knobs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_DEFAULT_QUANT_IMPL = "none"

#: absmax floor: an all-zero row/column would otherwise divide by zero.
_EPS = 1e-8


def set_default_quant_impl(impl: str) -> None:
    """'none' | 'int8' (attention projections + MLP) | 'int8_attn'
    (attention projections only — the MLP keeps the fused Pallas kernel,
    which the measured stretch A/B shows is worth more than MXU int8
    doubling at 513 tokens: bf16+pallas 773 vs int8 717 vs bf16+xla
    666 vol/s, benchmarks/int8_ab.py)."""
    global _DEFAULT_QUANT_IMPL
    if impl not in ("none", "int8", "int8_attn"):
        raise ValueError(f"unknown quant impl: {impl!r}")
    _DEFAULT_QUANT_IMPL = impl


def get_default_quant_impl() -> str:
    return _DEFAULT_QUANT_IMPL


def quantize_rowwise(x: jax.Array):
    """Per-leading-row symmetric int8: scales over the LAST axis."""
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(ax, _EPS) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def quantize_colwise(w: jax.Array):
    """Per-output-column symmetric int8 for a (K, N) weight."""
    ax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True)
    scale = jnp.maximum(ax, _EPS) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def int8_dense(x: jax.Array, w: jax.Array, b=None) -> jax.Array:
    """y = x @ w (+ b) with dynamic W8A8 int8 MXU matmul.

    x: (..., K); w: (K, N); returns (..., N) in x.dtype.
    """
    xq, sx = quantize_rowwise(x)
    wq, sw = quantize_colwise(w)
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx * sw
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)
