"""Multi-head dot-product attention for the tiny-head 3D-ViT regime.

Capability-equivalent to the reference's `models/modeling.py:55-99`
(`Attention.forward`): scores = QK^T / sqrt(head_dim) -> softmax -> context.

The reference regime is unusual for attention kernels: sequence length is a
constant 65 tokens (64 patches + CLS) and head_dim is 4..16 — far below the
MXU's native 128x128 tile.  Two implementations are provided:

  * ``xla``    — einsum formulation; XLA fuses the softmax chain and, at this
                 size, keeps everything resident in VMEM already.
  * ``pallas`` — a single fused kernel (QK^T, softmax, PV in one VMEM
                 round-trip).  See `ops/pallas_attention.py`.

Measured on a v5e chip (f32, scanned 30-iter programs with true host-fetch
sync, 2026-08-16; kernel uses Mosaic batched dot_generals over the
batch-head block):
  (B=256, H=8, S=65, hd=4):    xla  1.14ms   pallas 2.23ms
  (B=256, H=4, S=65, hd=16):   xla  1.05ms   pallas 1.05ms
  (B=128, H=12, S=513, hd=64): xla 10.88ms   pallas 5.78ms   (kernel 1.9x)
The default stays ``xla`` for the reference's 65-token regime; for the
128^3-volume stretch regime (513 tokens, ViT-B) the fused kernel halves
attention time by keeping the (BH, S, S) probability tensor in VMEM —
select it with --attention_impl pallas.  (Compare ops/pallas_mlp.py, which
wins 3x at reference widths — the FFN intermediate is where the tiny-ViT's
bytes are.)

Both return the attention probabilities when ``return_probs`` is set, to
preserve the reference's ``vis=True`` API (`modeling.py:90`).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_DEFAULT_IMPL = "auto"

#: head_dim bound below which the 'vpu' impl (broadcast-multiply-reduce
#: contractions) is shape-appropriate.  NOTE: measured end-to-end it does
#: NOT beat the einsum path (7279 vs 7913 vol/s on the 18-model bench —
#: the cost is the materialized (B, H, 65, 65) scores traffic, identical
#: under both formulations; docs/RESULTS.md "The attention 24%"), so
#: 'auto' does not select it; it remains available for experiments.
_VPU_MAX_HEAD_DIM = 16


def set_default_attention_impl(impl: str) -> None:
    """Select the process-wide default attention implementation.

    'layer' is the whole-sublayer fused kernel (QKV -> softmax -> out in
    one VMEM residency, `ops/pallas_attention_layer.py`); it dispatches in
    `models/vit3d.Attention` (the sublayer owns the projection weights) on
    probs-free paths with attention dropout inactive — training included
    (recompute-through-XLA VJP); vis mode degrades to the einsum
    formulation below.  MEASURED (v5e, round 4): it LOSES everywhere —
    3545 vs 7941 vol/s on the 18-model inference bench and −29% on a
    grid training chunk — the VPU contraction costs more than the
    scores/probs HBM traffic it removes; kept as a bounded negative
    result (docs/RESULTS.md "The performance endgame").
    """
    global _DEFAULT_IMPL
    if impl not in ("auto", "xla", "vpu", "pallas", "layer"):
        raise ValueError(f"unknown attention impl: {impl!r}")
    _DEFAULT_IMPL = impl


def get_default_attention_impl() -> str:
    return _DEFAULT_IMPL


def _xla_attention(q, k, v, dropout_rng, dropout_rate, deterministic,
                   vpu_dots=False):
    """Reference einsum path. q,k,v: (..., heads, seq, head_dim).

    With ``vpu_dots`` the two contractions lower as broadcast-multiply +
    reduce (VPU) rather than dot_general (MXU): exact same math, same
    accumulation dtype, different unit.  At head_dim <= 16 and 65 tokens
    the MXU charges a full 128x128x128 pass per (batch, head) block dot,
    so the VPU form wins by an order of magnitude (see module docstring).
    """
    head_dim = q.shape[-1]
    if vpu_dots:
        # (..., h, q, 1, d) * (..., h, 1, k, d) -> reduce d: XLA fuses the
        # multiply into the reduction without materializing the 5-D array.
        scores = jnp.sum(q[..., :, None, :] * k[..., None, :, :], axis=-1)
    else:
        scores = jnp.einsum("...hqd,...hkd->...hqk", q, k)
    scores = scores / math.sqrt(head_dim)
    probs = jax.nn.softmax(scores, axis=-1)
    dropped = probs
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        dropped = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    if vpu_dots:
        # (..., h, q, k, 1) * (..., h, 1, k, d) -> reduce k
        context = jnp.sum(dropped[..., :, :, None] * v[..., None, :, :],
                          axis=-2)
    else:
        context = jnp.einsum("...hqk,...hkd->...hqd", dropped, v)
    return context, probs


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    dropout_rng: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    return_probs: bool = False,
    impl: Optional[str] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Fused multi-head attention.

    Args:
      q, k, v: (..., num_heads, seq, head_dim) arrays.
      return_probs: also return post-softmax attention probabilities
        (pre-dropout), matching `modeling.py:89-90`.
      impl: 'xla' | 'pallas' | None (process default).

    Returns:
      (context, probs) with context (..., num_heads, seq, head_dim) and
      probs (..., num_heads, seq, seq) or None.
    """
    impl = impl or _DEFAULT_IMPL
    if impl == "layer":
        # the fused sublayer kernel was not applicable at the call site
        # (vis mode / active attention dropout); degrade to einsum
        impl = "xla"
    if impl == "auto":
        # Measured (v5e, B=512, bf16, 18-model bench, 2026-08-16): at the
        # 65-token tiny-head regime the XLA einsum path beats every
        # alternative END TO END — vpu mul-reduce 7279, MXU-batched Pallas
        # 1940, VPU-formulation Pallas 2982, vs 7913 vol/s for xla — so
        # 'auto' is the einsum path at every head_dim; the fused kernel
        # remains an explicit opt-in for the 513-token stretch regime
        # where it wins 1.9x (see ops/pallas_attention.py and
        # docs/RESULTS.md).
        impl = "xla"
    if impl == "pallas" and (dropout_rate == 0.0 or deterministic):
        from vit3d_ensemble_tpu.ops.pallas_attention import fused_attention

        context = fused_attention(q, k, v)
        probs = None
        if return_probs:
            # probs are only materialized on request (vis mode); recompute via
            # the einsum path, which XLA dedups against the fused kernel only
            # in vis mode — the hot train path never takes this branch.
            _, probs = _xla_attention(q, k, v, None, 0.0, True)
        return context, probs

    context, probs = _xla_attention(
        q, k, v, dropout_rng, dropout_rate, deterministic,
        vpu_dots=(impl == "vpu")
    )
    return context, (probs if return_probs else None)
