"""Process-wide MLP implementation selector (mirrors ops.attention's).

'xla' (default): two Dense matmuls + GELU, exact reference semantics
incl. inter-matmul dropout.  'pallas': the fused VMEM-resident kernel
(`pallas_mlp.py`) on deterministic (no-dropout) paths — measured ~2.9x
(f32) / ~1.4x (bf16) over XLA at the reference widths on a v5e chip.
"""

from __future__ import annotations

_DEFAULT_MLP_IMPL = "xla"


def set_default_mlp_impl(impl: str) -> None:
    global _DEFAULT_MLP_IMPL
    if impl not in ("xla", "pallas"):
        raise ValueError(f"unknown mlp impl: {impl!r}")
    _DEFAULT_MLP_IMPL = impl


def get_default_mlp_impl() -> str:
    return _DEFAULT_MLP_IMPL
