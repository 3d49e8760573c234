"""TPU compute kernels: fused attention (Pallas) + XLA reference paths."""

from vit3d_ensemble_tpu.ops.attention import (  # noqa: F401
    dot_product_attention,
    set_default_attention_impl,
)
