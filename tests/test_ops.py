"""Pallas fused-attention tests (interpret mode on CPU) vs the einsum path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit3d_ensemble_tpu.ops.attention import dot_product_attention


@pytest.mark.parametrize("shape", [
    (2, 4, 65, 16),     # conf-1 regime (B, H, S, hd)
    (3, 8, 65, 4),      # (32, 8) shape class
    (1, 16, 65, 1),     # (16, 16) — head_dim 1, exercises hd padding
    (2, 4, 5, 16),      # tiny sequence (32px test volumes)
])
def test_fused_attention_matches_einsum(shape, rng):
    from jax.experimental.pallas import tpu as pltpu

    from vit3d_ensemble_tpu.ops.pallas_attention import fused_attention

    q = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    k = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    v = jnp.asarray(rng.normal(size=shape).astype(np.float32))

    ref, _ = dot_product_attention(q, k, v, impl="xla")
    with pltpu.force_tpu_interpret_mode():
        out = fused_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_fused_attention_gradients_match(rng):
    from jax.experimental.pallas import tpu as pltpu

    from vit3d_ensemble_tpu.ops.pallas_attention import fused_attention

    shape = (2, 4, 9, 8)
    q = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    k = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    v = jnp.asarray(rng.normal(size=shape).astype(np.float32))

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v) ** 2)

    def loss_ref(q, k, v):
        out, _ = dot_product_attention(q, k, v, impl="xla")
        return jnp.sum(out ** 2)

    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)


def test_dispatch_impl_flag(rng):
    from vit3d_ensemble_tpu.ops import attention as att

    q = jnp.asarray(rng.normal(size=(1, 2, 5, 8)).astype(np.float32))
    ctx_xla, probs = att.dot_product_attention(q, q, q, impl="xla",
                                               return_probs=True)
    assert probs is not None and probs.shape == (1, 2, 5, 5)
    att.set_default_attention_impl("xla")
    with pytest.raises(ValueError):
        att.set_default_attention_impl("bogus")
