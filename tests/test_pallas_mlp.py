"""Fused-MLP kernel tests (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit3d_ensemble_tpu.ops.pallas_mlp import _reference_mlp, fused_mlp


@pytest.fixture()
def mlp_data(rng):
    D, M = 16, 96
    x = jnp.asarray(rng.normal(size=(2, 65, D)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(D, M)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.normal(size=(M,)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.normal(size=(M, D)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.normal(size=(D,)).astype(np.float32) * 0.1)
    return x, w1, b1, w2, b2


@pytest.mark.parametrize("active", [96, 64])
def test_fused_mlp_matches_reference(mlp_data, active):
    from jax.experimental.pallas import tpu as pltpu

    x, w1, b1, w2, b2 = mlp_data
    ref = _reference_mlp(x, w1, b1, w2, b2, active)
    with pltpu.force_tpu_interpret_mode():
        out = fused_mlp(x, w1, b1, w2, b2, active)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=1e-4)


def test_fused_mlp_bf16_poly_gelu(mlp_data):
    """The bf16 path's polynomial erf must agree with exact GELU to well
    under bf16 resolution (and the wrapper-folded width mask must hold)."""
    from jax.experimental.pallas import tpu as pltpu

    x, w1, b1, w2, b2 = mlp_data
    cast = lambda a: a.astype(jnp.bfloat16)  # noqa: E731
    ref = _reference_mlp(x, w1, b1, w2, b2, 64)
    with pltpu.force_tpu_interpret_mode():
        out = fused_mlp(cast(x), cast(w1), cast(b1), cast(w2), cast(b2), 64)
    assert out.dtype == jnp.bfloat16
    # bf16 matmuls dominate the tolerance; the poly erf sits well below it
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=0.05, rtol=0.05)

    # the polynomial itself: fitted max abs err 5.73e-4 (>=13x under the
    # local bf16 ulp everywhere; worst point h~=2.27 where ulp is 1.6e-2)
    from vit3d_ensemble_tpu.ops.pallas_mlp import _poly_gelu

    h = jnp.linspace(-16.0, 16.0, 40001)
    np.testing.assert_allclose(np.asarray(_poly_gelu(h)),
                               np.asarray(jax.nn.gelu(h, approximate=False)),
                               atol=7e-4)


def test_fused_mlp_gradients(mlp_data):
    from jax.experimental.pallas import tpu as pltpu

    x, w1, b1, w2, b2 = mlp_data

    def loss_fused(x, w1, b1, w2, b2):
        return jnp.sum(fused_mlp(x, w1, b1, w2, b2, 64) ** 2)

    def loss_ref(x, w1, b1, w2, b2):
        return jnp.sum(_reference_mlp(x, w1, b1, w2, b2, 64) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   rtol=1e-3)
    # masked trailing columns receive zero weight grads
    assert np.all(np.asarray(g_f[1])[:, 64:] == 0)


def test_fused_mlp_vmap(mlp_data):
    from jax.experimental.pallas import tpu as pltpu

    x, w1, b1, w2, b2 = mlp_data
    P = 3
    stack = lambda a: jnp.stack([a] * P)  # noqa: E731
    act = jnp.asarray([96, 64, 32])
    with pltpu.force_tpu_interpret_mode():
        out = jax.vmap(fused_mlp)(stack(x), stack(w1), stack(b1), stack(w2),
                                  stack(b2), act)
    for i, a in enumerate([96, 64, 32]):
        ref = _reference_mlp(x, w1, b1, w2, b2, a)
        np.testing.assert_allclose(np.asarray(out[i]), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)
