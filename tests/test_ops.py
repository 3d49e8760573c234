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


@pytest.mark.parametrize("B,T,D,H", [
    (3, 65, 64, 4),      # conf 1-3 class (hd 16)
    (2, 65, 32, 8),      # (32, 8) class (hd 4)
    (2, 65, 16, 16),     # (16, 16) class (hd 1)
    (2, 5, 32, 4),       # tiny sequence (32px test volumes)
])
def test_fused_attention_layer_matches_reference(B, T, D, H, rng):
    """The whole-sublayer kernel (QKV -> softmax -> out) vs the same math
    composed from the einsum path."""
    from jax.experimental.pallas import tpu as pltpu

    from vit3d_ensemble_tpu.ops.pallas_attention_layer import (
        fused_attention_layer,
    )

    h = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    wqkv = jnp.asarray(rng.normal(size=(D, 3 * D)).astype(np.float32)) * 0.3
    bqkv = jnp.asarray(rng.normal(size=(3 * D,)).astype(np.float32)) * 0.1
    wout = jnp.asarray(rng.normal(size=(D, D)).astype(np.float32)) * 0.3
    bout = jnp.asarray(rng.normal(size=(D,)).astype(np.float32)) * 0.1

    hd = D // H
    qkv = h @ wqkv + bqkv
    split = lambda a: a.reshape(B, T, H, hd).transpose(0, 2, 1, 3)  # noqa
    q, k, v = (split(qkv[..., i * D:(i + 1) * D]) for i in range(3))
    ctx, _ = dot_product_attention(q, k, v, impl="xla")
    ref = ctx.transpose(0, 2, 1, 3).reshape(B, T, D) @ wout + bout

    with pltpu.force_tpu_interpret_mode():
        out = fused_attention_layer(h, wqkv, bqkv, wout, bout, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


def test_attention_layer_impl_end_to_end(rng):
    """impl='layer' produces the einsum path's logits through the full
    model — deterministic AND training mode (attention dropout is 0.0, so
    the kernel path consumes the identical dropout stream); the vis path
    degrades to the einsum formulation rather than the kernel."""
    from jax.experimental.pallas import tpu as pltpu

    from vit3d_ensemble_tpu.configs import ViTConfig
    from vit3d_ensemble_tpu.models import VisionTransformer3D
    from vit3d_ensemble_tpu.ops import attention as att

    cfg = ViTConfig(patch_size=(16, 16, 5), hidden_size=32, num_heads=8,
                    mlp_dim=64, num_layers=2, img_size=32)
    model = VisionTransformer3D(cfg, zero_head=False, vis=False)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 5, 1)).astype(np.float32))
    params = model.init({"params": jax.random.key(5)}, x)["params"]
    ref = model.apply({"params": params}, x, deterministic=True).logits
    tr_ref = model.apply({"params": params}, x, deterministic=False,
                         rngs={"dropout": jax.random.key(0)}).logits

    att.set_default_attention_impl("layer")
    try:
        with pltpu.force_tpu_interpret_mode():
            got = model.apply({"params": params}, x,
                              deterministic=True).logits
            tr = model.apply({"params": params}, x, deterministic=False,
                             rngs={"dropout": jax.random.key(0)}).logits
        # vis mode (probs requested) must not take the kernel
        vmodel = VisionTransformer3D(cfg, zero_head=False, vis=True)
        vout = vmodel.apply({"params": params}, x, deterministic=True)
        assert vout.attn_weights is not None
    finally:
        att.set_default_attention_impl("auto")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(tr), np.asarray(tr_ref),
                               atol=2e-5, rtol=1e-4)


def test_fused_attention_layer_gradients_match(rng):
    """The layer kernel's custom VJP (recompute-through-XLA) equals the
    einsum formulation's gradients for every input and weight."""
    from jax.experimental.pallas import tpu as pltpu

    from vit3d_ensemble_tpu.ops.pallas_attention_layer import (
        _reference_attention_layer,
        fused_attention_layer,
    )

    B, T, D, H = 2, 65, 32, 8
    h = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    wqkv = jnp.asarray(rng.normal(size=(D, 3 * D)).astype(np.float32)) * .3
    bqkv = jnp.asarray(rng.normal(size=(3 * D,)).astype(np.float32)) * .1
    wout = jnp.asarray(rng.normal(size=(D, D)).astype(np.float32)) * .3
    bout = jnp.asarray(rng.normal(size=(D,)).astype(np.float32)) * .1

    # compare the VJPs under one FIXED cotangent (a squared-loss grad
    # check would amplify the kernel's ~2e-6 forward float difference
    # through the cotangent and swamp the tolerance)
    g = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        _, vjp_k = jax.vjp(lambda *a: fused_attention_layer(*a, H),
                           h, wqkv, bqkv, wout, bout)
        g_kernel = vjp_k(g)
    _, vjp_r = jax.vjp(lambda *a: _reference_attention_layer(*a, H),
                       h, wqkv, bqkv, wout, bout)
    g_ref = vjp_r(g)
    for a, b in zip(g_kernel, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-4)


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


@pytest.mark.parametrize("shape", [
    (2, 4, 65, 16),     # conf-1 regime (B, H, S, hd)
    (3, 8, 65, 4),      # (32, 8) shape class
    (1, 16, 65, 1),     # (16, 16) — head_dim 1
])
def test_vpu_attention_matches_einsum(shape, rng):
    """The broadcast-multiply-reduce (VPU) formulation is the same math as
    the einsum path — identical contraction, different execution unit."""
    q = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    k = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    v = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    ref, pref = dot_product_attention(q, k, v, impl="xla",
                                      return_probs=True)
    out, pout = dot_product_attention(q, k, v, impl="vpu",
                                      return_probs=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pout), np.asarray(pref),
                               atol=2e-6, rtol=1e-5)


def test_vpu_attention_gradients_match(rng):
    shape = (2, 4, 9, 8)
    q = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    k = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    v = jnp.asarray(rng.normal(size=shape).astype(np.float32))

    def loss(impl):
        def f(q, k, v):
            out, _ = dot_product_attention(q, k, v, impl=impl)
            return jnp.sum(out ** 2)
        return f

    g_vpu = jax.grad(loss("vpu"), argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss("xla"), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_vpu, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)


def test_vpu_attention_dropout_matches_einsum(rng):
    """Same dropout mask stream -> identical dropped probs on both paths."""
    shape = (2, 4, 9, 8)
    q = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    key = jax.random.key(7)
    outs = [dot_product_attention(q, q, q, impl=i, dropout_rng=key,
                                  dropout_rate=0.25, deterministic=False)[0]
            for i in ("xla", "vpu")]
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(outs[1]),
                               atol=2e-6, rtol=1e-5)


def test_dispatch_impl_flag(rng):
    from vit3d_ensemble_tpu.ops import attention as att

    q = jnp.asarray(rng.normal(size=(1, 2, 5, 8)).astype(np.float32))
    ctx_xla, probs = att.dot_product_attention(q, q, q, impl="xla",
                                               return_probs=True)
    assert probs is not None and probs.shape == (1, 2, 5, 5)
    # 'auto' resolves to the einsum (xla) path at every head_dim — the
    # measured default (ops/attention.py:115-124) — so results match exactly
    ctx_auto, _ = att.dot_product_attention(q, q, q, impl="auto")
    np.testing.assert_allclose(np.asarray(ctx_auto), np.asarray(ctx_xla),
                               atol=2e-6, rtol=1e-5)
    att.set_default_attention_impl("auto")
    with pytest.raises(ValueError):
        att.set_default_attention_impl("bogus")
