"""Int8 (W8A8) inference path: op accuracy + model-level logit deviation.

The perf claims live in benchmarks/int8_ab.py (TPU); these tests pin the
numerics contract on CPU: the int8 path is a controlled approximation of
the exact forward, not a different model.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit3d_ensemble_tpu.ops.quant import (
    get_default_quant_impl,
    int8_dense,
    set_default_quant_impl,
)


@pytest.fixture
def quant_reset():
    yield
    set_default_quant_impl("none")


def test_selector_validates(quant_reset):
    set_default_quant_impl("int8")
    assert get_default_quant_impl() == "int8"
    with pytest.raises(ValueError):
        set_default_quant_impl("int4")


def test_int8_dense_matches_exact():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(6, 65, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(64, 192)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.normal(size=(192,)).astype(np.float32) * 0.01)
    exact = x @ w + b
    quant = int8_dense(x, w, b)
    # per-token/per-column symmetric int8: worst-case elementwise error is
    # bounded by the quantization steps; empirically ~0.3% relative here
    rel = float(jnp.max(jnp.abs(quant - exact))
                / jnp.max(jnp.abs(exact)))
    assert rel < 0.02, rel


def test_int8_dense_zero_rows_finite():
    x = jnp.zeros((4, 8), jnp.float32)
    w = jnp.zeros((8, 16), jnp.float32)
    y = int8_dense(x, w)
    assert np.isfinite(np.asarray(y)).all()
    np.testing.assert_array_equal(np.asarray(y), 0.0)


@pytest.mark.parametrize("conf", [1, 9])
def test_model_logits_deviation_bounded(conf, quant_reset):
    """Full-model forward with VIT3D_QUANT int8 vs exact: logits deviate
    by a small, bounded amount (the serving-path accuracy contract)."""
    from vit3d_ensemble_tpu.configs import ViTConfig
    from vit3d_ensemble_tpu.models import VisionTransformer3D

    cfg = ViTConfig.from_conf(conf, img_size=32)
    model = VisionTransformer3D(cfg, zero_head=False, vis=False)
    rng = np.random.default_rng(conf)
    x = jnp.asarray(rng.normal(size=(8, 32, 32, 5, 1)).astype(np.float32))
    params = model.init({"params": jax.random.key(0)}, x[:1])["params"]

    exact = model.apply({"params": params}, x, deterministic=True).logits
    set_default_quant_impl("int8")
    quant = model.apply({"params": params}, x, deterministic=True).logits

    dev = float(jnp.max(jnp.abs(quant - exact)))
    assert np.isfinite(np.asarray(quant)).all()
    assert dev < 0.15, dev          # logits are O(1); int8 drift is small
    # and it is genuinely the int8 path, not a no-op
    assert dev > 0.0


def test_training_path_ignores_quant(quant_reset):
    """Dropout-active (training) forwards must NOT take the int8 path:
    quant is an inference lever."""
    from vit3d_ensemble_tpu.configs import ViTConfig
    from vit3d_ensemble_tpu.models import VisionTransformer3D

    cfg = ViTConfig.from_conf(9, img_size=32)
    model = VisionTransformer3D(cfg, zero_head=False, vis=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 32, 32, 5, 1)).astype(np.float32))
    params = model.init({"params": jax.random.key(0)}, x[:1])["params"]

    kw = dict(deterministic=False, rngs={"dropout": jax.random.key(7)})
    ref = model.apply({"params": params}, x, **kw).logits
    set_default_quant_impl("int8")
    got = model.apply({"params": params}, x, **kw).logits
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
