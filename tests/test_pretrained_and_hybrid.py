"""Tests: Google-ViT npz import (component 8) + ResNetV2 hybrid (component 10)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit3d_ensemble_tpu.configs import ViTConfig
from vit3d_ensemble_tpu.models import VisionTransformer3D
from vit3d_ensemble_tpu.pretrained import load_from_npz, resample_posemb


def _fake_vit_npz(L=2, D=16, H=4, mlp=32, ps=16, grid=3, rng=None):
    """A synthetic Google-ViT weight dict (2D, grid x grid patches)."""
    rng = rng or np.random.default_rng(0)
    n = lambda *s: rng.normal(size=s).astype(np.float32)  # noqa: E731
    w = {
        "embedding/kernel": n(ps, ps, 1, D),
        "embedding/bias": n(D),
        "cls": n(1, 1, D),
        "Transformer/posembed_input/pos_embedding": n(1, grid * grid + 1, D),
        "Transformer/encoder_norm/scale": n(D),
        "Transformer/encoder_norm/bias": n(D),
        "head/kernel": n(D, 1),
        "head/bias": n(1),
    }
    for i in range(L):
        r = f"Transformer/encoderblock_{i}"
        for name in ("query", "key", "value"):
            w[f"{r}/MultiHeadDotProductAttention_1/{name}/kernel"] = \
                n(D, H, D // H)
            w[f"{r}/MultiHeadDotProductAttention_1/{name}/bias"] = \
                n(H, D // H)
        w[f"{r}/MultiHeadDotProductAttention_1/out/kernel"] = n(H, D // H, D)
        w[f"{r}/MultiHeadDotProductAttention_1/out/bias"] = n(D)
        w[f"{r}/MlpBlock_3/Dense_0/kernel"] = n(D, mlp)
        w[f"{r}/MlpBlock_3/Dense_0/bias"] = n(mlp)
        w[f"{r}/MlpBlock_3/Dense_1/kernel"] = n(mlp, D)
        w[f"{r}/MlpBlock_3/Dense_1/bias"] = n(D)
        w[f"{r}/LayerNorm_0/scale"] = n(D)
        w[f"{r}/LayerNorm_0/bias"] = n(D)
        w[f"{r}/LayerNorm_2/scale"] = n(D)
        w[f"{r}/LayerNorm_2/bias"] = n(D)
    return w


def test_load_from_npz_shapes_and_forward():
    cfg = ViTConfig(patch_size=(16, 16, 5), hidden_size=16, num_heads=4,
                    mlp_dim=32, num_layers=2, img_size=32)
    weights = _fake_vit_npz()
    params = load_from_npz(weights, cfg, zero_head=True)
    model = VisionTransformer3D(cfg, zero_head=True, vis=False)
    x = jnp.asarray(np.random.default_rng(1)
                    .normal(size=(2, 32, 32, 5, 1)).astype(np.float32))
    out = model.apply({"params": jax.tree.map(jnp.asarray, params)}, x,
                      deterministic=True)
    assert out.logits.shape == (2, 1)
    assert np.all(np.asarray(out.logits) == 0)        # zero_head
    assert params["embeddings"]["position_embeddings"].shape == (1, 5, 16)
    # pos-emb was resampled 3x3 grid -> 2x2 grid (+ CLS)
    k3d = params["embeddings"]["patch_embeddings"]["kernel"]
    assert k3d.shape == (16, 16, 5, 1, 16)
    assert np.all(k3d[:, :, 0] == 0) and np.any(k3d[:, :, 2] != 0)


def test_resample_posemb_identity_and_zoom():
    p = np.random.default_rng(0).normal(size=(1, 10, 8)).astype(np.float32)
    np.testing.assert_array_equal(resample_posemb(p, 10), p)
    out = resample_posemb(p, 5)          # 3x3 grid -> 2x2 grid
    assert out.shape == (1, 5, 8)
    np.testing.assert_array_equal(out[:, 0], p[:, 0])   # CLS preserved


def test_hybrid_backbone_forward():
    from vit3d_ensemble_tpu.models.resnet_hybrid import ResNetV2

    model = ResNetV2(block_units=(1, 1, 1), width_factor=1)
    x = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(2, 64, 64, 1)).astype(np.float32))
    params = model.init({"params": jax.random.key(0)}, x)
    out = model.apply(params, x)
    # 64 -> /2 (root conv) -> /2 (pool) -> /2 -> /2 (stages 2, 3) = 4
    assert out.shape == (2, 4, 4, 1024)


def test_hybrid_vit_end_to_end():
    cfg = ViTConfig(patch_size=(16, 16, 5), hidden_size=16, num_heads=4,
                    mlp_dim=32, num_layers=1, img_size=64,
                    hybrid_grid=(2, 2), resnet_block_units=(1, 1, 1))
    model = VisionTransformer3D(cfg, zero_head=True, vis=False)
    x = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(1, 64, 64, 5, 1)).astype(np.float32))
    variables = jax.jit(
        lambda: model.init({"params": jax.random.key(0)}, x))()
    out = model.apply(variables, x, deterministic=True)
    assert out.logits.shape == (1, 1)
    assert "hybrid_model" in variables["params"]["embeddings"]
