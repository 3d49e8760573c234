"""Stretch-goal regime tests: volumetric z-patching beyond the 5-slice case."""

import numpy as np

import jax
import jax.numpy as jnp

from vit3d_ensemble_tpu.configs import ViTConfig, vit_b16_128cubed
from vit3d_ensemble_tpu.models import VisionTransformer3D


def test_vit_b16_128cubed_config():
    cfg = vit_b16_128cubed()
    assert cfg.grid_shape == (8, 8, 8)
    assert cfg.n_patches == 512
    assert cfg.seq_len == 513
    assert cfg.head_dim == 64


def test_volumetric_z_patching_forward(rng):
    """A scaled-down 128^3-shaped config: 32^3 volume, (16,16,16) patches
    -> 2*2*2 = 8 tokens + CLS; exercises true 3D z-tiling (the reference
    hard-codes z=5 with a z-stride covering the whole depth)."""
    cfg = ViTConfig(patch_size=(16, 16, 16), hidden_size=32, num_heads=4,
                    mlp_dim=64, num_layers=2, img_size=32, z_size=32)
    assert cfg.n_patches == 8
    model = VisionTransformer3D(cfg, zero_head=False, vis=True)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 32, 1)).astype(np.float32))
    variables = jax.jit(
        lambda: model.init({"params": jax.random.key(0)}, x))()
    out = model.apply(variables, x, deterministic=True)
    assert out.logits.shape == (2, 1)
    assert out.attn_weights.shape == (2, 2, 4, 9, 9)
    assert out.tokens.shape == (2, 9, 32)
    assert np.all(np.isfinite(np.asarray(out.logits)))

    # patchify-as-matmul equals the strided conv on the 3D z case
    from vit3d_ensemble_tpu.models.vit3d import PatchEmbed

    pe_params = variables["params"]["embeddings"]["patch_embeddings"]
    kernel, bias = pe_params["kernel"], pe_params["bias"]
    ref = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(16, 16, 16), padding="VALID",
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC")).reshape(2, 8, 32) + bias
    got = PatchEmbed(cfg).apply({"params": pe_params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_qkv_fused_and_unfused_paths_agree(rng, monkeypatch):
    """The width-conditional QKV formulation (fused (D,3D) matmul at D<=64,
    separate projections above — models/vit3d._FUSED_QKV_MAX_D) is a pure
    performance choice: both paths must produce identical logits from the
    same parameters."""
    import vit3d_ensemble_tpu.models.vit3d as vit3d_mod

    cfg = ViTConfig(patch_size=(16, 16, 5), hidden_size=32, num_heads=4,
                    mlp_dim=64, num_layers=2, img_size=32)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 5, 1)).astype(np.float32))

    model = VisionTransformer3D(cfg, zero_head=False, vis=False)
    params = model.init({"params": jax.random.key(3)}, x)["params"]
    fused = model.apply({"params": params}, x, deterministic=True).logits

    monkeypatch.setattr(vit3d_mod, "_FUSED_QKV_MAX_D", 0)
    model2 = VisionTransformer3D(cfg, zero_head=False, vis=False)
    unfused = model2.apply({"params": params}, x, deterministic=True).logits
    np.testing.assert_allclose(np.asarray(unfused), np.asarray(fused),
                               atol=1e-5, rtol=1e-5)
