"""3D Vision Transformer, TPU-native Flax implementation.

Capability-equivalent to the reference's `models/modeling.py:55-344`
(Attention / Mlp / Embeddings / Block / Encoder / VisionTransformer), with a
TPU-first structure instead of a torch translation:

  * Native layout is channels-last (B, H, W, Z, C) — XLA:TPU's preferred conv
    layout (the reference uses torch's (B, C, H, W, Z), `create_dataset.py:80`).
  * The encoder is a single `nn.scan` over stacked per-layer parameters
    instead of a Python list of L modules (`modeling.py:237-254`): one
    compiled matmul chain regardless of depth, and the per-layer parameter
    stack gives the sweep engine a leading axis to vmap/shard over.
  * Depth and MLP width are *runtime capacities*: `num_layers_active` masks
    trailing scan steps to exact identity and `mlp_active` masks trailing FFN
    columns to exact zero.  This lets every config that shares
    (hidden_size, num_heads) run in ONE compiled program — the 18-config
    README grid becomes 3 programs x vmap(6) (SURVEY.md §7 step 4).
  * Attention math lives in `ops.attention` so the fused Pallas kernel can be
    swapped in without touching the module.

Math contract (verified against the reference by logit-parity tests):
  pre-LN blocks, LN eps 1e-6, GELU MLP, learned (1, 65, D) pos-emb, CLS token,
  Conv3D patchify kernel=stride=(16,16,5), head = Linear(D, 1) on CLS
  (`modeling.py:127-175,178-197,269-288`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vit3d_ensemble_tpu.configs import ViTConfig
from vit3d_ensemble_tpu.ops.attention import dot_product_attention

# ---------------------------------------------------------------------------
# Initializers matching torch semantics (for training-distribution parity).
# ---------------------------------------------------------------------------


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch.nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)).

    flax Dense kernels are (fan_in, fan_out).
    """
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_init(fan_in: int):
    bound = 1.0 / float(fan_in) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """torch.nn.Conv3d default init; flax conv kernels are (*k, in, out)."""
    receptive = 1
    for s in shape[:-2]:
        receptive *= s
    fan_in = shape[-2] * receptive
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def mlp_bias_init(key, shape, dtype=jnp.float32):
    """Reference Mlp bias init: normal(std=1e-6) (`modeling.py:115-116`)."""
    return jax.random.normal(key, shape, dtype) * 1e-6


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ViTOutput:
    """Forward results, mirroring the reference's no-label return triple
    (`modeling.py:287-288`): logits, per-layer attention maps, encoded tokens.
    """

    logits: jax.Array                    # (B, num_classes)
    attn_weights: Optional[jax.Array]    # (L, B, heads, T, T) or None
    tokens: jax.Array                    # (B, T, D) post final LayerNorm


class _ProjParams(nn.Module):
    """QKV projection parameters in the DenseGeneral (D, H, hd)/(H, hd)
    layout, addressable without applying — the three projections fuse into
    ONE (D, 3D) matmul at apply time (bit-exact: each output element's dot
    product is unchanged), which matters at D ≤ 64 where the MXU charges a
    full N-tile per matmul regardless of width."""

    features: tuple
    in_features: int
    kernel_init: object
    bias_init: object

    def setup(self):
        self.kernel = self.param("kernel", self.kernel_init,
                                 (self.in_features,) + tuple(self.features))
        self.bias = self.param("bias", self.bias_init,
                               tuple(self.features))


#: Widths at or below this use the fused (D, 3D) QKV matmul (MXU N-tile
#: pricing makes it ~free at the reference's D in {16,32,64}); above it the
#: three projections stay separate (the runtime concat only adds HBM
#: traffic once D fills the MXU — measured at D=768, docs/RESULTS.md).
_FUSED_QKV_MAX_D = 64


class Attention(nn.Module):
    """Multi-head self-attention (`modeling.py:55-99`)."""

    config: ViTConfig

    @nn.compact
    def __call__(self, x, *, deterministic: bool, return_probs: bool):
        cfg = self.config
        D, H = cfg.hidden_size, cfg.num_heads
        head_dim = D // H
        proj = lambda name: _ProjParams(  # noqa: E731
            (H, head_dim), D, torch_linear_kernel_init,
            torch_linear_bias_init(D), name=name)
        q_p, k_p, v_p = proj("query"), proj("key"), proj("value")
        out_p = _DenseParams(D, D, torch_linear_kernel_init,
                             torch_linear_bias_init(D), name="out")
        drop_rate = cfg.attention_dropout_rate

        from vit3d_ensemble_tpu.ops.attention import (
            get_default_attention_impl,
        )

        if (get_default_attention_impl() == "layer" and not return_probs
                and (deterministic or drop_rate == 0.0)):
            # whole-sublayer fused kernel: QKV proj -> per-head softmax
            # attention -> out proj in one VMEM residency
            # (`ops/pallas_attention_layer.py`), with a recompute-through-
            # XLA VJP so training may take it too.  Gate: probs-free (vis
            # falls back) and attention dropout inactive — at drop_rate 0
            # (every reference config, tools.py:93) neither this module
            # nor its nn.Dropout draws an rng, so the kernel path
            # consumes the identical dropout stream as the einsum path.
            from vit3d_ensemble_tpu.ops.pallas_attention_layer import (
                fused_attention_layer,
            )

            wqkv = jnp.concatenate(
                [p.kernel.reshape(D, D) for p in (q_p, k_p, v_p)], axis=1)
            bqkv = jnp.concatenate(
                [p.bias.reshape(D) for p in (q_p, k_p, v_p)])
            out = fused_attention_layer(x, wqkv, bqkv, out_p.kernel,
                                        out_p.bias, H)
            return out, None

        from vit3d_ensemble_tpu.ops.quant import get_default_quant_impl

        # int8 projections (inference lever, `ops/quant.py`): Q/K/V and
        # the out proj carry ~4x the attention math's FLOPs at the
        # stretch shapes; the softmax path below stays ambient-dtype.
        # Strictly `deterministic`: attn dropout is 0.0 in every reference
        # config, so gating on drop_rate would route TRAINING forwards
        # through int8 (approximate numerics, round() kills gradients).
        use_int8 = (get_default_quant_impl() in ("int8", "int8_attn")
                    and deterministic)

        B, T = x.shape[0], x.shape[1]
        if D <= _FUSED_QKV_MAX_D:
            # Fused QKV: one (D, 3D) matmul.  At the reference's tiny
            # widths (D in {16,32,64}) the MXU prices an N=16..64 output
            # tile the same as N=128, so fusing the three projections is
            # ~free FLOPs — measured +1.5% headline (docs/RESULTS.md).
            qkv_kernel = jnp.concatenate(
                [p.kernel.reshape(D, D) for p in (q_p, k_p, v_p)], axis=1)
            qkv_bias = jnp.concatenate(
                [p.bias.reshape(D) for p in (q_p, k_p, v_p)])
            if use_int8:
                from vit3d_ensemble_tpu.ops.quant import int8_dense

                qkv = int8_dense(x, qkv_kernel, qkv_bias)    # (B, T, 3D)
            else:
                qkv = x @ qkv_kernel + qkv_bias              # (B, T, 3D)
            # (B, T, 3, H, hd) -> (3, B, H, T, hd)
            qkv = qkv.reshape(B, T, 3, H, head_dim).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
        else:
            # At large D the N-tile pricing argument vanishes (D >= 128
            # already fills the MXU) and the runtime concatenate only adds
            # 6*D^2 bytes of HBM traffic per layer — a measured ~6%
            # regression on the D=768 stretch model (735 -> 691 vol/s,
            # round 2).  Keep the three projections separate.
            def apply_proj(p):
                if use_int8:
                    from vit3d_ensemble_tpu.ops.quant import int8_dense

                    y = int8_dense(x, p.kernel.reshape(D, D),
                                   p.bias.reshape(D))
                else:
                    y = x @ p.kernel.reshape(D, D) + p.bias.reshape(D)
                return y.reshape(B, T, H, head_dim).transpose(0, 2, 1, 3)

            q, k, v = apply_proj(q_p), apply_proj(k_p), apply_proj(v_p)

        rng = None
        if drop_rate > 0.0 and not deterministic:
            rng = self.make_rng("dropout")
        context, probs = dot_product_attention(
            q, k, v,
            dropout_rng=rng,
            dropout_rate=drop_rate,
            deterministic=deterministic,
            return_probs=return_probs,
        )
        context = context.transpose(0, 2, 1, 3).reshape(x.shape[:-1] + (D,))
        if use_int8:
            from vit3d_ensemble_tpu.ops.quant import int8_dense

            out = int8_dense(context, out_p.kernel, out_p.bias)
        else:
            out = out_p(context)
        out = nn.Dropout(rate=drop_rate)(out, deterministic=deterministic)
        return out, probs


class _DenseParams(nn.Module):
    """A Dense layer whose parameters are addressable without running the
    matmul — lets the fused-MLP path consume fc1/fc2 weights directly while
    keeping the standard `ffn/fc{1,2}/{kernel,bias}` parameter tree."""

    features: int
    in_features: int
    kernel_init: object
    bias_init: object

    def setup(self):
        self.kernel = self.param("kernel", self.kernel_init,
                                 (self.in_features, self.features))
        self.bias = self.param("bias", self.bias_init, (self.features,))

    def __call__(self, x):
        return x @ self.kernel + self.bias


class Mlp(nn.Module):
    """GELU MLP with the reference's extreme d >> D widths (`modeling.py:102-124`).

    `mlp_active` masks trailing hidden columns to exact zero so one compiled
    width (max over the sweep) serves every config: gelu(0)*0-masked columns
    contribute nothing to fc2 and receive zero gradient.

    Inference dispatch: when dropout is inactive and the process default MLP
    impl is 'pallas' (`ops.set_default_mlp_impl`), the whole fc1->GELU->fc2
    chain runs as one fused VMEM-resident kernel (`ops/pallas_mlp.py`) —
    ~3x the XLA path at reference widths, since the (tokens, 3072)
    intermediate never touches HBM.  Training keeps the XLA path because
    the reference applies dropout BETWEEN GELU and fc2 (`modeling.py:121`).
    """

    config: ViTConfig

    @nn.compact
    def __call__(self, x, *, deterministic: bool,
                 mlp_active: Optional[jax.Array] = None):
        cfg = self.config
        fc1 = _DenseParams(cfg.mlp_dim, cfg.hidden_size,
                           nn.initializers.xavier_uniform(), mlp_bias_init,
                           name="fc1")
        fc2 = _DenseParams(cfg.hidden_size, cfg.mlp_dim,
                           nn.initializers.xavier_uniform(), mlp_bias_init,
                           name="fc2")

        from vit3d_ensemble_tpu.ops.mlp import get_default_mlp_impl
        from vit3d_ensemble_tpu.ops.quant import get_default_quant_impl

        dropout_off = deterministic or cfg.dropout_rate == 0.0
        if (get_default_quant_impl() == "int8" and deterministic
                and mlp_active is None):
            # int8 W8A8 fc1/fc2 (`ops/quant.py`) — takes precedence over
            # the fused kernel when selected; masked-width sweeps keep
            # the exact paths (quant is a serving-path lever).
            from vit3d_ensemble_tpu.ops.quant import int8_dense

            h = int8_dense(x, fc1.kernel, fc1.bias)
            h = nn.gelu(h, approximate=False)
            return int8_dense(h, fc2.kernel, fc2.bias)

        use_fused = get_default_mlp_impl() == "pallas" and dropout_off
        if use_fused:
            from vit3d_ensemble_tpu.ops.pallas_mlp import fused_mlp

            active = (mlp_active if mlp_active is not None
                      else jnp.int32(cfg.mlp_dim))
            return fused_mlp(x, fc1.kernel, fc1.bias, fc2.kernel, fc2.bias,
                             active)

        h = fc1(x)
        h = nn.gelu(h, approximate=False)  # torch F.gelu default is exact erf
        if mlp_active is not None:
            col = jnp.arange(cfg.mlp_dim)
            h = h * (col < mlp_active).astype(h.dtype)
        h = nn.Dropout(rate=cfg.dropout_rate)(h, deterministic=deterministic)
        h = fc2(h)
        h = nn.Dropout(rate=cfg.dropout_rate)(h, deterministic=deterministic)
        return h


class PatchEmbed(nn.Module):
    """Stride==kernel Conv3D patchify, computed as reshape + one MXU matmul.

    A conv with kernel==stride is exactly a block reshape followed by a
    (n_patches, kh*kw*kz*C) @ (kh*kw*kz*C, D) matmul.  XLA:TPU lowers the
    1-input-channel Conv3D badly (especially under vmap over stacked model
    params); the matmul form is the native MXU path AND batches cleanly in
    the multi-model sweep.  Parameters keep the conv kernel layout
    (kh, kw, kz, C_in, D) so torch/parity checkpoints map unchanged.
    """

    config: ViTConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        kh, kw, kz = cfg.patch_size
        B, H, W, Z, C = x.shape
        fan_in = kh * kw * kz * C
        kernel = self.param("kernel", torch_conv_kernel_init,
                            (kh, kw, kz, C, cfg.hidden_size))
        bias = self.param("bias", torch_linear_bias_init(fan_in),
                          (cfg.hidden_size,))
        if H % kh == 0 and W % kw == 0 and Z % kz == 0:
            gh, gw, gz = H // kh, W // kw, Z // kz
            # (B, gh, kh, gw, kw, gz, kz, C) -> (B, gh, gw, gz, kh, kw, kz, C)
            patches = x.reshape(B, gh, kh, gw, kw, gz, kz, C)
            patches = patches.transpose(0, 1, 3, 5, 2, 4, 6, 7)
            patches = patches.reshape(B, gh * gw * gz, fan_in)
            return patches @ kernel.reshape(fan_in, cfg.hidden_size) + bias
        # general fallback: plain strided conv
        out = jax.lax.conv_general_dilated(
            x, kernel, window_strides=cfg.patch_size, padding="VALID",
            dimension_numbers=("NHWDC", "HWDIO", "NHWDC"))
        return out.reshape(B, -1, cfg.hidden_size) + bias


class Embeddings(nn.Module):
    """Conv3D patchify + CLS + learned position embeddings (`modeling.py:127-175`).

    Input: (B, H, W, Z, C) channels-last.  128x128x5 / (16,16,5) -> 8*8*1 = 64
    patches; flatten order (h-major, then w, then z) matches torch
    `flatten(2)` on (B, D, 8, 8, 1).
    """

    config: ViTConfig

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        cfg = self.config
        B = x.shape[0]
        if cfg.hybrid_grid is not None:
            from vit3d_ensemble_tpu.models.resnet_hybrid import (
                HybridBackbone3D,
            )

            x = HybridBackbone3D(cfg.resnet_block_units,
                                 cfg.resnet_width_factor,
                                 name="hybrid_model")(x)
            gh, gw = cfg.hybrid_grid
            patch = (max(1, x.shape[1] // gh), max(1, x.shape[2] // gw), 1)
            hybrid_cfg = dataclasses.replace(
                cfg, patch_size=patch, in_channels=x.shape[-1],
                img_size=x.shape[1], z_size=x.shape[3])
            x = PatchEmbed(hybrid_cfg, name="patch_embeddings")(x)
        else:
            x = PatchEmbed(cfg, name="patch_embeddings")(x)   # (B, 64, D)

        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, cfg.hidden_size)
        )
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, cfg.hidden_size)), x],
                            axis=1)
        pos = self.param(
            "position_embeddings",
            nn.initializers.zeros,
            (1, x.shape[1], cfg.hidden_size),   # == cfg.seq_len when pure
        )
        x = x + pos
        x = nn.Dropout(rate=cfg.dropout_rate)(x, deterministic=deterministic)
        return x


class Block(nn.Module):
    """Pre-LN residual block (`modeling.py:178-197`), with an optional
    `layer_gate` in {0,1} that turns the block into an exact identity —
    the depth-padding mechanism for the vmapped sweep.
    """

    config: ViTConfig

    @nn.compact
    def __call__(self, x, *, deterministic: bool, return_probs: bool,
                 layer_gate: Optional[jax.Array] = None,
                 mlp_active: Optional[jax.Array] = None):
        cfg = self.config
        h = nn.LayerNorm(epsilon=1e-6, use_fast_variance=False, name="attention_norm")(x)
        h, probs = Attention(cfg, name="attn")(
            h, deterministic=deterministic, return_probs=return_probs
        )
        if layer_gate is not None:
            h = h * layer_gate.astype(h.dtype)
        x = x + h

        h = nn.LayerNorm(epsilon=1e-6, use_fast_variance=False, name="ffn_norm")(x)
        h = Mlp(cfg, name="ffn")(
            h, deterministic=deterministic, mlp_active=mlp_active
        )
        if layer_gate is not None:
            h = h * layer_gate.astype(h.dtype)
        x = x + h
        return x, probs


class Encoder(nn.Module):
    """Scan-stacked encoder (`modeling.py:237-254`): parameters carry a
    leading layer axis of size config.num_layers (the compiled maximum);
    `num_layers_active` gates trailing layers to identity at runtime.
    """

    config: ViTConfig
    #: Rematerialize each block's activations in the backward pass
    #: (`jax.checkpoint`).  Numerics-identical; trades ~1/3 more FLOPs for
    #: NOT streaming every layer's (tokens, mlp_dim) intermediates through
    #: HBM between forward and backward — at the reference widths (3072-
    #: wide FFN, 65 tokens, batch 4) those saved residuals are the
    #: training step's dominant memory AND bandwidth cost, so the vmapped
    #: sweeps turn this on.
    remat: bool = False

    @nn.compact
    def __call__(self, x, *, deterministic: bool, return_probs: bool,
                 num_layers_active: Optional[jax.Array] = None,
                 mlp_active: Optional[jax.Array] = None):
        cfg = self.config

        class ScanBlock(nn.Module):
            config: ViTConfig

            @nn.compact
            def __call__(self, carry, layer_idx):
                gate = None
                if num_layers_active is not None:
                    gate = (layer_idx < num_layers_active)
                out, probs = Block(self.config, name="block")(
                    carry,
                    deterministic=deterministic,
                    return_probs=return_probs,
                    layer_gate=gate,
                    mlp_active=mlp_active,
                )
                return out, probs

        block_cls = (nn.remat(ScanBlock, prevent_cse=False)
                     if self.remat else ScanBlock)
        scanned = nn.scan(
            block_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=cfg.num_layers,
        )(cfg, name="layers")
        x, probs = scanned(x, jnp.arange(cfg.num_layers))
        x = nn.LayerNorm(epsilon=1e-6, use_fast_variance=False, name="encoder_norm")(x)
        return x, probs


class VisionTransformer3D(nn.Module):
    """Full baseline model (`modeling.py:269-344`).

    `zero_head=True` (zeroed classification head) is the reference trainers'
    universal setting (`train_baseline_cv.py:57`).
    """

    config: ViTConfig
    zero_head: bool = True
    vis: bool = True
    remat: bool = False          # see Encoder.remat

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True,
                 num_layers_active: Optional[jax.Array] = None,
                 mlp_active: Optional[jax.Array] = None) -> ViTOutput:
        cfg = self.config
        x = Embeddings(cfg, name="embeddings")(x, deterministic=deterministic)
        tokens, probs = Encoder(cfg, name="encoder", remat=self.remat)(
            x,
            deterministic=deterministic,
            return_probs=self.vis,
            num_layers_active=num_layers_active,
            mlp_active=mlp_active,
        )
        head = nn.Dense(
            cfg.num_classes,
            kernel_init=(nn.initializers.zeros if self.zero_head
                         else torch_linear_kernel_init),
            bias_init=(nn.initializers.zeros if self.zero_head
                       else torch_linear_bias_init(cfg.hidden_size)),
            name="head",
        )
        logits = head(tokens[:, 0])
        return ViTOutput(logits=logits, attn_weights=probs, tokens=tokens)


def from_torch_layout(x: jax.Array) -> jax.Array:
    """(B, C, H, W, Z) torch layout -> (B, H, W, Z, C) native layout."""
    return jnp.transpose(x, (0, 2, 3, 4, 1))
