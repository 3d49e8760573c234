"""Import original Google ViT (JAX) npz checkpoints into the 3D model.

Capability-equivalent to the reference's `load_from` machinery
(`models/modeling.py:41-45,199-234,291-344` — `np2th`, `Block.load_from`,
`VisionTransformer.load_from`).  The reference never invokes it from any
driver (all models train from scratch with zero_head=True), but it is part
of the API surface: given the `vision_transformer` repo's npz weight files,
populate the model, with

  * per-block q/k/v/out kernels reshaped from (D, H, hd) JAX layout;
  * zero_head semantics (head zeroed instead of loaded);
  * position-embedding grid resampling when token counts differ
    (bilinear zoom over the 2D patch grid, `modeling.py:306-329`), with
    the CLS token handled per the 'token' classifier.

Since our model is itself a JAX model, kernels keep their native (in, out)
layout — no transposes are needed (the reference had to convert JAX->torch;
we only reshape and stack the per-block leading axis).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from vit3d_ensemble_tpu.configs import ViTConfig

ATTENTION_Q = "MultiHeadDotProductAttention_1/query"
ATTENTION_K = "MultiHeadDotProductAttention_1/key"
ATTENTION_V = "MultiHeadDotProductAttention_1/value"
ATTENTION_OUT = "MultiHeadDotProductAttention_1/out"
FC_0 = "MlpBlock_3/Dense_0"
FC_1 = "MlpBlock_3/Dense_1"
ATTENTION_NORM = "LayerNorm_0"
MLP_NORM = "LayerNorm_2"


def resample_posemb(posemb: np.ndarray, ntok_new: int,
                    has_cls: bool = True) -> np.ndarray:
    """Bilinear re-grid of a (1, T, D) position embedding to ntok_new tokens
    (`modeling.py:311-329`)."""
    from scipy import ndimage

    if posemb.shape[1] == ntok_new:
        return posemb
    if has_cls:
        tok, grid = posemb[:, :1], posemb[0, 1:]
        ntok_grid = ntok_new - 1
    else:
        tok, grid = posemb[:, :0], posemb[0]
        ntok_grid = ntok_new
    gs_old = int(np.sqrt(len(grid)))
    gs_new = int(np.sqrt(ntok_grid))
    grid = grid.reshape(gs_old, gs_old, -1)
    zoom = (gs_new / gs_old, gs_new / gs_old, 1)
    grid = ndimage.zoom(grid, zoom, order=1)
    grid = grid.reshape(1, gs_new * gs_new, -1)
    return np.concatenate([tok, grid], axis=1)


def load_from_npz(weights: Mapping[str, np.ndarray], config: ViTConfig,
                  zero_head: bool = True) -> Dict[str, Any]:
    """Build our param tree from a Google-ViT npz weight mapping.

    The 2D (ps, ps, C, D) patch kernel is inflated to our (ps, ps, kz, C, D)
    3D kernel by placing it at the central z-slice (zeros elsewhere) so the
    initial response matches the 2D model applied to the center slice.
    """
    D, H = config.hidden_size, config.num_heads
    hd = D // H
    L = config.num_layers
    g = lambda k: np.asarray(weights[k])  # noqa: E731

    def stack(fmt, convert=lambda a: a):
        return np.stack([convert(g(fmt.format(i))) for i in range(L)])

    qkv_kernel = lambda a: a.reshape(D, H, hd)          # noqa: E731
    qkv_bias = lambda a: a.reshape(H, hd)                # noqa: E731
    out_kernel = lambda a: a.reshape(D, D)               # noqa: E731

    root = "Transformer/encoderblock_{}"
    layers = {
        "attention_norm": {
            "scale": stack(f"{root}/{ATTENTION_NORM}/scale"),
            "bias": stack(f"{root}/{ATTENTION_NORM}/bias"),
        },
        "ffn_norm": {
            "scale": stack(f"{root}/{MLP_NORM}/scale"),
            "bias": stack(f"{root}/{MLP_NORM}/bias"),
        },
        "attn": {
            "query": {"kernel": stack(f"{root}/{ATTENTION_Q}/kernel",
                                      qkv_kernel),
                      "bias": stack(f"{root}/{ATTENTION_Q}/bias", qkv_bias)},
            "key": {"kernel": stack(f"{root}/{ATTENTION_K}/kernel",
                                    qkv_kernel),
                    "bias": stack(f"{root}/{ATTENTION_K}/bias", qkv_bias)},
            "value": {"kernel": stack(f"{root}/{ATTENTION_V}/kernel",
                                      qkv_kernel),
                      "bias": stack(f"{root}/{ATTENTION_V}/bias", qkv_bias)},
            "out": {"kernel": stack(f"{root}/{ATTENTION_OUT}/kernel",
                                    out_kernel),
                    "bias": stack(f"{root}/{ATTENTION_OUT}/bias")},
        },
        "ffn": {
            "fc1": {"kernel": stack(f"{root}/{FC_0}/kernel"),
                    "bias": stack(f"{root}/{FC_0}/bias")},
            "fc2": {"kernel": stack(f"{root}/{FC_1}/kernel"),
                    "bias": stack(f"{root}/{FC_1}/bias")},
        },
    }

    emb_kernel_2d = g("embedding/kernel")          # (ps, ps, C, D)
    kh, kw, kz = config.patch_size
    kernel_3d = np.zeros((kh, kw, kz, emb_kernel_2d.shape[2], D),
                         emb_kernel_2d.dtype)
    kernel_3d[:, :, kz // 2] = emb_kernel_2d

    posemb = resample_posemb(g("Transformer/posembed_input/pos_embedding"),
                             config.seq_len,
                             has_cls=(config.classifier == "token"))

    if zero_head:
        head = {"kernel": np.zeros((D, config.num_classes), np.float32),
                "bias": np.zeros((config.num_classes,), np.float32)}
    else:
        head = {"kernel": g("head/kernel").reshape(D, config.num_classes),
                "bias": g("head/bias").reshape(config.num_classes)}

    return {
        "embeddings": {
            "patch_embeddings": {"kernel": kernel_3d,
                                 "bias": g("embedding/bias")},
            "cls_token": g("cls"),
            "position_embeddings": posemb,
        },
        "encoder": {
            "layers": {"block": layers},
            "encoder_norm": {
                "scale": g("Transformer/encoder_norm/scale"),
                "bias": g("Transformer/encoder_norm/bias"),
            },
        },
        "head": head,
    }
