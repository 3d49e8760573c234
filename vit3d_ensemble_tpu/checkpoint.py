"""Checkpointing: native save/restore, resume state, and torch-.bin import.

Capability-equivalent to the reference's checkpoint layer (SURVEY.md §2 row
24): the reference stores bare `torch.save(model.state_dict())` weight files
keyed by config/fold/boot (`train_baseline_cv.py:128-134`), with no optimizer
state and no resume.  This module keeps the same directory layouts and adds:

  * full train-state snapshots (params + optimizer + step + best-metric
    state) so multi-hour sweeps are resumable (SURVEY.md §5 failure
    detection / elastic recovery);
  * `load_torch_vit` / `load_torch_ensemble` — import the reference's .bin
    PyTorch checkpoints into the Flax parameter tree (the inverse of the
    reference's JAX->torch `load_from`, `models/modeling.py:291-344`),
    used by the logit-parity test suite.

Native format: msgpack via flax.serialization (single file per checkpoint,
np arrays only — no pickles).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from vit3d_ensemble_tpu.configs import ViTConfig

# ---------------------------------------------------------------------------
# Native save / restore
# ---------------------------------------------------------------------------


def save_pytree(path: str, tree: Any) -> None:
    """Atomic write (temp file + rename): checkpoint/snapshot writes must
    survive the very preemptions they exist to recover from — a truncated
    state file would make --resume crash instead of resuming."""
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tree = jax.device_get(tree)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(tree))
    os.replace(tmp, path)


def restore_pytree(path: str, target: Any) -> Any:
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


def baseline_ckpt_path(output_dir: str, kind: str, conf: int,
                       tag: str) -> str:
    """Reference checkpoint layouts (SURVEY.md §2 row 24), native extension.

    kind: 'baseline' | 'cv_baseline' | 'boot_baseline'
    tag:  e.g. 'conf5', 'cv1', 'boot17'
    """
    return os.path.join(output_dir, f"{kind}_models", f"conf{conf}",
                        f"{tag}.msgpack")


def ensemble_ckpt_path(output_dir: str, kind: str, name: str,
                       tag: str) -> str:
    """kind: 'cv_ensemble' | 'bootstrap_ensemble' | 'best_ensemble'."""
    return os.path.join(output_dir, f"{kind}_models", f"ensemble_{name}",
                        f"{tag}.msgpack")


def save_train_state(path: str, params: Any, opt_state: Any, step: int,
                     meta: Optional[Dict[str, Any]] = None) -> None:
    """Full-state snapshot (params + optimizer + step + run metadata).

    Net-new vs the reference (SURVEY.md §5 failure detection): reference
    checkpoints are weights-only with no resume
    (`train_baseline_cv.py:133`); these make multi-hour sweeps (816 combos
    x folds) resumable after preemption.
    """
    save_pytree(path, {
        "params": params,
        "opt_state": opt_state,
        "step": np.asarray(step, np.int64),
        "meta": dict(meta or {}),
    })


def restore_train_state(path: str, params_target: Any,
                        opt_state_target: Any):
    """Restore a `save_train_state` snapshot; targets supply the pytree
    structure (e.g. fresh init + tx.init)."""
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    params = serialization.from_state_dict(params_target, raw["params"])
    opt_state = serialization.from_state_dict(opt_state_target,
                                              raw["opt_state"])
    return params, opt_state, int(raw["step"]), raw.get("meta", {})


def load_baseline_params(path: str, config: ViTConfig) -> Any:
    """Restore a baseline ViT param tree saved by `save_pytree`.

    Accepts either our .msgpack checkpoints or reference .bin torch
    checkpoints (detected by extension), so reference-trained weights can
    seed ensembles directly.
    """
    if path.endswith(".bin"):
        return torch_vit_to_flax(load_torch_state_dict(path), config)
    import jax.numpy as jnp

    from vit3d_ensemble_tpu.models import VisionTransformer3D

    model = VisionTransformer3D(config, zero_head=True, vis=False)
    dummy = jnp.zeros((1, config.img_size, config.img_size, config.z_size,
                       config.in_channels))
    target = jax.eval_shape(
        lambda: model.init({"params": jax.random.key(0)}, dummy)["params"])
    target = jax.tree.map(lambda t: np.zeros(t.shape, t.dtype), target)
    return restore_pytree(path, target)


# ---------------------------------------------------------------------------
# torch state_dict -> flax params (parity import)
# ---------------------------------------------------------------------------


def _t(arr) -> np.ndarray:
    # copy=True matters: torch's .numpy() returns a VIEW of live tensor
    # storage, and jnp.asarray on the CPU backend can be zero-copy — an
    # imported param tree would silently track subsequent in-place torch
    # optimizer updates.
    return np.array(arr.detach().cpu().numpy() if hasattr(arr, "detach")
                    else arr, copy=True)


def torch_vit_to_flax(state: Mapping[str, Any], config: ViTConfig,
                      prefix: str = "") -> Dict[str, Any]:
    """Convert a reference VisionTransformer state_dict to our param tree.

    torch layouts (reference `models/modeling.py`):
      Linear.weight (out, in)        -> Dense kernel (in, out)
      Conv3d.weight (D, C, kh, kw, kz) -> Conv kernel (kh, kw, kz, C, D)
      encoder.layer.{i}.*            -> scan-stacked leading layer axis
    """
    D, H = config.hidden_size, config.num_heads
    hd = D // H
    L = config.num_layers
    g = lambda k: _t(state[prefix + k])  # noqa: E731

    def stack(fmt, convert):
        return np.stack([convert(g(fmt.format(i))) for i in range(L)])

    qkv_kernel = lambda w: w.T.reshape(D, H, hd)          # noqa: E731
    qkv_bias = lambda b: b.reshape(H, hd)                  # noqa: E731
    lin_kernel = lambda w: w.T                             # noqa: E731
    ident = lambda a: a                                    # noqa: E731

    layers = {
        "attention_norm": {
            "scale": stack("transformer.encoder.layer.{}.attention_norm.weight", ident),
            "bias": stack("transformer.encoder.layer.{}.attention_norm.bias", ident),
        },
        "ffn_norm": {
            "scale": stack("transformer.encoder.layer.{}.ffn_norm.weight", ident),
            "bias": stack("transformer.encoder.layer.{}.ffn_norm.bias", ident),
        },
        "attn": {
            name: {
                "kernel": stack(
                    f"transformer.encoder.layer.{{}}.attn.{name}.weight", qkv_kernel),
                "bias": stack(
                    f"transformer.encoder.layer.{{}}.attn.{name}.bias", qkv_bias),
            }
            for name in ("query", "key", "value")
        },
        "ffn": {
            "fc1": {
                "kernel": stack("transformer.encoder.layer.{}.ffn.fc1.weight", lin_kernel),
                "bias": stack("transformer.encoder.layer.{}.ffn.fc1.bias", ident),
            },
            "fc2": {
                "kernel": stack("transformer.encoder.layer.{}.ffn.fc2.weight", lin_kernel),
                "bias": stack("transformer.encoder.layer.{}.ffn.fc2.bias", ident),
            },
        },
    }
    layers["attn"]["out"] = {
        "kernel": stack("transformer.encoder.layer.{}.attn.out.weight", lin_kernel),
        "bias": stack("transformer.encoder.layer.{}.attn.out.bias", ident),
    }

    conv_w = g("transformer.embeddings.patch_embeddings.weight")
    params = {
        "embeddings": {
            "patch_embeddings": {
                "kernel": conv_w.transpose(2, 3, 4, 1, 0),
                "bias": g("transformer.embeddings.patch_embeddings.bias"),
            },
            "cls_token": g("transformer.embeddings.cls_token"),
            "position_embeddings": g("transformer.embeddings.position_embeddings"),
        },
        "encoder": {
            "layers": {"block": layers},
            "encoder_norm": {
                "scale": g("transformer.encoder.encoder_norm.weight"),
                "bias": g("transformer.encoder.encoder_norm.bias"),
            },
        },
        "head": {
            "kernel": g("head.weight").T,
            "bias": g("head.bias"),
        },
    }
    return jax.tree.map(jnp.asarray, params)


def torch_ensemble_to_flax(state: Mapping[str, Any],
                           configs) -> Dict[str, Any]:
    """Convert a reference TransformerEnsemble state_dict
    (`models/modeling.py:347-356`) to our TransformerEnsemble param tree.
    """
    params: Dict[str, Any] = {}
    for i, cfg in enumerate(configs):
        params[f"transformer_{i}"] = torch_vit_to_flax(
            state, cfg, prefix=f"transformers.{i}.")
    params["meta"] = {
        "classifier": {
            "kernel": jnp.asarray(_t(state["classifier.weight"]).T),
            "bias": jnp.asarray(_t(state["classifier.bias"])),
        }
    }
    return params


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    """Load a reference .bin checkpoint (torch.save of a state_dict)."""
    import torch  # local import: torch is only needed for parity/import paths

    return torch.load(path, map_location="cpu")


def flax_vit_to_numpy_state(params: Mapping[str, Any],
                            config: ViTConfig) -> Dict[str, np.ndarray]:
    """Inverse conversion (flax -> torch-layout numpy dict), so checkpoints
    trained here can be exported for the reference's evaluation tooling."""
    L = config.num_layers
    D, H = config.hidden_size, config.num_heads
    p = jax.device_get(params)
    out: Dict[str, np.ndarray] = {}
    emb = p["embeddings"]
    out["transformer.embeddings.patch_embeddings.weight"] = (
        emb["patch_embeddings"]["kernel"].transpose(4, 3, 0, 1, 2))
    out["transformer.embeddings.patch_embeddings.bias"] = emb["patch_embeddings"]["bias"]
    out["transformer.embeddings.cls_token"] = emb["cls_token"]
    out["transformer.embeddings.position_embeddings"] = emb["position_embeddings"]
    blk = p["encoder"]["layers"]["block"]
    for i in range(L):
        root = f"transformer.encoder.layer.{i}"
        out[f"{root}.attention_norm.weight"] = blk["attention_norm"]["scale"][i]
        out[f"{root}.attention_norm.bias"] = blk["attention_norm"]["bias"][i]
        out[f"{root}.ffn_norm.weight"] = blk["ffn_norm"]["scale"][i]
        out[f"{root}.ffn_norm.bias"] = blk["ffn_norm"]["bias"][i]
        for name in ("query", "key", "value"):
            out[f"{root}.attn.{name}.weight"] = (
                blk["attn"][name]["kernel"][i].reshape(D, D).T)
            out[f"{root}.attn.{name}.bias"] = (
                blk["attn"][name]["bias"][i].reshape(D))
        out[f"{root}.attn.out.weight"] = blk["attn"]["out"]["kernel"][i].T
        out[f"{root}.attn.out.bias"] = blk["attn"]["out"]["bias"][i]
        out[f"{root}.ffn.fc1.weight"] = blk["ffn"]["fc1"]["kernel"][i].T
        out[f"{root}.ffn.fc1.bias"] = blk["ffn"]["fc1"]["bias"][i]
        out[f"{root}.ffn.fc2.weight"] = blk["ffn"]["fc2"]["kernel"][i].T
        out[f"{root}.ffn.fc2.bias"] = blk["ffn"]["fc2"]["bias"][i]
    out["transformer.encoder.encoder_norm.weight"] = p["encoder"]["encoder_norm"]["scale"]
    out["transformer.encoder.encoder_norm.bias"] = p["encoder"]["encoder_norm"]["bias"]
    out["head.weight"] = p["head"]["kernel"].T
    out["head.bias"] = p["head"]["bias"]
    return out
