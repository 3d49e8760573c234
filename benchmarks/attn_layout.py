"""Isolated attention-block microbenchmarks: where do the 24% go?

Times the FULL per-layer attention sub-graph (from the fused-QKV (B, T, 3D)
activation to the merged (B, T, D) context, as in models/vit3d.py) under
different layout strategies, per reference shape class, bf16, B=512.

Variants:
  * transpose  — current model code: reshape -> (3, B, H, T, hd) transpose,
                 einsum attention, transpose back, reshape merge.
  * fold       — NO explicit transposes: q/k/v stay (B, T, H, hd) views of
                 the reshaped qkv; einsums contract/batch directly from that
                 layout ('bqhd,bkhd->bhqk'); context comes back 'bqhd' and
                 merges with a pure reshape.  XLA folds the layout changes
                 into the dot_generals.
  * noattn     — identity in place of scores/softmax/context (bounds the
                 attention-free floor of the same sub-graph).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/attn_layout.py
"""

from __future__ import annotations

import json
import math
import time

import jax
import jax.numpy as jnp
import numpy as np


def make_fn(variant, B, T, D, H):
    hd = D // H
    scale = 1.0 / math.sqrt(hd)

    def attn_from(q, k, v, layout):
        # layout 'bhqd': (B, H, T, hd); 'bqhd': (B, T, H, hd)
        if layout == "bhqd":
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
            p = jax.nn.softmax(scores, axis=-1)
            return jnp.einsum("bhqk,bhkd->bhqd", p, v)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        p = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v)

    def fn(qkv):                                   # (B, T, 3D)
        if variant == "transpose":
            x = qkv.reshape(B, T, 3, H, hd).transpose(2, 0, 3, 1, 4)
            q, k, v = x[0], x[1], x[2]
            ctx = attn_from(q, k, v, "bhqd")       # (B, H, T, hd)
            return ctx.transpose(0, 2, 1, 3).reshape(B, T, D)
        if variant == "fold":
            x = qkv.reshape(B, T, 3, H, hd)
            q, k, v = x[:, :, 0], x[:, :, 1], x[:, :, 2]
            ctx = attn_from(q, k, v, "bqhd")       # (B, T, H, hd)
            return ctx.reshape(B, T, D)
        if variant == "noattn":
            x = qkv.reshape(B, T, 3, H, hd)
            return x[:, :, 0].reshape(B, T, D)
        raise ValueError(variant)

    return fn


def main():
    from vit3d_ensemble_tpu.cli._common import setup_jax_cache

    setup_jax_cache()
    B, T = 512, 65
    iters = 50
    rng = np.random.default_rng(0)
    for D, H in ((16, 16), (32, 8), (64, 4)):
        qkv = jnp.asarray(rng.normal(size=(B, T, 3 * D))
                          .astype(np.float32)).astype(jnp.bfloat16)
        for variant in ("transpose", "fold", "noattn"):
            fn = make_fn(variant, B, T, D, H)

            @jax.jit
            def run(qkv, fn=fn):
                def body(acc, i):
                    out = fn(qkv * (1.0 + i.astype(qkv.dtype) * 1e-6))
                    return acc + jnp.sum(out), None
                acc, _ = jax.lax.scan(body, jnp.bfloat16(0.0),
                                      jnp.arange(iters))
                return acc

            float(run(qkv))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(qkv))
                best = min(best, time.perf_counter() - t0)
            print(json.dumps({"D": D, "H": H, "variant": variant,
                              "ms_per_iter": round(best / iters * 1e3, 3)}))


if __name__ == "__main__":
    main()
