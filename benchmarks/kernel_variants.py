"""Round-2/3 kernel-variant experiments on the 18-ViT headline bench.

Measures, on the real chip, bench.py's exact workload (18 exact-shape bf16
programs, B=512, 20 scanned iters, one sync fetch) under:

  * baseline       — current defaults (pallas MLP, xla attention)
  * attn=pallas    — fused attention kernel at the new operating point
  * TILE_N in {256, 1024} — MLP kernel token-tile size

Run:  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/kernel_variants.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_fwds(B, iters):
    from vit3d_ensemble_tpu.configs import ViTConfig
    from vit3d_ensemble_tpu.models import VisionTransformer3D

    fwds = []
    for conf in range(1, 19):
        cfg = ViTConfig.from_conf(conf)
        model = VisionTransformer3D(cfg, zero_head=True, vis=False)

        @jax.jit
        def init(model=model, cfg=cfg):
            dummy = jnp.zeros((1, cfg.img_size, cfg.img_size, cfg.z_size,
                               cfg.in_channels), jnp.float32)
            return model.init({"params": jax.random.key(42)},
                              dummy)["params"]

        params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), init())

        @jax.jit
        def fwd_n(p, vols, model=model):
            def body(acc, i):
                vi = vols * (1.0 + i.astype(vols.dtype) * 1e-6)
                out = model.apply({"params": p}, vi,
                                  deterministic=True).logits
                return acc + jnp.sum(out), None

            acc, _ = jax.lax.scan(body, jnp.bfloat16(0.0),
                                  jnp.arange(iters))
            return acc

        fwds.append((fwd_n, params))
    return fwds


def run_variant(name, x, B, iters, reps=3):
    fwds = build_fwds(B, iters)
    for fwd_n, params in fwds:
        float(fwd_n(params, x))                      # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        accs = [fwd_n(params, x) for fwd_n, params in fwds]
        _ = sum(float(a) for a in accs)
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"variant": name,
                      "volumes_per_sec": round(B * iters / best, 1)}))


def main(argv=None):
    import sys

    from vit3d_ensemble_tpu.cli._common import setup_jax_cache
    from vit3d_ensemble_tpu.ops import attention as attn_mod
    from vit3d_ensemble_tpu.ops import pallas_mlp
    from vit3d_ensemble_tpu.ops.mlp import set_default_mlp_impl

    which = (argv if argv is not None else sys.argv[1:]) or ["baseline"]

    setup_jax_cache()
    set_default_mlp_impl("pallas")
    B, iters = 512, 20
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, 128, 128, 5, 1))
                    .astype(np.float32)).astype(jnp.bfloat16)

    if "baseline" in which:
        run_variant("baseline (tile 512, attn xla)", x, B, iters)
    for nb in (256, 768, 1024):
        if f"b{nb}" in which:
            xb = jnp.asarray(rng.normal(size=(nb, 128, 128, 5, 1))
                             .astype(np.float32)).astype(jnp.bfloat16)
            run_variant(f"batch {nb}", xb, nb, iters)
    if "attn_vpu" in which:
        attn_mod.set_default_attention_impl("vpu")
        run_variant("attn vpu (mul-reduce)", x, B, iters)
        attn_mod.set_default_attention_impl("xla")
    if "attn_pallas" in which:
        attn_mod.set_default_attention_impl("pallas")
        run_variant("attn pallas", x, B, iters)
        attn_mod.set_default_attention_impl("xla")
    for tile in (256, 1024):
        if f"tile{tile}" in which:
            pallas_mlp.TILE_N = tile
            run_variant(f"mlp tile {tile}", x, B, iters)
            pallas_mlp.TILE_N = 512
    for variant in ("chunked", "pipelined2"):
        if f"mlp_{variant}" in which:
            pallas_mlp._MLP_VARIANT = variant
            run_variant(f"mlp {variant}", x, B, iters)
            pallas_mlp._MLP_VARIANT = "seq"
    if "per_config" in which:
        # time each of the 18 exact-shape programs separately: which
        # (hidden, heads) class eats the residual above the matmul+GELU
        # floor?  (fetch per program: adds one host RTT each, fine for
        # relative comparison)
        fwds = build_fwds(B, iters)
        for conf, (fwd_n, params) in enumerate(fwds, start=1):
            float(fwd_n(params, x))
            t0 = time.perf_counter()
            float(fwd_n(params, x))
            dt = time.perf_counter() - t0
            print(json.dumps({"conf": conf, "ms": round(dt * 1e3, 1)}))
    if "ablate_attn" in which:
        # attention -> identity(q): scores/softmax/context drop out (the
        # QKV matmul, relayouts, and out-proj remain).  vit3d.py binds the
        # name at import, so patch it there.
        from vit3d_ensemble_tpu.models import vit3d as vit3d_mod

        orig = vit3d_mod.dot_product_attention

        def ident(q, k, v, **kw):
            return q, None

        vit3d_mod.dot_product_attention = ident
        try:
            run_variant("attention=identity", x, B, iters)
        finally:
            vit3d_mod.dot_product_attention = orig
    if "ablate_gelu" in which:
        orig = pallas_mlp._poly_gelu
        pallas_mlp._poly_gelu = lambda h: h
        try:
            run_variant("gelu=identity", x, B, iters)
        finally:
            pallas_mlp._poly_gelu = orig
    if "ablate_ln" in which:
        # LayerNorm -> identity (keeps params; skips stats + affine)
        import flax.linen as nn

        orig = nn.LayerNorm.__call__
        nn.LayerNorm.__call__ = lambda self, x: x
        try:
            run_variant("layernorm=identity", x, B, iters)
        finally:
            nn.LayerNorm.__call__ = orig


if __name__ == "__main__":
    main()
