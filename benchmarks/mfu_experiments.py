"""MFU attack experiments for the 18-ViT headline bench (VERDICT round-1 #2).

Measures, on the real chip:
  * per-shape-class group time + achieved TFLOPS (where does time go?)
  * batch-size scaling (128 / 256 / 512), with all-3-groups dispatch
    overlap (one sync fetch)
  * MLP impl ablation (xla vs pallas)

(The attention-share and GELU-share ablations that drove the round-2
optimizations were measured by monkeypatching `ops.attention.
dot_product_attention` / `ops.pallas_mlp._poly_gelu` to identity — results
in docs/RESULTS.md: attention <1%, erf-GELU ~46% before the poly fix.)

Run:  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/mfu_experiments.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def group_fwd(group, B, iters, img=128, mlp_impl="pallas"):
    from vit3d_ensemble_tpu.models import VisionTransformer3D
    from vit3d_ensemble_tpu.ops.mlp import set_default_mlp_impl
    from vit3d_ensemble_tpu.sweep.stack import init_group_params

    set_default_mlp_impl(mlp_impl)
    template = group.template_config(img)
    model = VisionTransformer3D(template, zero_head=True, vis=False)
    params = jax.tree.map(lambda a: a[:, 0].astype(jnp.bfloat16),
                          init_group_params(group, 1, 42, img))
    mlp_a = jnp.asarray(group.mlp_dims, jnp.int32)
    lay_a = jnp.asarray(group.num_layers, jnp.int32)

    @jax.jit
    def fwd_n(p, vols):
        def one(pp, m, l, v):
            return model.apply({"params": pp}, v, deterministic=True,
                               num_layers_active=l,
                               mlp_active=m).logits.reshape(-1)

        def body(acc, i):
            vi = vols * (1.0 + i.astype(vols.dtype) * 1e-6)
            out = jax.vmap(one, in_axes=(0, 0, 0, None))(p, mlp_a, lay_a, vi)
            return acc + jnp.sum(out), None

        acc, _ = jax.lax.scan(body, jnp.bfloat16(0.0), jnp.arange(iters))
        return acc

    return fwd_n, params


def time_fetch(fn, *args, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from vit3d_ensemble_tpu.cli._common import setup_jax_cache
    from vit3d_ensemble_tpu.configs import ViTConfig
    from vit3d_ensemble_tpu.sweep.stack import group_configs

    setup_jax_cache()
    rng = np.random.default_rng(0)
    iters = 20
    groups = group_configs(range(1, 19))
    gflops = {g.hidden_size: sum(ViTConfig.from_conf(c).forward_flops()
                                 for c in g.confs) / 1e9 for g in groups}
    print("per-volume GFLOPs by group:",
          {k: round(v, 2) for k, v in gflops.items()}, "sum:",
          round(sum(gflops.values()), 2))

    for B in (128, 256, 512):
        x = jnp.asarray(rng.normal(size=(B, 128, 128, 5, 1))
                        .astype(np.float32)).astype(jnp.bfloat16)
        rows = []
        fwds = []
        for g in groups:
            fwd, params = group_fwd(g, B, iters)
            float(fwd(params, x))            # compile
            dt = time_fetch(fwd, params, x)
            tf = gflops[g.hidden_size] * B * iters / dt / 1e3
            rows.append((g.hidden_size, round(dt * 1e3, 1), round(tf, 2)))
            fwds.append((fwd, params))
        # all three dispatched back-to-back, one sync
        t0 = time.perf_counter()
        accs = [f(p, x) for f, p in fwds]
        _ = [float(a) for a in accs]
        dt_all = time.perf_counter() - t0
        vps = B * iters / dt_all
        print(json.dumps({
            "B": B,
            "per_group (D, ms, TFLOPS)": rows,
            "all3_ms": round(dt_all * 1e3, 1),
            "volumes_per_sec": round(vps, 1),
            "total_tflops": round(vps * sum(gflops.values()) / 1e3, 2),
        }))

    # MLP impl ablation at B=256
    B = 256
    x = jnp.asarray(rng.normal(size=(B, 128, 128, 5, 1))
                    .astype(np.float32)).astype(jnp.bfloat16)
    for impl in ("pallas", "xla"):
        total = 0.0
        for g in groups:
            fwd, params = group_fwd(g, B, iters, mlp_impl=impl)
            float(fwd(params, x))
            total += time_fetch(fwd, params, x)
        print(json.dumps({"mlp_impl": impl, "B": B,
                          "sum_group_ms": round(total * 1e3, 1),
                          "volumes_per_sec": round(B * iters / total, 1)}))


if __name__ == "__main__":
    main()
