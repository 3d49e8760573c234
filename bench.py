"""Headline benchmark: 18-ViT batched inference throughput (volumes/sec/chip).

The BASELINE.json metric.  Every volume is pushed through ALL 18 baseline
ViT configurations (the ensemble sweep's member-logit workload), batched as
3 vmapped shape-class groups on one chip.

Baseline for vs_baseline: the reference (torch 2.13 CPU, measured
2026-08-16, BASELINE.md) runs single-model inference at ~203 volumes/s, so
pushing a volume through all 18 models sequentially runs at 203/18 ~= 11.3
volumes/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

REFERENCE_ALL18_VOLUMES_PER_SEC = 203.0 / 18.0


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vit3d_ensemble_tpu.cli._common import setup_jax_cache
    from vit3d_ensemble_tpu.models import VisionTransformer3D
    from vit3d_ensemble_tpu.ops.mlp import set_default_mlp_impl
    from vit3d_ensemble_tpu.sweep.stack import group_configs, init_group_params

    setup_jax_cache()
    # fused VMEM-resident FFN kernel: the (tokens, 3072) intermediate —
    # the model's dominant HBM traffic — never leaves the chip.
    set_default_mlp_impl("pallas")

    B = 128          # volumes per step; all 18 models see every volume
    rng = np.random.default_rng(0)
    # bfloat16 inference: 2.2x the f32 path on v5e (matmuls and HBM traffic
    # both halve); training and parity tests remain f32.
    x = jnp.asarray(rng.normal(size=(B, 128, 128, 5, 1))
                    .astype(np.float32)).astype(jnp.bfloat16)

    iters = 20
    fwds = []
    for group in group_configs(range(1, 19)):
        template = group.template_config(128)
        model = VisionTransformer3D(template, zero_head=True, vis=False)
        params = jax.tree.map(lambda a: a[:, 0].astype(jnp.bfloat16),
                              init_group_params(group, 1, 42))
        mlp_a = jnp.asarray(group.mlp_dims, jnp.int32)
        lay_a = jnp.asarray(group.num_layers, jnp.int32)

        # all iterations inside one scanned program, each iteration with an
        # input-dependent perturbation: repeated identical dispatches can be
        # memoized by the remote executor and time as ~0.
        @jax.jit
        def fwd_n(p, vols, ml=mlp_a, la=lay_a, model=model):
            def one(pp, m, l, v):
                return model.apply({"params": pp}, v, deterministic=True,
                                   num_layers_active=l,
                                   mlp_active=m).logits.reshape(-1)

            def body(acc, i):
                vi = vols * (1.0 + i.astype(vols.dtype) * 1e-6)
                out = jax.vmap(one, in_axes=(0, 0, 0, None))(p, ml, la, vi)
                return acc + jnp.sum(out), None

            acc, _ = jax.lax.scan(body, jnp.bfloat16(0.0),
                                  jnp.arange(iters))
            return acc

        fwds.append((fwd_n, params))

    # warmup (compile) — NOTE: on this remote-device tunnel
    # block_until_ready does NOT synchronize; a host scalar fetch does.
    for fwd_n, params in fwds:
        float(fwd_n(params, x))

    t0 = time.perf_counter()
    # dispatch all 3 shape-class programs before fetching: the fetch is the
    # only true sync on this tunnel, and a per-group fetch would serialize
    # host round-trips between groups.
    accs = [fwd_n(params, x) for fwd_n, params in fwds]
    acc = sum(float(a) for a in accs)       # scalar fetch = true sync
    dt = time.perf_counter() - t0

    volumes_per_sec = B * iters / dt

    # MFU accounting: analytical matmul FLOPs of all 18 models per volume
    # vs the chip's peak (v5e bf16 ~197 TFLOPS; the bench runs bf16).
    from vit3d_ensemble_tpu.configs import ViTConfig

    flops_per_volume = sum(
        ViTConfig.from_conf(c).forward_flops() for c in range(1, 19))
    peak_bf16 = 197e12
    tflops = volumes_per_sec * flops_per_volume / 1e12
    print(json.dumps({
        "metric": "volumes/sec/chip (18-ViT batched inference)",
        "value": round(volumes_per_sec, 1),
        "unit": "volumes/s",
        "vs_baseline": round(volumes_per_sec / REFERENCE_ALL18_VOLUMES_PER_SEC,
                             1),
        "flops_per_volume": flops_per_volume,
        "tflops": round(tflops, 2),
        "mfu_pct": round(100.0 * tflops * 1e12 / peak_bf16, 2),
    }))


if __name__ == "__main__":
    main()
