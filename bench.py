"""Headline benchmark: 18-ViT batched inference throughput (volumes/sec/chip).

The BASELINE.json metric.  Every volume is pushed through ALL 18 baseline
ViT configurations (the ensemble sweep's member-logit workload) on one chip.

Each config runs as an EXACT-shape program (its true mlp_dim and depth) in
bf16 with the fused Pallas MLP; all 18 programs are dispatched back-to-back
and synchronized with a single host fetch.  Exact shapes matter: the
training sweep pads every config to its (hidden, heads) group's max
(d=3072, L=8) so one vmapped program serves the grid, but inference padding
is pure waste — the padded grid computes 442k layer-width units against the
true 276k (37% overhead).

Baseline for vs_baseline: the reference (torch 2.13 CPU, measured
2026-08-16, BASELINE.md) runs single-model inference at ~203 volumes/s, so
pushing a volume through all 18 models sequentially runs at 203/18 ~= 11.3
volumes/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", + MFU
accounting}.
"""

from __future__ import annotations

import json
import time

REFERENCE_ALL18_VOLUMES_PER_SEC = 203.0 / 18.0

# Reference serving measurement (torch 2.13 CPU, BASELINE.md): ~20 ms per
# B=4 inference batch through ONE model — batch 1 is the reference's own
# eval shape (utils/data_utils_cv.py:49-52, tools.py:38-57).
REFERENCE_SINGLE_MODEL_B4_MS = 20.0


def latency_main() -> None:
    """BENCH_MODE=latency: serving-path latency (VERDICT r4 #4).

    Clinical shapes: one volume (and small batches 1-8) through (a) one
    baseline model, (b) the paper's {5,9,11} stacking ensemble, (c) ALL 18
    grid models.  Warm programs; the number is device program latency,
    scan-amortized over ITERS strictly sequential iterations (an XLA while
    loop cannot overlap iterations), because a single dispatch over this
    remote tunnel measures ~50 ms of RTT, not the program.  The one-shot
    dispatch+fetch wall is reported separately as `tunnel_roundtrip_ms` so
    the serial fraction is not hidden.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vit3d_ensemble_tpu.cli._common import setup_jax_cache
    from vit3d_ensemble_tpu.configs import ViTConfig
    from vit3d_ensemble_tpu.models import (
        TransformerEnsemble,
        VisionTransformer3D,
    )
    from vit3d_ensemble_tpu.ops.mlp import set_default_mlp_impl

    import os

    setup_jax_cache()
    set_default_mlp_impl(os.environ.get("BENCH_MLP_IMPL", "pallas"))
    from vit3d_ensemble_tpu.ops.quant import set_default_quant_impl

    set_default_quant_impl(os.environ.get("BENCH_QUANT_IMPL", "none"))
    iters = int(os.environ.get("BENCH_LATENCY_ITERS", "50"))
    rng = np.random.default_rng(0)

    def scan_latency_ms(apply_fn, params, x):
        @jax.jit
        def fwd_n(p, v):
            def body(acc, i):
                vi = v * (1.0 + i.astype(v.dtype) * 1e-6)
                return acc + jnp.sum(apply_fn(p, vi)), None

            acc, _ = jax.lax.scan(body, jnp.bfloat16(0.0),
                                  jnp.arange(iters))
            return acc

        float(fwd_n(params, x))             # compile + warm
        t0 = time.perf_counter()
        float(fwd_n(params, x))             # scalar fetch = true sync
        per_batch = (time.perf_counter() - t0) / iters * 1e3

        @jax.jit
        def fwd_1(p, v):
            return jnp.sum(apply_fn(p, v))

        float(fwd_1(params, x))             # compile + warm
        t0 = time.perf_counter()
        float(fwd_1(params, x))             # one dispatch + one fetch
        roundtrip = (time.perf_counter() - t0) * 1e3
        return per_batch, roundtrip

    def bf16(tree):
        return jax.tree.map(lambda a: a.astype(jnp.bfloat16), tree)

    results = {}
    batches = (1, 4, 8)
    vols = {b: jnp.asarray(rng.normal(size=(b, 128, 128, 5, 1))
                           .astype(np.float32)).astype(jnp.bfloat16)
            for b in batches}

    # (a) one baseline model (conf 9 — a paper-default ensemble member)
    cfg = ViTConfig.from_conf(9)
    model = VisionTransformer3D(cfg, zero_head=True, vis=False)
    params = bf16(jax.jit(lambda: model.init(
        {"params": jax.random.key(42)}, vols[1].astype(jnp.float32)))())
    for b in batches:
        ms, rt = scan_latency_ms(
            lambda p, v: model.apply(p, v, deterministic=True).logits,
            params, vols[b])
        results[f"single_model_b{b}_ms"] = round(ms, 3)
        if b == 1:
            results["single_model_b1_tunnel_roundtrip_ms"] = round(rt, 1)

    # (b) the paper's {5,9,11} stacking ensemble — the deployed artifact
    e_cfgs = tuple(ViTConfig.from_conf(c) for c in (5, 9, 11))
    ensemble = TransformerEnsemble(e_cfgs)
    e_params = bf16(jax.jit(lambda: ensemble.init(
        {"params": jax.random.key(0)}, vols[1].astype(jnp.float32)))())
    for b in batches:
        ms, rt = scan_latency_ms(
            lambda p, v: ensemble.apply(p, v, deterministic=True),
            e_params, vols[b])
        results[f"ensemble_591l1_b{b}_ms"] = round(ms, 3)
        if b == 1:
            results["ensemble_b1_tunnel_roundtrip_ms"] = round(rt, 1)

    # (c) one volume through ALL 18 grid models in one program
    models, plist = [], []
    for conf in range(1, 19):
        c = ViTConfig.from_conf(conf)
        m = VisionTransformer3D(c, zero_head=True, vis=False)
        models.append(m)
        plist.append(bf16(jax.jit(lambda m=m: m.init(
            {"params": jax.random.key(conf)},
            vols[1].astype(jnp.float32)))()))

    def all18(ps, v):
        tot = jnp.bfloat16(0.0)
        for m, p in zip(models, ps):
            tot = tot + jnp.sum(m.apply(p, v, deterministic=True).logits)
        return tot[None]

    for b in batches:
        ms, rt = scan_latency_ms(lambda ps, v: all18(ps, v), plist, vols[b])
        results[f"all18_b{b}_ms"] = round(ms, 3)
        if b == 1:
            results["all18_b1_tunnel_roundtrip_ms"] = round(rt, 1)

    print(json.dumps({
        "metric": "serving latency (single-volume, warm programs)",
        "value": results["single_model_b1_ms"],
        "unit": "ms/volume (1 model, B=1)",
        "vs_baseline": round(
            REFERENCE_SINGLE_MODEL_B4_MS / results["single_model_b4_ms"], 1),
        **results,
    }))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vit3d_ensemble_tpu.cli._common import setup_jax_cache
    from vit3d_ensemble_tpu.configs import ViTConfig
    from vit3d_ensemble_tpu.models import VisionTransformer3D
    from vit3d_ensemble_tpu.ops.mlp import set_default_mlp_impl

    setup_jax_cache()
    import os

    # fused VMEM-resident FFN kernel: the (tokens, mlp_dim) intermediate —
    # the model's dominant HBM traffic and VPU time — never leaves the
    # chip.  BENCH_MLP_IMPL=xla overrides — interesting ONLY combined with
    # BENCH_FUSED18: Mosaic issues MXU and VPU work strictly in order
    # (the measured serialized matmul+GELU floor), but XLA scheduling 18
    # independent models in one program may overlap model i's GELU with
    # model j's matmuls.
    set_default_mlp_impl(os.environ.get("BENCH_MLP_IMPL", "pallas"))
    # attention impl A/B knob (BENCH_ATTENTION_IMPL=layer|xla|...):
    # 'layer' is the whole-sublayer fused kernel (ops/pallas_attention_layer)
    from vit3d_ensemble_tpu.ops.attention import set_default_attention_impl

    set_default_attention_impl(os.environ.get("BENCH_ATTENTION_IMPL",
                                              "auto"))
    # quant A/B knob (BENCH_QUANT_IMPL=int8|int8_attn): see ops/quant.py
    # and docs/int8_ab.jsonl for the measured regimes.
    from vit3d_ensemble_tpu.ops.quant import set_default_quant_impl

    set_default_quant_impl(os.environ.get("BENCH_QUANT_IMPL", "none"))

    # volumes per step; all 18 models see every volume.  Measured at the
    # current stack (exact shapes, pallas MLP, einsum attention, round 4):
    # 512 -> 7941, 768 -> 7314, 1024 -> 6882 vol/s — and the fused layer
    # kernel loses at every batch (3545 at 512), so B=512 is the optimum
    # with or without attention scores in HBM.  BENCH_B overrides.
    B = int(os.environ.get("BENCH_B", "512"))
    rng = np.random.default_rng(0)
    # bfloat16 inference: ~2x the f32 path on v5e (matmuls and HBM traffic
    # both halve); training and parity tests remain f32.
    x = jnp.asarray(rng.normal(size=(B, 128, 128, 5, 1))
                    .astype(np.float32)).astype(jnp.bfloat16)

    iters = 20
    models, plist, fwds = [], [], []
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
        models.append(model)
        plist.append(params)

        # all iterations inside one scanned program, each iteration with an
        # input-dependent perturbation: repeated identical dispatches can be
        # memoized by the remote executor and time as ~0.
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

    if os.environ.get("BENCH_FUSED18") == "1":
        # ALL 18 exact-shape forwards inside ONE scanned program: the
        # per-iteration perturbation and the (weight-independent) patch
        # extraction are computed once and CSE'd across models instead of
        # 18 times, and the device never idles between programs.  Same
        # math as the 18-program mode.
        @jax.jit
        def fwd_all(ps, vols):
            def body(acc, i):
                vi = vols * (1.0 + i.astype(vols.dtype) * 1e-6)
                tot = jnp.bfloat16(0.0)
                for model, p in zip(models, ps):
                    tot = tot + jnp.sum(model.apply(
                        {"params": p}, vi, deterministic=True).logits)
                return acc + tot, None

            acc, _ = jax.lax.scan(body, jnp.bfloat16(0.0),
                                  jnp.arange(iters))
            return acc

        float(fwd_all(plist, x))            # warmup (compile)
        t0 = time.perf_counter()
        acc = float(fwd_all(plist, x))      # scalar fetch = true sync
        dt = time.perf_counter() - t0
    else:
        # warmup (compile) — NOTE: on this remote-device tunnel
        # block_until_ready does NOT synchronize; a host scalar fetch does.
        for fwd_n, params in fwds:
            float(fwd_n(params, x))

        t0 = time.perf_counter()
        # dispatch all 18 programs before fetching: the fetch is the only
        # true sync on this tunnel, and a per-program fetch would serialize
        # host round-trips between models.
        accs = [fwd_n(params, x) for fwd_n, params in fwds]
        acc = sum(float(a) for a in accs)   # scalar fetch = true sync
        dt = time.perf_counter() - t0

    volumes_per_sec = B * iters / dt

    # MFU accounting: analytical matmul FLOPs of all 18 models per volume
    # vs the chip's peak (v5e bf16 ~197 TFLOPS; the bench runs bf16).
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
    import os

    if os.environ.get("BENCH_MODE") == "latency":
        latency_main()
    else:
        main()
