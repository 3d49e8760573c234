"""Int8 (W8A8) inference A/B — the last untested perf lever (VERDICT r4).

Two regimes, two hypotheses (see ops/quant.py):

  * stretch 3D ViT-B/16 @ 128^3 (513 tokens, 88.6M params): genuinely
    MXU-bound at ~48 TFLOPS effective bf16, and the v5e MXU's int8 peak is
    2x its bf16 peak -> int8 projections are real headroom IF the
    quantize/dequantize VPU passes don't eat the win;
  * the 18-ViT headline (65 tokens, D <= 64): tile-priced — the MXU
    charges a full 128x128 tile regardless of D, so halving the element
    width buys nothing -> expected ~neutral-to-negative.

Protocol identical to bench.py / benchmarks/stretch_vitb.py: all
iterations inside one scanned program with input-dependent perturbation;
a host scalar fetch is the only true sync over this tunnel.  Accuracy is
reported alongside: max |logit delta| vs the exact path on the same
inputs (f32 compare), because a perf lever that moves the decisions is
not a lever.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/int8_ab.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from vit3d_ensemble_tpu.cli._common import setup_jax_cache
from vit3d_ensemble_tpu.configs import ViTConfig, vit_b16_128cubed
from vit3d_ensemble_tpu.models import VisionTransformer3D
from vit3d_ensemble_tpu.ops.attention import set_default_attention_impl
from vit3d_ensemble_tpu.ops.mlp import set_default_mlp_impl
from vit3d_ensemble_tpu.ops.quant import set_default_quant_impl

import os as _os

ITERS = int(_os.environ.get("INT8_AB_ITERS", "20"))


def _timed_scan_fwd(model, params, x):
    """One scanned program over ITERS perturbed forwards; returns vol/s."""

    @jax.jit
    def fwd_n(p, v):
        def body(acc, i):
            vi = v * (1.0 + i.astype(v.dtype) * 1e-6)
            out = model.apply({"params": p}, vi,
                              deterministic=True).logits
            return acc + jnp.sum(out), None

        acc, _ = jax.lax.scan(body, jnp.bfloat16(0.0), jnp.arange(ITERS))
        return acc

    float(fwd_n(params, x))                 # compile + warm
    t0 = time.perf_counter()
    float(fwd_n(params, x))                 # scalar fetch = true sync
    dt = time.perf_counter() - t0
    return x.shape[0] * ITERS / dt


def _logit_dev(cfg, x, impls=("int8",)):
    """max |logit(quant) - logit(exact)| per impl, same inputs (f32 fetch).

    Uses a zero_head=False model (the throughput models run zero_head=True,
    whose logits are identically 0 — a vacuous comparison) in f32 so the
    number isolates quantization error rather than bf16 rounding."""
    model = VisionTransformer3D(cfg, zero_head=False, vis=False)
    xf = x.astype(jnp.float32)
    params = jax.jit(lambda: model.init(
        {"params": jax.random.key(1)}, xf[:1])["params"])()
    logits = {}
    for impl in ("none",) + tuple(impls):
        set_default_quant_impl(impl)
        logits[impl] = np.asarray(
            jax.jit(lambda p, v: model.apply(
                {"params": p}, v, deterministic=True).logits)(params, xf),
            dtype=np.float32)
    set_default_quant_impl("none")
    return {impl: float(np.max(np.abs(logits[impl] - logits["none"])))
            for impl in impls}


def bench_stretch():
    cfg = vit_b16_128cubed()
    model = VisionTransformer3D(cfg, zero_head=True, vis=False)
    rng = np.random.default_rng(0)
    B = int(_os.environ.get("INT8_AB_STRETCH_B", "8"))
    x = jnp.asarray(rng.normal(size=(B, 128, 128, 128, 1))
                    .astype(np.float32)).astype(jnp.bfloat16)

    @jax.jit
    def init():
        return jax.tree.map(
            lambda a: a.astype(jnp.bfloat16),
            model.init({"params": jax.random.key(0)},
                       jnp.zeros((1, 128, 128, 128, 1),
                                 jnp.bfloat16))["params"])

    params = init()
    # measured round-4 optimum for this model: mlp=pallas, attn=xla.
    # int8 bypasses the pallas MLP (ops/quant.py precedence), so also
    # measure int8 against the xla-MLP exact path for a like-for-like.
    out = {}
    for label, mlp_impl, quant in (("bf16_pallas_mlp", "pallas", "none"),
                                   ("bf16_xla_mlp", "xla", "none"),
                                   ("int8", "xla", "int8"),
                                   ("int8_attn_pallas_mlp", "pallas",
                                    "int8_attn")):
        set_default_mlp_impl(mlp_impl)
        set_default_attention_impl("xla")
        set_default_quant_impl(quant)
        out[label] = round(_timed_scan_fwd(model, params, x), 1)
    set_default_mlp_impl("pallas")
    dev = _logit_dev(cfg, x[:2], impls=("int8", "int8_attn"))
    print(json.dumps({"bench": "int8_ab_stretch_vitb_128cubed", "B": B,
                      "volumes_per_sec": out, "max_logit_dev": dev}))
    return out, dev


def bench_headline18():
    rng = np.random.default_rng(0)
    B = int(_os.environ.get("INT8_AB_HEADLINE_B", "512"))
    x = jnp.asarray(rng.normal(size=(B, 128, 128, 5, 1))
                    .astype(np.float32)).astype(jnp.bfloat16)
    models, plist = [], []
    for conf in range(1, 19):
        cfg = ViTConfig.from_conf(conf)
        model = VisionTransformer3D(cfg, zero_head=True, vis=False)

        @jax.jit
        def init(model=model, cfg=cfg):
            dummy = jnp.zeros((1, cfg.img_size, cfg.img_size, cfg.z_size,
                               cfg.in_channels), jnp.float32)
            return jax.tree.map(
                lambda a: a.astype(jnp.bfloat16),
                model.init({"params": jax.random.key(42)},
                           dummy)["params"])

        models.append(model)
        plist.append(init())

    set_default_attention_impl("auto")
    out = {}
    for label, mlp_impl, quant in (("bf16_pallas_mlp", "pallas", "none"),
                                   ("int8", "pallas", "int8")):
        set_default_mlp_impl(mlp_impl)
        set_default_quant_impl(quant)
        fwds = []
        for model, params in zip(models, plist):

            @jax.jit
            def fwd_n(p, v, model=model):
                def body(acc, i):
                    vi = v * (1.0 + i.astype(v.dtype) * 1e-6)
                    o = model.apply({"params": p}, vi,
                                    deterministic=True).logits
                    return acc + jnp.sum(o), None

                acc, _ = jax.lax.scan(body, jnp.bfloat16(0.0),
                                      jnp.arange(ITERS))
                return acc

            float(fwd_n(params, x))
            fwds.append((fwd_n, params))
        t0 = time.perf_counter()
        accs = [f(p, x) for f, p in fwds]
        _ = sum(float(a) for a in accs)
        dt = time.perf_counter() - t0
        out[label] = round(B * ITERS / dt, 1)
    set_default_quant_impl("none")
    dev = _logit_dev(ViTConfig.from_conf(9), x[:8])
    print(json.dumps({"bench": "int8_ab_headline18", "B": B,
                      "volumes_per_sec": out,
                      "max_logit_dev_conf9": dev}))
    return out, dev


def main():
    import os

    setup_jax_cache()
    # the two regimes are separable (INT8_AB_SKIP_*=1): the stretch A/B is
    # 3 programs, the headline is 36 — split them across measurement
    # windows on a contended chip.
    if os.environ.get("INT8_AB_SKIP_STRETCH") != "1":
        bench_stretch()
    if os.environ.get("INT8_AB_SKIP_HEADLINE") != "1":
        bench_headline18()


if __name__ == "__main__":
    main()
