"""Warm the persistent XLA cache for the end-of-round measurement queue.

AOT .lower().compile() (no execution, no output fetch) of every program
`tools/endgame_measurements.sh` will run: the 18 exact-shape bench
programs under each attention impl to measure, and the stretch ViT-B
(mlp, attention) grid.  Compilation is worker-host CPU work, so it can
overlap a running sweep's device executions; executions tonight then hit
`~/.cache/vit3d_tpu_xla` warm instead of paying 18+ cold compiles inside
the measurement window.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/precompile_endgame.py
"""

from __future__ import annotations

import time


def bench_programs(attn_impl: str, B: int = 512) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vit3d_ensemble_tpu.configs import ViTConfig
    from vit3d_ensemble_tpu.models import VisionTransformer3D
    from vit3d_ensemble_tpu.ops.attention import set_default_attention_impl
    from vit3d_ensemble_tpu.ops.mlp import set_default_mlp_impl

    set_default_mlp_impl("pallas")
    set_default_attention_impl(attn_impl)

    iters = 20
    x = jax.ShapeDtypeStruct((B, 128, 128, 5, 1), jnp.bfloat16)
    for conf in range(1, 19):
        cfg = ViTConfig.from_conf(conf)
        model = VisionTransformer3D(cfg, zero_head=True, vis=False)
        params = jax.eval_shape(
            lambda m=model, c=cfg: jax.tree.map(
                lambda a: a.astype(jnp.bfloat16),
                m.init({"params": jax.random.key(42)},
                       jnp.zeros((1, c.img_size, c.img_size, c.z_size,
                                  c.in_channels), jnp.float32))["params"]))

        def fwd_n(p, vols, model=model):
            def body(acc, i):
                vi = vols * (1.0 + i.astype(vols.dtype) * 1e-6)
                out = model.apply({"params": p}, vi,
                                  deterministic=True).logits
                return acc + jnp.sum(out), None

            acc, _ = jax.lax.scan(body, jnp.bfloat16(0.0),
                                  jnp.arange(iters))
            return acc

        def init(model=model, c=cfg):
            dummy = jnp.zeros((1, c.img_size, c.img_size, c.z_size,
                               c.in_channels), jnp.float32)
            return model.init({"params": jax.random.key(42)},
                              dummy)["params"]

        t0 = time.perf_counter()
        # bench.py compiles BOTH programs per config: the f32 init (its
        # dummy forward traces the same impl settings) and the scanned
        # inference body (advisor round-3: the inits were the unwarmed
        # cold compiles inside the bench timeout window).
        jax.jit(init).lower().compile()
        jax.jit(fwd_n).lower(params, x).compile()
        print(f"  bench conf{conf} attn={attn_impl} B={B}: "
              f"{time.perf_counter() - t0:.1f}s", flush=True)


def stretch_programs() -> None:
    import jax
    import jax.numpy as jnp

    from vit3d_ensemble_tpu.configs import vit_b16_128cubed
    from vit3d_ensemble_tpu.models import VisionTransformer3D
    from vit3d_ensemble_tpu.ops.attention import set_default_attention_impl
    from vit3d_ensemble_tpu.ops.mlp import set_default_mlp_impl

    cfg = vit_b16_128cubed()
    model = VisionTransformer3D(cfg, zero_head=True, vis=False)
    B, iters = 8, 20
    x = jax.ShapeDtypeStruct((B, 128, 128, 128, 1), jnp.bfloat16)
    params = jax.eval_shape(
        lambda: jax.tree.map(
            lambda a: a.astype(jnp.bfloat16),
            model.init({"params": jax.random.key(0)},
                       jnp.zeros((1, 128, 128, 128, 1),
                                 jnp.bfloat16))["params"]))

    for mlp_impl, attn_impl in (("xla", "xla"), ("pallas", "xla"),
                                ("pallas", "pallas")):
        set_default_mlp_impl(mlp_impl)
        set_default_attention_impl(attn_impl)

        def fwd_n(p, v):
            def body(acc, i):
                vi = v * (1.0 + i.astype(v.dtype) * 1e-6)
                out = model.apply({"params": p}, vi,
                                  deterministic=True).logits
                return acc + jnp.sum(out), None

            acc, _ = jax.lax.scan(body, jnp.bfloat16(0.0),
                                  jnp.arange(iters))
            return acc

        t0 = time.perf_counter()
        jax.jit(fwd_n).lower(params, x).compile()
        print(f"  stretch mlp={mlp_impl} attn={attn_impl}: "
              f"{time.perf_counter() - t0:.1f}s", flush=True)


def fused18_programs(attn_impl: str, B: int = 512,
                     mlp_impl: str = "pallas") -> None:
    """The BENCH_FUSED18=1 mega-program: all 18 exact-shape forwards in
    one jit (bench.py `fwd_all`).  mlp_impl='xla' is the MXU/VPU-overlap
    experiment: XLA scheduling 18 independent models may interleave one
    model's GELU with another's matmuls, which Mosaic's in-order issue
    forbids inside the fused kernel."""
    import jax
    import jax.numpy as jnp

    from vit3d_ensemble_tpu.configs import ViTConfig
    from vit3d_ensemble_tpu.models import VisionTransformer3D
    from vit3d_ensemble_tpu.ops.attention import set_default_attention_impl
    from vit3d_ensemble_tpu.ops.mlp import set_default_mlp_impl

    set_default_mlp_impl(mlp_impl)
    set_default_attention_impl(attn_impl)

    iters = 20
    x = jax.ShapeDtypeStruct((B, 128, 128, 5, 1), jnp.bfloat16)
    models, pshapes = [], []
    for conf in range(1, 19):
        cfg = ViTConfig.from_conf(conf)
        model = VisionTransformer3D(cfg, zero_head=True, vis=False)
        models.append(model)
        pshapes.append(jax.eval_shape(
            lambda m=model, c=cfg: jax.tree.map(
                lambda a: a.astype(jnp.bfloat16),
                m.init({"params": jax.random.key(42)},
                       jnp.zeros((1, c.img_size, c.img_size, c.z_size,
                                  c.in_channels), jnp.float32))["params"])))

    def fwd_all(ps, vols):
        def body(acc, i):
            vi = vols * (1.0 + i.astype(vols.dtype) * 1e-6)
            tot = jnp.bfloat16(0.0)
            for model, p in zip(models, ps):
                tot = tot + jnp.sum(model.apply(
                    {"params": p}, vi, deterministic=True).logits)
            return acc + tot, None

        acc, _ = jax.lax.scan(body, jnp.bfloat16(0.0), jnp.arange(iters))
        return acc

    t0 = time.perf_counter()
    jax.jit(fwd_all).lower(pshapes, x).compile()
    print(f"  fused18 attn={attn_impl} mlp={mlp_impl} B={B}: "
          f"{time.perf_counter() - t0:.1f}s", flush=True)


def deviation_programs(n_combos: int = 10) -> None:
    """Warm the SEQUENTIAL ensemble training programs the dropout-
    deviation benchmark will run (advisor round-3: these were the unwarmed
    cold compiles that could blow its timeout).  The benchmark's default
    combo sample is deterministic (`default_deviation_combos`), so the
    exact programs are known before it runs: one
    `_ensemble_run_fn((cfg1, cfg2, cfg3), 1e-4, False)` per distinct
    combo config-tuple at the CV fold shapes (72 train / 18 val,
    100 epochs, B=4)."""
    import os
    import sys
    import time as _t

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from benchmarks.grid_dropout_deviation import default_deviation_combos
    from vit3d_ensemble_tpu.configs import ViTConfig
    from vit3d_ensemble_tpu.models import TransformerEnsemble
    from vit3d_ensemble_tpu.train.ensemble_trainer import _ensemble_run_fn

    E, S, B, N, V = 100, 18, 4, 72, 18
    f32 = jnp.float32
    for name in default_deviation_combos(n_combos):
        cfgs = tuple(ViTConfig.from_conf(int(c)) for c in name.split("_"))
        model = TransformerEnsemble(cfgs)
        c0 = cfgs[0]
        dummy = jax.ShapeDtypeStruct((1, c0.img_size, c0.img_size,
                                      c0.z_size, c0.in_channels), f32)
        pshapes = jax.eval_shape(
            lambda d: model.init({"params": jax.random.key(0)}, d)["params"],
            dummy)
        run = _ensemble_run_fn(cfgs, 1e-4, False)
        vol = (N,) + dummy.shape[1:]
        t0 = _t.perf_counter()
        run.lower(
            pshapes,
            jax.ShapeDtypeStruct(vol, f32),
            jax.ShapeDtypeStruct((N,), f32),
            jax.ShapeDtypeStruct((V,) + dummy.shape[1:], f32),
            jax.ShapeDtypeStruct((V,), f32),
            jax.ShapeDtypeStruct((E, S, B), jnp.int32),
            jax.ShapeDtypeStruct((E, S, B), f32),
            jax.random.key(42), ()).compile()
        print(f"  deviation {name}: {_t.perf_counter() - t0:.1f}s",
              flush=True)


def main() -> None:
    import argparse

    from vit3d_ensemble_tpu.cli._common import setup_jax_cache

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="",
                    help="comma list: bench-auto,bench-layer,stretch,"
                         "deviation")
    args = ap.parse_args()
    only = set(filter(None, args.only.split(",")))
    setup_jax_cache()

    if not only or "bench-auto" in only:
        print("bench programs, default impl", flush=True)
        bench_programs("auto")
    if not only or "bench-layer" in only:
        print("bench programs, fused-layer attention", flush=True)
        bench_programs("layer")
    if not only or "stretch" in only:
        print("stretch impl grid", flush=True)
        stretch_programs()
    if not only or "deviation" in only:
        print("dropout-deviation sequential training programs", flush=True)
        deviation_programs()
    import os as _os

    if "bench-batches" in only:
        # batch-optimum re-test under the layer kernel (BENCH_B knob):
        # opt-in only — 4 x 18 programs of compile.  The layer kernel's
        # NB=64 block OOMs scoped VMEM at B=1024 (measured) — match the
        # endgame script's NB=32 there.
        for b in (768, 1024):
            _os.environ["VIT3D_ATTN_LAYER_NB"] = "32" if b >= 1024 else "64"
            for impl in ("auto", "layer"):
                print(f"bench programs, attn={impl}, B={b}", flush=True)
                bench_programs(impl, B=b)
        _os.environ.pop("VIT3D_ATTN_LAYER_NB", None)
    if "fused18" in only:
        # inside the mega-program even B=512 needs the smaller block
        _os.environ["VIT3D_ATTN_LAYER_NB"] = "32"
        for attn in ("auto", "layer"):
            for mlp in ("pallas", "xla"):
                print(f"fused18 mega-program, attn={attn} mlp={mlp}",
                      flush=True)
                fused18_programs(attn, mlp_impl=mlp)
        _os.environ.pop("VIT3D_ATTN_LAYER_NB", None)
    print("precompile done", flush=True)


if __name__ == "__main__":
    main()
