"""AOT-warm the e2e-grid programs the endgame's grid-training A/B runs
(`benchmarks/e2e_sweep_timing.py --modes grid --n_combos 4 --epochs 30`,
attention impl auto AND layer).

The A/B's 4 combos (1_2_3, 1_2_4, 1_2_5, 1_2_6) span 3 class signatures
with chunk widths 2/1/1 — different program shapes from the full sweep's
chunk-7 programs, so without this pass the A/B pays ~6-18 cold compiles
inside its measurement window.  Also answers, before any chip time is
spent, whether the layer kernel (Mosaic, under the grid's double vmap +
scan + remat) COMPILES at all — the grid pins the Pallas MLP off for
exactly that failure mode.

    python tools/precompile_grid_ab.py [--epochs 30]
"""

from __future__ import annotations

import argparse
import time


def warm(attn_impl: str, epochs: int) -> None:
    import jax
    import jax.numpy as jnp

    from vit3d_ensemble_tpu.configs import ViTConfig
    from vit3d_ensemble_tpu.models import TransformerEnsemble
    from vit3d_ensemble_tpu.ops.attention import set_default_attention_impl
    from vit3d_ensemble_tpu.ops.mlp import set_default_mlp_impl
    from vit3d_ensemble_tpu.sweep.e2e_grid import (
        SEGMENT_EPOCHS,
        _grid_programs,
        plan_combo,
        signature_of,
    )
    from vit3d_ensemble_tpu.train.ensemble_trainer import (
        pad_members_to_templates,
    )

    set_default_mlp_impl("xla")      # the grid pins this (run_e2e_grid)
    set_default_attention_impl(attn_impl)

    combos = [(1, 2, 3), (1, 2, 4), (1, 2, 5), (1, 2, 6)]
    by_sig = {}
    for comb in combos:
        p = plan_combo(comb)
        by_sig.setdefault(signature_of(p), []).append(p)

    F, N, V, S, B = 5, 72, 18, 18, 4
    f32 = jnp.float32
    sds = jax.ShapeDtypeStruct
    vol = (128, 128, 5, 1)
    seg_e = min(SEGMENT_EPOCHS, epochs)

    def template_cfg(conf: int) -> ViTConfig:
        cfg = ViTConfig.from_conf(conf)
        return pad_members_to_templates([cfg], [_empty_member(cfg)])[0][0]

    def _empty_member(cfg):
        model = TransformerEnsemble((cfg,))
        shapes = jax.eval_shape(
            lambda: model.init({"params": jax.random.key(0)},
                               jnp.zeros((1,) + vol))["params"])
        return jax.tree.map(lambda a: jnp.zeros(a.shape, a.dtype),
                            shapes["transformer_0"])

    cfg_by_class = {}
    for conf in (1, 2, 3):
        cfg_by_class[signature_of(plan_combo((conf,) * 3))[0]] = \
            template_cfg(conf)

    for sig, plans in by_sig.items():
        width = len(plans)
        sig_cfgs = tuple(cfg_by_class[cls] for cls in sig)
        init_fn, segment_fn, finalize_fn = _grid_programs(
            sig_cfgs, 1e-4, False, False, guarded=False)
        model = TransformerEnsemble(sig_cfgs, remat=True)
        pshapes = jax.eval_shape(
            lambda m=model: m.init({"params": jax.random.key(0)},
                                   jnp.zeros((1,) + vol))["params"])
        pstack = jax.tree.map(
            lambda a: sds((width,) + a.shape, a.dtype), pshapes)
        data = (sds((width, 3, 2), jnp.int32), sds((F, N) + vol, f32),
                sds((F, N), f32), sds((F, V) + vol, f32), sds((F, V), f32),
                sds((F, V), f32), sds((F, 1) + vol, f32))
        t0 = time.perf_counter()
        init_l = init_fn.lower(pstack, *data, jax.random.key(42))
        init_l.compile()
        carry = jax.eval_shape(init_fn, pstack, *data, jax.random.key(42))
        seg_args = (sds((F, seg_e, S, B), jnp.int32),
                    sds((F, seg_e, S, B), f32))
        segment_fn.lower(carry, *data, *seg_args).compile()
        finalize_fn.lower(carry, *data).compile()
        print(f"  sig {sig} width {width} attn={attn_impl}: "
              f"{time.perf_counter() - t0:.1f}s", flush=True)


def main():
    from vit3d_ensemble_tpu.cli._common import setup_jax_cache

    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--impls", default="auto,layer")
    args = ap.parse_args()
    setup_jax_cache()
    for impl in args.impls.split(","):
        print(f"grid A/B programs, attn={impl}", flush=True)
        warm(impl, args.epochs)
    print("precompile done", flush=True)


if __name__ == "__main__":
    main()
