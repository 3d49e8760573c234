"""Stretch-goal benchmark: 3D ViT-B/16 on 128^3 volumes (BASELINE.json).

512 tokens + CLS, ~90M params — the regime where fused kernels start to
matter.  Prints throughput for XLA vs fused-Pallas MLP paths, bf16.

    PYTHONPATH=. python benchmarks/stretch_vitb.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from vit3d_ensemble_tpu.cli._common import setup_jax_cache
from vit3d_ensemble_tpu.configs import vit_b16_128cubed
from vit3d_ensemble_tpu.models import VisionTransformer3D
from vit3d_ensemble_tpu.ops.mlp import set_default_mlp_impl


def main():
    setup_jax_cache()
    cfg = vit_b16_128cubed()
    model = VisionTransformer3D(cfg, zero_head=True, vis=False)

    B = 8
    rng = np.random.default_rng(0)
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
    n_par = sum(a.size for a in jax.tree.leaves(params)) / 1e6
    print(f"ViT-B/16 128^3: {n_par:.1f}M params, {cfg.seq_len} tokens")

    from vit3d_ensemble_tpu.ops.attention import set_default_attention_impl

    iters = 20
    # Measure the full (mlp, attention) impl grid: isolated f32 attention
    # at 513 tokens favors the fused kernel 1.9x, but the full bf16 ViT-B
    # forward tells a different story (round-3 bisect of the 735 -> 691
    # regression: the old harness never set attention_impl).
    for mlp_impl, attn_impl in (("xla", "xla"), ("pallas", "xla"),
                                ("pallas", "pallas")):
        set_default_mlp_impl(mlp_impl)
        set_default_attention_impl(attn_impl)

        # All iterations inside ONE scanned program, each with an
        # input-dependent perturbation — identical repeated dispatches can
        # be memoized by the remote executor and time as ~0.
        @jax.jit
        def fwd_n(p, v):
            def body(acc, i):
                vi = v * (1.0 + i.astype(v.dtype) * 1e-6)
                out = model.apply({"params": p}, vi,
                                  deterministic=True).logits
                return acc + jnp.sum(out), None

            acc, _ = jax.lax.scan(body, jnp.bfloat16(0.0),
                                  jnp.arange(iters))
            return acc

        # block_until_ready does not synchronize over the remote tunnel —
        # a host scalar fetch does.
        float(fwd_n(params, x))
        t0 = time.perf_counter()
        float(fwd_n(params, x))
        dt = time.perf_counter() - t0
        print(f"  mlp={mlp_impl} attn={attn_impl}: "
              f"{B * iters / dt:.1f} volumes/s "
              f"({dt / iters * 1e3:.1f} ms/batch-{B})")


if __name__ == "__main__":
    main()
