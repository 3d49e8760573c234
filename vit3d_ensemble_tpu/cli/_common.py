"""Shared CLI plumbing for the driver scripts.

The reference defines ~15 argparse flags per driver with slightly drifting
defaults (`train_baseline_cv.py:222-263`, `train_baseline_whole_dataset.py:
241-279`, ...); this module centralizes them with the reference's names and
defaults, typed correctly (the reference's ensemble drivers forget `type=int`
on numeric flags — SURVEY.md §5 config system).
"""

from __future__ import annotations

import argparse
import logging
import os


def setup_logging() -> None:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )
    setup_jax_cache()


def setup_jax_cache() -> None:
    """Enable the persistent XLA compilation cache so repeated driver runs
    skip the (20-40s per program) TPU compile."""
    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "vit3d_tpu_xla"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def add_common_flags(parser: argparse.ArgumentParser,
                     csv_subdir: str = "cross_validation") -> None:
    parser.add_argument("--name", default="prostateX",
                        help="Name of this run. Used for monitoring.")
    parser.add_argument("--dataset", choices=["prostateX"],
                        default="prostateX", help="Which downstream task.")
    parser.add_argument("--num_classes", type=int, default=1,
                        help="Number of output classes.")
    parser.add_argument("--output_dir", type=str,
                        default=os.path.join(os.getcwd(), "output"),
                        help="The output directory for checkpoints.")
    parser.add_argument("--csv_path",
                        default=os.path.join(os.getcwd(), "csv_files",
                                             csv_subdir),
                        help="Path where csv files are stored.")
    parser.add_argument("--data_root",
                        default=os.path.join(os.getcwd(), "dataset"),
                        help="Directory with per-patient image folders "
                             "(the reference hard-codes cwd/dataset, "
                             "create_dataset.py:22).")
    parser.add_argument("--img_size", "--image_size", default=128, type=int,
                        help="Resolution size (the reference's ensemble "
                             "drivers spell this --image_size, "
                             "train_ensemble_cv.py:238 — both accepted).")
    parser.add_argument("--device", default=None,
                        help="Accepted for reference CLI parity and "
                             "ignored: JAX owns device placement (the "
                             "reference's torch drivers take cuda/cpu, "
                             "train_baseline_cv.py:261-262).")
    parser.add_argument("--train_batch_size", default=4, type=int,
                        help="Total batch size for training.")
    parser.add_argument("--eval_batch_size", default=1, type=int,
                        help="Total batch size for eval (kept for CLI "
                             "parity; eval runs as one batched forward).")
    parser.add_argument("--seed", type=int, default=42,
                        help="random seed for initialization")
    parser.add_argument("--aug_mode", choices=["disk", "device", "none"],
                        default="disk",
                        help="Augmentation source: precomputed folders "
                             "(reference parity) or on-device transforms.")
    parser.add_argument("--attention_impl",
                        choices=["auto", "xla", "vpu", "pallas", "layer"],
                        default="auto",
                        help="Attention path: 'auto'/'xla' = the einsum "
                             "path (measured fastest end-to-end at the "
                             "65-token regime); 'vpu' = broadcast-"
                             "multiply-reduce contractions (experiments); "
                             "'pallas' = the fused VMEM kernel, which "
                             "wins 1.9x at the 513-token stretch regime; "
                             "'layer' = the whole-sublayer fused kernel "
                             "(QKV->softmax->out in one VMEM residency; "
                             "inference paths only).")
    parser.add_argument("--mlp_impl", choices=["xla", "pallas"],
                        default="xla",
                        help="FFN path: XLA matmuls or the fused Pallas "
                             "MLP kernel (deterministic paths only; ~3x "
                             "at reference widths).")
    parser.add_argument("--quant_impl",
                        choices=["none", "int8", "int8_attn"],
                        default="none",
                        help="Quantized inference: 'int8' = dynamic W8A8 "
                             "attention projections + MLP; 'int8_attn' = "
                             "attention projections only, keeping the "
                             "fused bf16 Pallas MLP (the measured stretch "
                             "optimum, docs/int8_ab.jsonl).  Deterministic "
                             "(eval/serving) forwards only — training "
                             "math is never quantized (ops/quant.py).")
    parser.add_argument("--profile_dir", default=None,
                        help="Write a Perfetto/XProf device trace of the "
                             "run to this directory.")
    parser.add_argument("--debug_nans", action="store_true",
                        help="Raise on any NaN produced under jit "
                             "(jax_debug_nans).")
    parser.add_argument("--mesh", default=None,
                        help="Multi-chip mesh 'MODELxDATA' (e.g. 2x4 on a "
                             "v4-8) or 'auto' (all visible devices). The "
                             "sweep shards (config, fold) work across chips;"
                             " default is single-chip.")
    parser.add_argument("--resume", action="store_true",
                        help="Resume a preempted sweep: skip groups whose "
                             "results are recorded under output_dir/"
                             "sweep_state/, and continue mid-group from the "
                             "last --snapshot_every state snapshot.")
    parser.add_argument("--snapshot_every", type=int, default=0,
                        help="Snapshot full sweep train state (params + "
                             "optimizer + best) every N eval periods for "
                             "preemption recovery; 0 disables (whole group "
                             "is one device program).")
    parser.add_argument("--remat",
                        action=argparse.BooleanOptionalAction, default=False,
                        help="Rematerialize encoder blocks in the backward "
                             "pass (jax.checkpoint).  Numerics-identical; "
                             "trades recompute FLOPs for not keeping each "
                             "layer's saved activations — faster compiles "
                             "and much lower HBM at these shapes.")


def apply_runtime_flags(args) -> None:
    from vit3d_ensemble_tpu.ops.attention import set_default_attention_impl
    from vit3d_ensemble_tpu.ops.mlp import set_default_mlp_impl

    from vit3d_ensemble_tpu.ops.quant import set_default_quant_impl

    set_default_attention_impl(getattr(args, "attention_impl", "auto"))
    set_default_mlp_impl(getattr(args, "mlp_impl", "xla"))
    set_default_quant_impl(getattr(args, "quant_impl", "none"))
    if getattr(args, "debug_nans", False):
        from vit3d_ensemble_tpu.utils.debug import enable_nan_checking

        enable_nan_checking()


def add_baseline_flags(parser: argparse.ArgumentParser,
                       eval_every: int, num_steps: int) -> None:
    parser.add_argument("--config", type=int, default=5,
                        help="Which configuration to use.")
    parser.add_argument("--all_configs", action="store_true",
                        help="Train ALL 18 baseline configs as one vmapped "
                             "multi-model batch (TPU sweep mode).")
    parser.add_argument("--eval_every", default=eval_every, type=int,
                        help="Run prediction on validation set every so "
                             "many steps.")
    parser.add_argument("--learning_rate", default=1e-4, type=float,
                        help="The initial learning rate for SGD.")
    parser.add_argument("--weight_decay", default=1e-2, type=float,
                        help="Weight decay if we apply some.")
    parser.add_argument("--num_steps", default=num_steps, type=int,
                        help="Total number of training steps to perform.")
    parser.add_argument("--decay_type", choices=["cosine", "linear"],
                        default="cosine",
                        help="How to decay the learning rate.")
    parser.add_argument("--warmup_steps", default=1000, type=int,
                        help="Step of training to perform learning rate "
                             "warmup for. (NOTE: the reference default "
                             "exceeds num_steps — defect D17 — and is "
                             "kept for parity.)")
    parser.add_argument("--gradient_accumulation_steps", type=int, default=1,
                        help="Number of update steps to accumulate before "
                             "an update pass.")


def parse_conf_list(s: str):
    """--ensemble_conf_list '5,9,11' -> (5, 9, 11)
    (`train_ensemble_whole_dataset.py:191-200`)."""
    return tuple(int(tok) for tok in str(s).split(",") if tok.strip())
