#!/usr/bin/env bash
# End-of-round measurement queue — run ONLY on a quiet chip (kill the
# sweep supervisor BY PID first; `tools/round_end.sh` does all of this).
# Each step is timeout-bounded so one hung RPC cannot eat the remaining
# round time; steps are ordered cheapest-first so an outage late in the
# queue costs the least information.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
LOGDIR=${LOGDIR:-/tmp/endgame}
mkdir -p "$LOGDIR"

echo "=== 1/6 headline bench, current default impl ==="
timeout 900 python bench.py 2>&1 | tee "$LOGDIR/bench_default.log" | tail -1

echo "=== 2/6 headline bench, fused-layer attention ==="
BENCH_ATTENTION_IMPL=layer timeout 1500 python bench.py 2>&1 \
  | tee "$LOGDIR/bench_layer.log" | tail -1

echo "=== 3/6 fused 18-model mega-program + batch-optimum sweep ==="
# mlp=xla inside the mega-program is the MXU/VPU-overlap experiment:
# XLA scheduling 18 independent models may interleave one model's GELU
# with another's matmuls — the overlap Mosaic's in-order issue forbids
# layer cells need the smaller kernel block: NB=64 OOMs scoped VMEM
# inside the mega-program (measured, see pallas_attention_layer.py)
for attn in auto layer; do
  for mlp in pallas xla; do
    echo "--- fused18 attn=$attn mlp=$mlp ---"
    BENCH_FUSED18=1 BENCH_ATTENTION_IMPL=$attn BENCH_MLP_IMPL=$mlp \
      VIT3D_ATTN_LAYER_NB=32 timeout 900 python bench.py \
      2>&1 | tee -a "$LOGDIR/bench_fused18.log" | tail -1
  done
done
# the measured B=512 optimum was set with scores/probs in HBM (growth
# term); the layer kernel removes it, so re-test larger batches
for b in 768 1024; do
  for impl in auto layer; do
    nb=64; [ "$b" = "1024" ] && nb=32   # NB=64 OOMs VMEM at B=1024
    echo "--- B=$b impl=$impl (layer NB=$nb) ---"
    BENCH_B=$b BENCH_ATTENTION_IMPL=$impl VIT3D_ATTN_LAYER_NB=$nb \
      timeout 900 python bench.py 2>&1 \
      | tee -a "$LOGDIR/bench_batches.log" | tail -1
  done
done

echo "=== 4/6 stretch (mlp, attention) impl grid ==="
timeout 1800 python -u benchmarks/stretch_vitb.py 2>&1 \
  | tee "$LOGDIR/stretch_grid.log" | tail -4

echo "=== 5/6 e2e grid TRAINING chunk A/B: einsum vs layer kernel VJP ==="
# 4 combos x 5 folds x 30 epochs per impl — does the fused sublayer
# kernel (with its recompute-through-XLA VJP) pay off in the training
# grid, or does it fail to compile under the double vmap (either answer
# closes VERDICT #7's grid-chunk question with a measurement)
for impl in auto layer; do
  echo "--- grid training impl=$impl ---"
  timeout 1200 python -u benchmarks/e2e_sweep_timing.py --modes grid \
    --n_combos 4 --epochs 30 --attention_impl "$impl" 2>&1 \
    | tee -a "$LOGDIR/grid_train_ab.log" | tail -2
done

echo "=== 6/6 grid dropout-stream deviation (10 combos x 5 folds) ==="
# flushes a .partial file after every combo and resumes from it, so the
# timeout bounds one run, not the result; two bounded passes beat one
# long one on this tunnel (a hung RPC wastes the whole window otherwise).
# STEP6_CUTOFF_UTC keeps this ~70-min step from overrunning a hard round
# boundary — partials persist for the next window either way.
CUTOFF=${STEP6_CUTOFF_UTC:-""}
for _pass in 1 2; do
  if [ -n "$CUTOFF" ] && [ "$(date -u +%s)" -ge "$(date -u -d "$CUTOFF" +%s)" ]; then
    echo "SKIPPED pass $_pass: past STEP6_CUTOFF_UTC=$CUTOFF" \
      | tee -a "$LOGDIR/dropout_dev.log"
    break
  fi
  # break on the benchmark's OWN exit status — the out_json is committed
  # to the repo, so file existence is always true and would hide a
  # timed-out pass 1 (ADVICE r4)
  if (set -o pipefail
      timeout 3600 python -u benchmarks/grid_dropout_deviation.py \
        --n_combos 10 --out_json docs/grid_dropout_deviation.json \
        2>&1 | tee -a "$LOGDIR/dropout_dev.log" | tail -3); then
    break
  fi
done

echo "=== done; logs in $LOGDIR ==="
