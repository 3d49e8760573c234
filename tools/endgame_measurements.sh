#!/usr/bin/env bash
# End-of-round measurement queue — run ONLY on a quiet chip (kill the
# sweep supervisor BY PID first).  Each step is timeout-bounded so one
# hung RPC cannot eat the remaining round time.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
LOGDIR=${LOGDIR:-/tmp/endgame}
mkdir -p "$LOGDIR"

echo "=== 1/4 headline bench, current default impl ==="
timeout 900 python bench.py 2>&1 | tee "$LOGDIR/bench_default.log" | tail -1

echo "=== 2/4 headline bench, fused-layer attention ==="
BENCH_ATTENTION_IMPL=layer timeout 1500 python bench.py 2>&1 \
  | tee "$LOGDIR/bench_layer.log" | tail -1

echo "=== 2a/4 fused 18-model mega-program (one jit, CSE'd patchify) ==="
for impl in auto layer; do
  echo "--- fused18 impl=$impl ---"
  BENCH_FUSED18=1 BENCH_ATTENTION_IMPL=$impl timeout 900 python bench.py \
    2>&1 | tee -a "$LOGDIR/bench_fused18.log" | tail -1
done

echo "=== 2b/4 batch-optimum sweep (einsum vs fused-layer attention) ==="
# the measured B=512 optimum was set with scores/probs in HBM (growth
# term); the layer kernel removes it, so re-test larger batches
for b in 768 1024; do
  for impl in auto layer; do
    echo "--- B=$b impl=$impl ---"
    BENCH_B=$b BENCH_ATTENTION_IMPL=$impl timeout 900 python bench.py 2>&1 \
      | tee -a "$LOGDIR/bench_batches.log" | tail -1
  done
done

echo "=== 3/4 stretch (mlp, attention) impl grid ==="
timeout 1800 python -u benchmarks/stretch_vitb.py 2>&1 \
  | tee "$LOGDIR/stretch_grid.log" | tail -4

echo "=== 4/4 grid dropout-stream deviation (10 combos x 5 folds) ==="
# flushes a .partial file after every combo and resumes from it, so the
# timeout bounds one run, not the result; two bounded passes beat one
# long one on this tunnel (a hung RPC wastes the whole window otherwise)
for _pass in 1 2; do
  timeout 3600 python -u benchmarks/grid_dropout_deviation.py \
    --n_combos 10 --out_json docs/grid_dropout_deviation.json \
    2>&1 | tee -a "$LOGDIR/dropout_dev.log" | tail -3
  [ -f docs/grid_dropout_deviation.json ] && break
done

echo "=== done; logs in $LOGDIR ==="
