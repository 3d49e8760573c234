#!/usr/bin/env bash
# Round-5 measurement queue — the VERDICT r4 deliverables that need the
# (quiet) chip.  Runs standalone or as round_end.sh's MEASURE_SH.  Every
# step is timeout-bounded and independently selectable:
#
#   STEPS="int8_stretch latency" tools/round5_measurements.sh   # gap window
#   tools/round5_measurements.sh                                # everything
#
# Steps:
#   int8_stretch   int8 W8A8 A/B on the MXU-bound ViT-B/16 @128^3
#   latency        serving-path latency table (BENCH_MODE=latency)
#   int8_headline  int8 A/B on the 18-ViT tile-priced headline
#   ensemble_ckpts {5,9,11} e2e CV retrain WITH per-fold checkpoints
#   stats          real-data cross-model statistics + EPS/PNG plots
#   ood            Gaussian-noise OOD eval at 3 variances, real ckpts
#   bench          headline throughput capture
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
LOGDIR=${LOGDIR:-/tmp/endgame}
STEPS=${STEPS:-"int8_stretch latency int8_headline ensemble_ckpts stats ood bench"}
REF_CSV=${REF_CSV:-/root/reference/csv_files}
REF_DATA=${REF_DATA:-/root/reference/dataset}
BASE_CKPTS=${BASE_CKPTS:-/root/outputs/northstar_r4/cv_baseline_models}
MARKER_DIR=${MARKER_DIR:-/root/outputs/full_e2e}   # e2e markers w/ test metrics
ENS_DIR=${ENS_DIR:-/root/outputs/ens_591_ckpts}
mkdir -p "$LOGDIR" docs/r5_stats
note() { echo "[r5-measure $(date -u +%H:%M:%S)] $*"; }
has() { case " $STEPS " in *" $1 "*) return 0;; *) return 1;; esac; }

if has int8_stretch; then
  note "int8 A/B: stretch ViT-B/16 @128^3"
  INT8_AB_SKIP_HEADLINE=1 timeout 2400 python benchmarks/int8_ab.py \
    | tee -a docs/int8_ab.jsonl || note "FAILED int8_stretch"
fi

if has latency; then
  note "serving latency table"
  BENCH_MODE=latency timeout 2400 python bench.py \
    | tee docs/latency.json || note "FAILED latency"
fi

if has int8_headline; then
  note "int8 A/B: 18-ViT headline"
  INT8_AB_SKIP_STRETCH=1 timeout 2400 python benchmarks/int8_ab.py \
    | tee -a docs/int8_ab.jsonl || note "FAILED int8_headline"
fi

if has ensemble_ckpts; then
  note "{5,9,11} e2e CV retrain with per-fold checkpoints -> $ENS_DIR"
  mkdir -p "$ENS_DIR"
  [ -e "$ENS_DIR/baseline_models" ] || \
    ln -s /root/outputs/full_e2e/baseline_models "$ENS_DIR/baseline_models"
  timeout 1800 python -m vit3d_ensemble_tpu.cli.train_ensemble_cv \
    --ensemble_conf_list 5,9,11 --save_ensembles \
    --csv_path "$REF_CSV/cross_validation" --data_root "$REF_DATA" \
    --output_dir "$ENS_DIR" > "$LOGDIR/ensemble_ckpts.log" 2>&1 \
    || note "FAILED ensemble_ckpts (log: $LOGDIR/ensemble_ckpts.log)"
fi

if has stats; then
  note "cross-model statistics on real data -> docs/r5_stats"
  timeout 1200 python - > "$LOGDIR/stats.log" 2>&1 <<EOF || note "FAILED stats"
import json
from vit3d_ensemble_tpu.cli import test_cv
res_base, res_ens, stats = test_cv.main([
    "--baseline", "--ensemble", "--conf", "5",
    "--ensemble_conf_list", "5,9,11",
    "--csv_path", "$REF_CSV/cross_validation", "--data_root", "$REF_DATA",
    "--output_dir", "$MARKER_DIR", "--base_path", "$BASE_CKPTS",
    "--output_path", "docs/r5_stats"])
with open("docs/r5_stats/statistics.json", "w") as f:
    json.dump({"baseline_conf5": res_base, "ensemble_5_9_11": res_ens,
               "statistics": {k: str(v) for k, v in stats.items()}},
              f, indent=1)
EOF
  tail -5 "$LOGDIR/stats.log"
fi

if has ood; then
  note "OOD (Gaussian noise) confidence degradation -> docs/r5_stats"
  timeout 2400 python - > "$LOGDIR/ood.log" 2>&1 <<EOF || note "FAILED ood"
import json
from vit3d_ensemble_tpu.cli import test_cv
out = {}
for var in (0.0, 0.5, 1.0, 2.0):
    argv = ["--baseline", "--ensemble", "--conf", "5",
            "--ensemble_conf_list", "5,9,11",
            "--csv_path", "$REF_CSV/cross_validation",
            "--data_root", "$REF_DATA",
            "--output_dir", "$ENS_DIR", "--base_path", "$BASE_CKPTS",
            "--output_path", "docs/r5_stats"]
    if var > 0.0:
        argv += ["--ood", "--ood_var", str(var)]
    res_base, res_ens, _ = test_cv.main(argv)
    out[f"var={var}"] = {"baseline_conf5": res_base,
                         "ensemble_5_9_11": res_ens}
with open("docs/r5_stats/ood_confidence.json", "w") as f:
    json.dump(out, f, indent=1)
EOF
  tail -5 "$LOGDIR/ood.log"
fi

if has bench; then
  note "headline throughput"
  timeout 1800 python bench.py | tee "$LOGDIR/bench_r5.json" \
    || note "FAILED bench"
fi
note "measurement queue done (steps: $STEPS)"
