#!/usr/bin/env bash
# Single-entry round-end protocol: stop the sweep cleanly, verify the
# chip answers, mirror sweep state into the repo, run the measurement
# queue, and print the flagship analysis — logging exactly what it
# skipped if a step fails.  Safe to re-run; every step is idempotent or
# timeout-bounded.  Fully parameterized (no round-specific defaults):
#
#   MIRROR=docs/sweep_mirror_boot_r5.jsonl \
#   OUTPUT_DIR=/root/outputs/full_boot \
#   MEASURE_SH=tools/round5_measurements.sh tools/round_end.sh
#
# Steps:
#   0  stop the sweep supervisor + client BY PID (never by pattern)
#   1  chip probe: tiny jitted fetch, retried up to PROBE_MAX_S —
#      survives the observed TPU-worker outage mode (~55 min; RPCs time
#      out while jax.devices() still answers)
#   2  mirror sweep_state -> $MIRROR (skipped unless MIRROR is set;
#      reset-durable)
#   3  $MEASURE_SH measurement queue (skipped unless set)
#   4  tools/analyze_e2e_sweep.py -> docs/e2e_sweep_analysis.txt
#      (ANALYZE=0 to skip)
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
LOGDIR=${LOGDIR:-/tmp/endgame}
SUP_PIDFILE=${SUP_PIDFILE:-/tmp/sweep_supervisor.pid}
OUTPUT_DIR=${OUTPUT_DIR:-/root/outputs/full_e2e}
MIRROR=${MIRROR:-}           # empty -> skip the mirror step
MEASURE_SH=${MEASURE_SH:-}   # empty -> skip the measurement queue
ANALYZE=${ANALYZE:-1}
RESULT_FILES=${RESULT_FILES:-"Ensemble_CV.csv Ensemble_CV_test.csv"}
PROBE_MAX_S=${PROBE_MAX_S:-4500}
mkdir -p "$LOGDIR"
note() { echo "[round_end $(date -u +%H:%M:%S)] $*"; }

# --- 0: stop the sweep (supervisor first, then its client child) ------
if [ -f "$SUP_PIDFILE" ] && kill -0 "$(cat "$SUP_PIDFILE")" 2>/dev/null; then
  SUP=$(cat "$SUP_PIDFILE")
  # the supervisor's children are the python client AND its poll 'sleep'
  # — filter by command so we never pick the sleep (observed)
  CHILD=$(ps -o pid=,comm= --ppid "$SUP" | awk '$2 != "sleep" {print $1}' \
          | head -1)
  note "stopping sweep supervisor $SUP (child ${CHILD:-none})"
  kill "$SUP" 2>/dev/null
  sleep 2
  [ -n "${CHILD:-}" ] && kill "$CHILD" 2>/dev/null
  sleep 10
  [ -n "${CHILD:-}" ] && kill -9 "$CHILD" 2>/dev/null
else
  note "no running sweep supervisor (ok)"
fi

# --- 1: chip probe with outage-mode patience --------------------------
note "probing the chip (a tiny fetch; outage mode waits, max ${PROBE_MAX_S}s)"
t0=$(date +%s)
until timeout 120 python - <<'EOF'
import jax, jax.numpy as jnp
print(float(jax.jit(lambda x: (x * 2).sum())(jnp.ones(8))))
EOF
do
  now=$(date +%s)
  if [ $((now - t0)) -gt "$PROBE_MAX_S" ]; then
    note "SKIPPED measurements: chip did not answer within ${PROBE_MAX_S}s"
    exit 2
  fi
  note "chip not answering; retrying in 60s"
  sleep 60
done
note "chip is quiet and answering"

# --- 2: durable state mirror ------------------------------------------
if [ -n "$MIRROR" ]; then
  if python tools/mirror_sweep_state.py --state_dir "$OUTPUT_DIR/sweep_state" \
       --mirror "$MIRROR"; then
    note "sweep state mirrored -> $MIRROR ($(wc -l < "$MIRROR") lines)"
  else
    note "SKIPPED mirror (non-fatal)"
  fi
else
  note "no MIRROR set — skipping the mirror step"
fi

# --- 3: measurement queue ---------------------------------------------
if [ -n "$MEASURE_SH" ]; then
  if bash "$MEASURE_SH"; then
    note "measurement queue complete; logs in $LOGDIR"
  else
    note "measurement queue exited non-zero; partial logs in $LOGDIR"
  fi
else
  note "no MEASURE_SH set — skipping the measurement queue"
fi

# --- 3a: synthesize workbooks from markers when the driver never wrote
#     them (deadline-stopped sweep: markers hold every completed
#     combination's val+test metrics; the workbook write only happens at
#     the end of a fully completed main()) --------------------------------
first_result=${RESULT_FILES%% *}
if [ -n "$first_result" ] && [ ! -f "$OUTPUT_DIR/$first_result" ] \
    && ls "$OUTPUT_DIR"/sweep_state/${MARKER_PREFIX:-e2e}_*.json \
         >/dev/null 2>&1; then
  wb_base=${first_result%.csv}
  if timeout 300 python tools/markers_to_workbook.py \
       --output_dir "$OUTPUT_DIR" --marker_prefix "${MARKER_PREFIX:-e2e}" \
       --workbook "$wb_base"; then
    note "workbooks synthesized from markers -> $OUTPUT_DIR/$wb_base{,_test}"
  else
    note "SKIPPED workbook synthesis (non-fatal)"
  fi
fi

# --- 3b: copy durable result artifacts into the repo ------------------
for f in $RESULT_FILES; do
  if [ -f "$OUTPUT_DIR/$f" ]; then
    cp "$OUTPUT_DIR/$f" "docs/$f" && note "copied $f -> docs/"
  fi
done

# --- 4: flagship analysis ---------------------------------------------
# MARKER_PREFIX/ANALYSIS_TAG parameterize which grid is being analyzed
# (e2e CV vs bootstrap markers) and where its artifacts land, so one
# round's handoff can never overwrite another grid's committed ranking.
MARKER_PREFIX=${MARKER_PREFIX:-e2e}
ANALYSIS_TAG=${ANALYSIS_TAG:-e2e_sweep}
# a bootstrap grid is the CV grid's protocol replicate: compare rankings
# against the committed CV ranking unless the caller overrides
COMPARE_CSV=${COMPARE_CSV:-}
if [ -z "$COMPARE_CSV" ] && [ "$MARKER_PREFIX" = "boot" ] \
    && [ -f docs/e2e_sweep_ranking.csv ]; then
  COMPARE_CSV=docs/e2e_sweep_ranking.csv
fi
if [ "$ANALYZE" = "1" ]; then
  if timeout 600 python tools/analyze_e2e_sweep.py \
       --output_dir "$OUTPUT_DIR" --marker_prefix "$MARKER_PREFIX" \
       --out_csv "docs/${ANALYSIS_TAG}_ranking.csv" \
       ${COMPARE_CSV:+--compare_csv "$COMPARE_CSV"} \
       | tee "docs/${ANALYSIS_TAG}_analysis.txt"; then
    note "analysis -> docs/${ANALYSIS_TAG}_analysis.txt"
  else
    note "SKIPPED analysis (analyzer failed)"
  fi
fi

# --- optional: restart the sweep --------------------------------------
if [ "${RESTART_SWEEP:-0}" = "1" ]; then
  : "${SWEEP_CMD:?RESTART_SWEEP=1 needs SWEEP_CMD (include --resume)}"
  note "restarting the sweep with --resume"
  export LOG=${LOG:-/tmp/supervised_sweep.log}
  # shellcheck disable=SC2086
  nohup bash tools/supervised_sweep.sh $SWEEP_CMD > /dev/null 2>&1 &
  echo $! > "$SUP_PIDFILE"
  note "sweep supervisor restarted: pid $(cat "$SUP_PIDFILE")"
fi
note "round-end protocol done"
