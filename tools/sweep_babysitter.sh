#!/usr/bin/env bash
# Long-sweep babysitter: keep a grid sweep alive through TPU-worker
# outages, then hand off to the round-end protocol at completion or at a
# hard deadline.  Fully parameterized — launching a new round's sweep
# needs zero script edits:
#
#   DEADLINE_UTC="2026-08-18 12:45" TARGET=816 \
#   STATE_DIR=/root/outputs/full_boot/sweep_state MARKER_GLOB='boot_*.json' \
#   SWEEP_CMD="python -u -m vit3d_ensemble_tpu.cli.train_ensemble_bootstrap \
#     --resume --e2e_chunk 7 --state_mirror /root/repo/docs/mirror.jsonl \
#     --csv_path ... --data_root ... --output_dir ..." \
#   nohup tools/sweep_babysitter.sh > /tmp/babysitter.log 2>&1 &
#
# Loop: while before DEADLINE_UTC —
#   * supervisor alive -> sleep
#   * supervisor gone + markers >= TARGET -> HANDOFF_CMD, exit
#   * supervisor gone + incomplete -> wait for the chip to answer a tiny
#     probe (worker crash-loops recover on their own; nothing local fixes
#     them), restart the supervised sweep via SWEEP_CMD (must carry
#     --resume so at most one chunk repeats)
# At DEADLINE_UTC: stop nothing ourselves — run HANDOFF_CMD (which stops
# the sweep by pid) so the measurement queue always gets its window.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
SUP_PIDFILE=${SUP_PIDFILE:-/tmp/sweep_supervisor.pid}
STATE_DIR=${STATE_DIR:-/root/outputs/full_e2e/sweep_state}
MARKER_GLOB=${MARKER_GLOB:-*.json}
TARGET=${TARGET:-816}
# DEADLINE_UTC is REQUIRED: a stale default once made a fresh babysitter
# fire the round-end handoff immediately (ADVICE r4).
DEADLINE_UTC=${DEADLINE_UTC:?set DEADLINE_UTC, e.g. "2026-08-18 12:45"}
SWEEP_CMD=${SWEEP_CMD:?set SWEEP_CMD to the sweep client command (include --resume)}
HANDOFF_CMD=${HANDOFF_CMD:-bash tools/round_end.sh}
STALL_S=${STALL_S:-420}
LOG=${LOG:-/tmp/supervised_sweep.log}
deadline_s=$(date -u -d "$DEADLINE_UTC" +%s)
note() { echo "[babysitter $(date -u +%H:%M:%S)] $*"; }

probe_ok() {
  timeout 120 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
print(float(jax.jit(lambda x: (x * 2).sum())(jnp.ones(8))))
EOF
}

while true; do
  now=$(date -u +%s)
  markers=$(find "$STATE_DIR" -maxdepth 1 -name "$MARKER_GLOB" 2>/dev/null \
            | wc -l)
  if [ "$now" -ge "$deadline_s" ]; then
    note "deadline reached with $markers/$TARGET markers — handing off"
    $HANDOFF_CMD
    exit 0
  fi
  if [ -f "$SUP_PIDFILE" ] && kill -0 "$(cat "$SUP_PIDFILE")" 2>/dev/null; then
    sleep 60
    continue
  fi
  if [ "$markers" -ge "$TARGET" ]; then
    note "sweep complete ($markers markers) — handing off"
    $HANDOFF_CMD
    exit 0
  fi
  note "supervisor gone at $markers/$TARGET — waiting for the chip"
  until probe_ok; do
    note "chip not answering; retrying in 120s"
    sleep 120
    [ "$(date -u +%s)" -ge "$deadline_s" ] && break
  done
  note "restarting supervised sweep with --resume"
  # shellcheck disable=SC2086  # SWEEP_CMD is a flat command string
  LOG="$LOG" STALL_S="$STALL_S" nohup bash tools/supervised_sweep.sh \
    $SWEEP_CMD > /dev/null 2>&1 &
  echo $! > "$SUP_PIDFILE"
  note "supervisor restarted: pid $(cat "$SUP_PIDFILE")"
  sleep 120
done
