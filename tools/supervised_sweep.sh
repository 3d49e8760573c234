#!/usr/bin/env bash
# Stall-supervised long-sweep runner for the remote-TPU tunnel.
#
# Device RPCs over this tunnel can occasionally hang forever client-side
# (observed during the 816-combo e2e sweep: the worker stays healthy but
# one execution never returns).  Every sweep driver writes per-unit
# resume markers, so the safe recovery is: detect no log progress for
# STALL_S seconds, kill the client BY PID (never by pattern), restart
# with --resume — at most one chunk of work is repeated.
#
# Usage:
#   LOG=/tmp/sweep.log STALL_S=720 tools/supervised_sweep.sh \
#       python -m vit3d_ensemble_tpu.cli.train_ensemble_cv --end_to_end \
#       --resume ... other flags ...
set -u
LOG=${LOG:-/tmp/supervised_sweep.log}
STALL_S=${STALL_S:-720}
POLL_S=${POLL_S:-60}
MAX_RESTARTS=${MAX_RESTARTS:-50}

restarts=0
while true; do
  "$@" >> "$LOG" 2>&1 &
  PID=$!
  echo "supervisor: started pid $PID (restart $restarts)" >> "$LOG"
  while kill -0 "$PID" 2>/dev/null; do
    sleep "$POLL_S"
    now=$(date +%s)
    mtime=$(stat -c %Y "$LOG" 2>/dev/null || echo "$now")
    if [ $((now - mtime)) -gt "$STALL_S" ]; then
      echo "supervisor: no progress for $((now - mtime))s; killing $PID" \
        >> "$LOG"
      kill "$PID" 2>/dev/null
      sleep "${KILL_GRACE_S:-20}"
      kill -9 "$PID" 2>/dev/null
      break
    fi
  done
  wait "$PID"
  RC=$?
  if [ "$RC" -eq 0 ]; then
    echo "supervisor: completed" >> "$LOG"
    break
  fi
  restarts=$((restarts + 1))
  if [ "$restarts" -ge "$MAX_RESTARTS" ]; then
    echo "supervisor: giving up after $restarts restarts (rc=$RC)" >> "$LOG"
    exit "$RC"
  fi
  echo "supervisor: restarting after rc=$RC" >> "$LOG"
  sleep "${RESTART_DELAY_S:-30}"
done
