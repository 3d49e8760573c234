#!/usr/bin/env bash
# Round-end babysitter: keep the 816-combo sweep alive through TPU-worker
# outages, then hand off to the round-end measurement protocol.
#
#   nohup tools/sweep_babysitter.sh > /tmp/babysitter.log 2>&1 &
#
# Loop: while before DEADLINE_UTC —
#   * supervisor alive -> sleep
#   * supervisor gone + markers >= TARGET -> round_end.sh, exit
#   * supervisor gone + incomplete -> wait for the chip to answer a tiny
#     probe (worker crash-loops recover on their own; nothing local fixes
#     them), restart the supervised sweep with --resume
# At DEADLINE_UTC: stop the sweep and run round_end.sh regardless, so the
# measurement queue always gets its window before the round closes.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
SUP_PIDFILE=${SUP_PIDFILE:-/tmp/sweep_supervisor.pid}
STATE_DIR=${STATE_DIR:-/root/outputs/full_e2e/sweep_state}
TARGET=${TARGET:-816}
DEADLINE_UTC=${DEADLINE_UTC:-"2026-08-18 01:00"}
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
  markers=$(ls "$STATE_DIR" 2>/dev/null | grep -c '\.json$' || echo 0)
  if [ "$now" -ge "$deadline_s" ]; then
    note "deadline reached with $markers/$TARGET markers — measuring now"
    bash tools/round_end.sh
    exit 0
  fi
  if [ -f "$SUP_PIDFILE" ] && kill -0 "$(cat "$SUP_PIDFILE")" 2>/dev/null; then
    sleep 60
    continue
  fi
  if [ "$markers" -ge "$TARGET" ]; then
    note "sweep complete ($markers markers) — running round_end"
    bash tools/round_end.sh
    exit 0
  fi
  note "supervisor gone at $markers/$TARGET — waiting for the chip"
  until probe_ok; do
    note "chip not answering; retrying in 120s"
    sleep 120
    [ "$(date -u +%s)" -ge "$deadline_s" ] && break
  done
  note "restarting supervised sweep with --resume"
  # E2E_CHUNK pins the combination-chunk width: the auto-sizer picked 15
  # for the small-hidden ((16,16),(16,16),(32,8)) signature and that
  # chunk deterministically crashed the TPU worker (HBM OOM kills the
  # worker instead of reporting RESOURCE_EXHAUSTED — 29 identical
  # crash-resume loops on 2026-08-17); 7 is the proven width.
  LOG=/tmp/full_e2e_r3.log STALL_S=420 nohup bash tools/supervised_sweep.sh \
    python -u -m vit3d_ensemble_tpu.cli.train_ensemble_cv --resume \
    --e2e_chunk "${E2E_CHUNK:-7}" \
    --state_mirror /root/repo/docs/sweep_mirror_r4.jsonl \
    --csv_path /root/reference/csv_files/cross_validation \
    --data_root /root/reference/dataset \
    --output_dir /root/outputs/full_e2e \
    > /dev/null 2>&1 &
  echo $! > "$SUP_PIDFILE"
  note "supervisor restarted: pid $(cat "$SUP_PIDFILE")"
  sleep 120
done
