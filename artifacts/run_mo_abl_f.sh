#!/bin/bash
# Round-4 phase-3b: ablation F (Mo rrmse stress-objective fine-tune).
# Waits for the run_mo_ablations.sh chain (A -> B -> E -> pytest) to
# finish so the single CPU core is free, then runs F + per-group eval.
# Kill-safe: eval_steps=2500 checkpoints mean any kill leaves an
# evaluable model; HARD_KILL leaves ~25 min for evaluate_groups.
set -u
CPU_ENV="PYTHONPATH=/root/repo JAX_PLATFORMS=cpu"
HARD_KILL=1787077500   # 18:25 UTC
D=/root/repo/artifacts/snap_mo_refsf_rrmse
log() { echo "[mo-abl-f $(date -u +%H:%M:%S)] $*" >> /tmp/mo_abl_f.log; }

log "waiting for run_mo_ablations.sh chain"
while [ ! -f /tmp/mo_ablations_done ]; do
  [ "$(date +%s)" -ge "$HARD_KILL" ] && { log "HARD_KILL before chain done; abort"; exit 1; }
  sleep 120
done

log "chain done; launching ablation F"
cd "$D" || exit 1
env $CPU_ENV nohup python -u -m tensoralloy_tpu.cli run input.toml >> run.log 2>&1 &
PID=$!
echo $PID > /tmp/mo_abl_f.pid
while kill -0 $PID 2>/dev/null; do
  now=$(date +%s)
  if [ "$now" -ge "$HARD_KILL" ]; then
    log "HARD_KILL reached, killing $PID"; kill $PID; sleep 15
    kill -9 $PID 2>/dev/null; break
  fi
  mtime=$(stat -c %Y run.log 2>/dev/null || echo "$now")
  if [ $((now - mtime)) -gt 2400 ]; then
    log "stall watchdog killing $PID"; kill $PID; sleep 15
    kill -9 $PID 2>/dev/null; break
  fi
  sleep 60
done
wait $PID 2>/dev/null
log "F ended rc=$?"
if ls "$D"/model/ckpt-*.npz >/dev/null 2>&1; then
  log "evaluating F per group"
  env $CPU_ENV timeout 2400 python -u /root/repo/artifacts/evaluate_groups.py "$D" \
    >> "$D/run.log" 2>&1
  log "evaluate_groups rc=$?"
fi
touch /tmp/mo_abl_f_done
log "done"
