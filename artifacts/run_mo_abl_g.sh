#!/bin/bash
# Round-4 phase-3c: ablation G (Mo l2-regularization fine-tune, the
# CPU proxy for chip-blocked ablation D). Waits for ablation F's
# watcher (/tmp/mo_abl_f_done), then runs G + per-group eval.
set -u
CPU_ENV="PYTHONPATH=/root/repo JAX_PLATFORMS=cpu"
HARD_KILL=1787078700   # 18:45 UTC — eval needs ~5 min, round ends 19:06
D=/root/repo/artifacts/snap_mo_refsf_l2ft
log() { echo "[mo-abl-g $(date -u +%H:%M:%S)] $*" >> /tmp/mo_abl_g.log; }

log "waiting for ablation F"
while [ ! -f /tmp/mo_abl_f_done ]; do
  [ "$(date +%s)" -ge "$HARD_KILL" ] && { log "HARD_KILL before F done; abort"; exit 1; }
  sleep 120
done

log "F done; launching ablation G"
cd "$D" || exit 1
env $CPU_ENV nohup python -u -m tensoralloy_tpu.cli run input.toml >> run.log 2>&1 &
PID=$!
echo $PID > /tmp/mo_abl_g.pid
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
log "G ended rc=$?"
if ls "$D"/model/ckpt-*.npz >/dev/null 2>&1; then
  log "evaluating G per group"
  env $CPU_ENV timeout 2400 python -u /root/repo/artifacts/evaluate_groups.py "$D" \
    >> "$D/run.log" 2>&1
  log "evaluate_groups rc=$?"
fi
touch /tmp/mo_abl_g_done
log "done"
