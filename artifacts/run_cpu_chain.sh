#!/bin/bash
# Round-4 CPU chain (runs alongside run_queue11.sh, which owns the
# chip).  Single CPU core, so strictly sequential:
#   1. wait for the snap_mo_refsf_cpu continuation (already running,
#      ckpt-105000 -> 150000) to exit, then evaluate the final
#      checkpoint per test subset -> eval_out.json + EVAL_DONE marker
#      (queue11 skips the redundant chip resume once this exists);
#   2. launch the snap_moni_v3 rrmse fine-tune on CPU (40k steps from
#      the snap_moni 150k EMA warm start).  If the chip answers,
#      queue11 kills this by pidfile and resumes on chip from the
#      newest checkpoint.  Otherwise this runs until CPU_END, then the
#      newest checkpoint is evaluated so the round always lands an
#      OPTIMIZED overall-stress number (VERDICT r3 item 3).
# All CPU subprocesses strip the axon plugin from PYTHONPATH (its
# import-time client can retry-sleep on the tunnel for minutes).
set -u
CPU_ENV="PYTHONPATH=/root/repo JAX_PLATFORMS=cpu"
CPU_END=1787076000   # 18:00 UTC: stop fine-tune, evaluate what exists

log() { echo "[cpu-chain $(date -u +%H:%M:%S)] $*" >> /tmp/cpu_chain.log; }

# ---- phase 1: refsf continuation -----------------------------------
d=/root/repo/artifacts/snap_mo_refsf_cpu
REFSF_PID=$(cat $d/model/run.pid 2>/dev/null || echo 0)
if [ "$REFSF_PID" -gt 0 ]; then
  log "waiting on refsf cpu pid $REFSF_PID"
  while kill -0 $REFSF_PID 2>/dev/null; do
    if [ "$(date +%s)" -ge "$CPU_END" ]; then
      log "CPU_END reached, killing refsf"; kill $REFSF_PID; sleep 10; break
    fi
    sleep 60
  done
fi
cd $d
log "refsf evaluate starting"
env $CPU_ENV timeout 3600 python -u evaluate.py > eval_out.json 2>> run.log
rc=$?
log "refsf evaluate rc=$rc"
[ $rc -eq 0 ] && touch EVAL_DONE

# ---- phase 2: snap_moni_v3 rrmse fine-tune on CPU ------------------
d=/root/repo/artifacts/snap_moni_v3
cd $d || exit 0
if [ -f /tmp/axon_up ]; then
  log "chip is up; queue11 owns moni_v3, cpu chain exiting"
  exit 0
fi
attempt=0
while [ ! -f model/DONE ] && [ $attempt -lt 5 ] \
      && [ "$(date +%s)" -lt "$CPU_END" ]; do
  attempt=$((attempt + 1))
  log "launching moni_v3 on cpu (attempt $attempt)"
  env $CPU_ENV nohup python -u -m tensoralloy_tpu.cli run input.toml \
    >> run.log 2>&1 &
  MONI_PID=$!
  log "moni_v3 cpu pid $MONI_PID"
  while kill -0 $MONI_PID 2>/dev/null; do
    if [ "$(date +%s)" -ge "$CPU_END" ]; then
      log "CPU_END reached, killing moni_v3"; kill $MONI_PID; sleep 15
      kill -9 $MONI_PID 2>/dev/null; break
    fi
    if [ -f /tmp/axon_up ]; then
      # queue11 will kill by pidfile and take over; just stop monitoring
      log "chip came up mid-run; queue11 takes over moni_v3"
      exit 0
    fi
    sleep 60
  done
  wait $MONI_PID 2>/dev/null
  log "moni_v3 cpu attempt $attempt ended rc=$?"
  # the CLI exports snap_MoNi.npz when train_steps complete
  [ -f model/snap_MoNi.npz ] && touch model/DONE
done

# ---- phase 3: evaluate whatever checkpoint exists ------------------
if ls model/ckpt-*.npz >/dev/null 2>&1; then
  log "moni_v3 evaluate starting"
  env $CPU_ENV timeout 3600 python -u evaluate.py > eval_out.json 2>> run.log
  log "moni_v3 evaluate rc=$?"
  env $CPU_ENV timeout 3600 python -u stress_perframe.py > stress_perframe.json 2>> run.log
  log "moni_v3 stress_perframe rc=$?"
fi
log "cpu chain done"
touch /tmp/cpu_chain_done
