#!/bin/bash
# CPU chain for the extended round-4 window: waits for the D-lite run
# (/tmp/mo_dlite.pid) to finish, evaluates it at matched steps, then
# trains ML-EAM Ni and ML-ADP Mo (the two BASELINE.md accuracy rows
# never trained in this framework) and evaluates each. Coordinates
# with run_queue14.sh: if the chip takes over and kills dlite, this
# chain still proceeds with whatever checkpoints exist.
set -u
END_TS=1787127000
HARD_STOP=$((END_TS - 2700))
CPU_ENV="JAX_PLATFORMS=cpu PYTHONPATH=/root/repo"
log() { echo "[mleam-chain $(date -u +%H:%M:%S)] $*" >> /tmp/mleam_chain.log; }

# ---- wait for dlite ------------------------------------------------
while [ -f /tmp/mo_dlite.pid ] && kill -0 "$(cat /tmp/mo_dlite.pid)" 2>/dev/null; do
  [ "$(date +%s)" -ge "$HARD_STOP" ] && { log "window over while dlite runs"; exit 0; }
  sleep 120
done
log "dlite ended"

# ---- evaluate dlite at final + matched steps -----------------------
d=/root/repo/artifacts/snap_mo_refsf_dlite
if ls $d/model/ckpt-*.npz >/dev/null 2>&1; then
  env -u PYTHONPATH $(echo $CPU_ENV) timeout 1800 \
    python -u -m tensoralloy_tpu.cli evaluate $d >> $d/run.log 2>&1
  log "dlite evaluate (newest) rc=$?"
  for s in 15000 30000 45000; do
    [ -f $d/model/ckpt-$s.npz ] || continue
    env -u PYTHONPATH $(echo $CPU_ENV) timeout 1800 \
      python -u -m tensoralloy_tpu.cli evaluate $d \
      --ckpt $d/model/ckpt-$s.npz --output group_maes_ckpt$s.json \
      >> $d/run.log 2>&1
    log "dlite evaluate ckpt-$s rc=$?"
  done
fi
touch /tmp/dlite_eval_done

# ---- ML-EAM Ni then ML-ADP Mo --------------------------------------
for tag in "mleam_ni:snap_Ni_mleam.npz" "mladp_mo:snap_Mo_mladp.npz"; do
  d=/root/repo/artifacts/${tag%%:*}; exp=${tag##*:}
  [ "$(date +%s)" -ge "$((HARD_STOP - 1800))" ] && { log "no time for ${tag%%:*}"; break; }
  [ -f $d/model/DONE ] && continue
  attempt=0
  while [ ! -f "$d/model/$exp" ] && [ $attempt -lt 3 ] \
        && [ "$(date +%s)" -lt "$((HARD_STOP - 1800))" ]; do
    attempt=$((attempt+1))
    log "${tag%%:*} training attempt $attempt"
    cd $d
    env -u PYTHONPATH $(echo $CPU_ENV) nohup python -u -m tensoralloy_tpu.cli \
      run input.toml >> run.log 2>&1 &
    RUNPID=$!
    echo $RUNPID > /tmp/mleam_current.pid
    while kill -0 $RUNPID 2>/dev/null; do
      now=$(date +%s)
      if [ "$now" -ge "$((HARD_STOP - 600))" ]; then kill $RUNPID; sleep 10; break; fi
      mtime=$(stat -c %Y run.log)
      if [ $((now - mtime)) -gt 1800 ]; then
        log "stall watchdog kills ${tag%%:*}"
        kill $RUNPID; sleep 10; kill -9 $RUNPID 2>/dev/null; break
      fi
      sleep 60
    done
    wait $RUNPID 2>/dev/null; log "${tag%%:*} attempt $attempt ended rc=$?"
  done
  if ls $d/model/ckpt-*.npz >/dev/null 2>&1; then
    touch $d/model/DONE
    env -u PYTHONPATH $(echo $CPU_ENV) timeout 1800 \
      python -u -m tensoralloy_tpu.cli evaluate $d >> $d/run.log 2>&1
    log "${tag%%:*} evaluate rc=$?"
  fi
done
log "chain done"
touch /tmp/mleam_chain_done
