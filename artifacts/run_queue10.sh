#!/bin/bash
# Round-4 queue v2 (supersedes run_queue9.sh): probe until the axon
# pool answers, then run the chip chain with the two-rounds-overdue
# PERF measurements ahead of the long Green-Kubo productions:
#   1. snap_mo_refsf resume (ckpt-105000 -> 150000, ~30 min)
#   2. bench.py (backend_matrix + bs_sweep + fast-EFS stage)
#   3. perf suite: probe_scatter + bench_inference (131k fast EFS,
#      device-NL stage split, GRAP family) — the VERDICT item-2
#      deliverables
#   4. snap_moni_v3 rrmse fine-tune
#   5. chip Green-Kubo kappa, 256/500-atom cells x 3 seeds
set -u
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
END_TS=1787063000
HARD_STOP=$((END_TS - 2400))
KILL_TS=$((END_TS - 2700))

log() { echo "[queue10 $(date -u +%H:%M:%S)] $*" >> /tmp/queue10.log; }

# ---- phase 0: probe until the chip answers -------------------------
while [ "$(date +%s)" -lt "$HARD_STOP" ]; do
  if timeout 240 python -c "
import jax, jax.numpy as jnp
print(float((jnp.ones((8,8)) @ jnp.ones((8,8))).sum()))" \
      > /tmp/axon_probe.out 2>&1; then
    log "axon ANSWERED"
    break
  fi
  log "axon still down"
  sleep 240
done
[ "$(date +%s)" -ge "$HARD_STOP" ] && { log "round over, chip never answered"; exit 0; }

run_training() {
  local d=$1 expname=$2 maxatt=$3 attempt=0
  while [ ! -f "$d/model/DONE" ] && [ "$(date +%s)" -lt "$KILL_TS" ] \
        && [ $attempt -lt "$maxatt" ]; do
    attempt=$((attempt + 1))
    cd "$d" || return 1
    log "training $d attempt $attempt"
    python -u -m tensoralloy_tpu.cli run input.toml >> run.log 2>&1 &
    local RUNPID=$!
    echo $RUNPID > /tmp/current_run.pid
    while kill -0 $RUNPID 2>/dev/null; do
      local now; now=$(date +%s)
      if [ "$now" -ge "$KILL_TS" ]; then kill $RUNPID; sleep 10; break; fi
      local mtime; mtime=$(stat -c %Y run.log)
      if [ $((now - mtime)) -gt 2400 ]; then
        log "stall watchdog killing $RUNPID in $d"
        kill $RUNPID; sleep 15; kill -9 $RUNPID 2>/dev/null
        break
      fi
      sleep 60
    done
    wait $RUNPID 2>/dev/null
    log "training $d attempt $attempt ended rc=$?"
    if [ -f "$d/model/$expname" ]; then touch "$d/model/DONE"; fi
  done
  [ -f "$d/model/DONE" ]
}

# ---- phase 1: snap_mo_refsf resume ---------------------------------
run_training /root/repo/artifacts/snap_mo_refsf snap_Mo.npz 6 \
  && log "refsf DONE" || log "refsf NOT done"

# ---- phase 2: bench ------------------------------------------------
if [ "$(date +%s)" -lt "$((KILL_TS - 3600))" ]; then
  cd /root/repo
  log "bench starting"
  timeout 3600 python -u bench.py > artifacts/bench_r4.json 2> artifacts/bench_r4.err
  log "bench rc=$?"
  touch /tmp/bench_r4_done
fi

# ---- phase 3: perf suite (item-2 deliverables) ---------------------
cd /root/repo
log "probe_scatter starting"
timeout 2400 python -u artifacts/probe_scatter.py \
  > artifacts/probe_scatter_r4.json 2> artifacts/probe_scatter_r4.err
log "probe_scatter rc=$?"
for args in "32" "32 0 --device-nl" "32 --grap" "24 0 --autodiff"; do
  [ "$(date +%s)" -ge "$((KILL_TS - 1200))" ] && break
  tag=$(echo $args | tr ' -' '__')
  log "bench_inference $args starting"
  timeout 3000 python -u bench_inference.py $args \
    >> artifacts/bench_inference_r4.jsonl 2>> artifacts/bench_inference_r4.err
  log "bench_inference $args rc=$?"
done
touch /tmp/perf_suite_done

# ---- phase 4: binary rrmse fine-tune -------------------------------
if [ -f /root/repo/artifacts/snap_moni_v3/input.toml ]; then
  run_training /root/repo/artifacts/snap_moni_v3 snap_MoNi.npz 6 \
    && log "moni_v3 DONE" || log "moni_v3 NOT done"
  if [ -f /root/repo/artifacts/snap_moni_v3/model/DONE ]; then
    cd /root/repo/artifacts/snap_moni_v3
    log "moni_v3 evaluate"
    timeout 2400 python -u evaluate.py >> run.log 2>&1
    timeout 2400 python -u stress_perframe.py >> run.log 2>&1
  fi
fi

# ---- phase 5: chip Green-Kubo, 256/500-atom cells ------------------
d=/root/repo/artifacts/kappa_ni
cd $d || exit 0
[ -f ni_zjw04.npz ] || python make_model.py >> run.log 2>&1
for tag in "4:256" "5:500"; do
  sc=${tag%%:*}; n=${tag##*:}
  for seed in 0 1 2; do
    [ "$(date +%s)" -ge "$HARD_STOP" ] && break 2
    f=kappa_chip_n${n}_s$seed.csv
    [ -f $f ] && continue
    log "kappa n=$n seed=$seed starting"
    timeout 5400 python -u -m tensoralloy_tpu.cli compute kappa \
      ni_zjw04.npz Ni --supercell $sc $sc $sc --temp 300 \
      --equil-steps 4000 --steps 300000 --sample 10 --timestep 2.0 \
      --device-nl --seed $seed -o $f >> run.log 2>&1
    log "kappa n=$n seed=$seed rc=$?"
  done
done
log "queue10 done"
touch /tmp/queue10_done
