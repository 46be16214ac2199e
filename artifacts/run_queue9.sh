#!/bin/bash
# Round-4 queue: probe the axon pool until it answers, then run the
# chip chain the round-3 verdict demands, in priority order:
#   1. snap_mo_refsf resume (ckpt-105000 -> 150000, Mo parity number)
#   2. bench.py (backend_matrix + bs_sweep -> BENCH-grade artifact)
#   3. snap_moni_v3 fine-tune with relative-stress loss (if prepared)
#   4. chip-resident Green-Kubo kappa, 256/500-atom cells x 3 seeds
# Each training run has the 2400 s stall watchdog (axon link can block
# one HTTP request >25 min; crash auto-resume is bit-exact).
set -u
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
END_TS=1787063000            # ~14:20 UTC Aug 18 (round end minus margin)
HARD_STOP=$((END_TS - 2400))
KILL_TS=$((END_TS - 2700))

log() { echo "[queue9 $(date -u +%H:%M:%S)] $*" >> /tmp/queue9.log; }

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
  # run_training <dir> <export_name> <max_attempts>
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
if [ "$(date +%s)" -lt "$((KILL_TS - 3000))" ]; then
  cd /root/repo
  log "bench starting"
  timeout 3000 python -u bench.py > artifacts/bench_r4.json 2> artifacts/bench_r4.err
  log "bench rc=$?"
  touch /tmp/bench_r4_done
fi

# ---- phase 3: binary stress-objective fine-tune --------------------
if [ -f /root/repo/artifacts/snap_moni_v3/input.toml ]; then
  run_training /root/repo/artifacts/snap_moni_v3 snap_MoNi.npz 6 \
    && log "moni_v3 DONE" || log "moni_v3 NOT done"
fi

# ---- phase 4: chip Green-Kubo, 256/500-atom cells ------------------
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
log "queue9 done"
touch /tmp/queue9_done
