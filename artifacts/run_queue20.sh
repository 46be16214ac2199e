#!/bin/bash
# Round-5 chip queue, part 2: relaunch of everything the 21:39 UTC
# sandbox restart killed out of run_queue19.sh (ablation C had already
# completed + committed; the rest never ran).  Order puts the
# idle-sensitive measurements FIRST (the r4 verdict's bench-hygiene
# item: probes must run on an uncontended host), then starts the CPU
# chain (mladp v4/v5) alongside the long binary training:
#   1. probe_train_scaling  — bs 32/128/512 stage split (VERDICT weak #1)
#   2. probe_efs_gap        — GRAP 131k roofline + EAM 7.4x (weak #2)
#   3. bench_oneshot_r5     — one-shot device-NL 131k end-to-end (weak #3)
#   4. (background) run_cpu_r5.sh — ML-ADP v4/v5 on CPU (item 7)
#   5. snap_moni_ref11      — binary 1/1/1 from scratch, 150k (weak #6)
#   6. kappa(N)             — 500-atom seeds + 3rd/4th 256-atom (weak #4)
# KILL_TS leaves the driver's round-end bench an idle chip.
set -u
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
END_TS=1787210100
KILL_TS=$((END_TS - 2400))
MARK=/root/repo/artifacts/markers
QLOG=/root/repo/artifacts/queue20.log
log() { echo "[queue20 $(date -u +%H:%M:%S)] $*" >> $QLOG; }

run_training() {
  # run_training <dir> <export-name> <max-attempts>
  local d=$1 exp=$2 maxa=$3 attempt=0
  while [ ! -f "$d/model/DONE" ] && [ "$(date +%s)" -lt "$KILL_TS" ] \
        && [ $attempt -lt $maxa ]; do
    attempt=$((attempt + 1))
    cd "$d" || return 1
    log "training $(basename $d) attempt $attempt"
    local START=$(date +%s)
    python -u -m tensoralloy_tpu.cli run input.toml >> run.log 2>&1 &
    local RUNPID=$!
    echo $RUNPID > /tmp/current_run.pid
    while kill -0 $RUNPID 2>/dev/null; do
      local now=$(date +%s)
      if [ "$now" -ge "$KILL_TS" ]; then kill $RUNPID; sleep 15; break; fi
      local mtime=$(stat -c %Y run.log)
      [ "$mtime" -lt "$START" ] && mtime=$START
      if [ $((now - mtime)) -gt 2400 ]; then
        log "stall watchdog killing $RUNPID"
        kill $RUNPID; sleep 15; kill -9 $RUNPID 2>/dev/null
        break
      fi
      sleep 60
    done
    wait $RUNPID 2>/dev/null
    log "attempt $attempt ended rc=$?"
    if [ -f "$d/model/$exp" ]; then touch "$d/model/DONE"; fi
  done
  [ -f "$d/model/DONE" ]
}

eval_groups() {
  local d=$1
  if ls $d/model/ckpt-*.npz >/dev/null 2>&1; then
    cd $d
    env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu timeout 3000 \
      python -u /root/repo/artifacts/evaluate_groups.py $d >> run.log 2>&1
    log "$(basename $d) evaluate_groups rc=$?"
  fi
}

log "queue20 start (relaunch after 21:39 restart)"

# ---- phase 1+2: probes, idle host ------------------------------------
for p in probe_train_scaling probe_efs_gap; do
  s=/root/repo/artifacts/$p.py
  m=$MARK/q19_${p}_done
  if [ -f "$s" ] && [ ! -f "$m" ] && [ "$(date +%s)" -lt "$KILL_TS" ]; then
    log "$p starting"
    cd /root/repo/artifacts
    timeout 2700 python -u "$s" > ${p}_r5.json 2> ${p}_r5.err
    log "$p rc=$?"
    touch "$m"
  fi
done

# ---- phase 3: one-shot device-NL inference bench, idle host ----------
s=/root/repo/artifacts/bench_oneshot_r5.py
if [ -f "$s" ] && [ ! -f $MARK/q19_oneshot_done ] \
   && [ "$(date +%s)" -lt "$KILL_TS" ]; then
  log "oneshot inference bench starting"
  cd /root/repo/artifacts
  timeout 3600 python -u "$s" > bench_oneshot_r5.json 2> bench_oneshot_r5.err
  log "oneshot rc=$?"
  touch $MARK/q19_oneshot_done
fi

# ---- phase 4: start the CPU chain in the background -------------------
if [ ! -f $MARK/q20_cpu_chain_started ]; then
  nohup bash /root/repo/artifacts/run_cpu_r5.sh \
    > /root/repo/artifacts/cpu_r5.out 2>&1 &
  echo $! > /tmp/cpu_r5.pid
  touch $MARK/q20_cpu_chain_started
  log "cpu chain launched pid $(cat /tmp/cpu_r5.pid)"
fi

# ---- phase 5: binary 1/1/1 from scratch -------------------------------
d=/root/repo/artifacts/snap_moni_ref11
if [ ! -f $d/model/DONE ] \
   && [ "$(date +%s)" -lt "$((KILL_TS - 3600))" ]; then
  run_training $d snap_MoNi.npz 6 && log "moni_ref11 DONE" \
    || log "moni_ref11 NOT done"
fi
eval_groups $d
touch $MARK/q19_moni_ref11_done

# ---- phase 6: kappa(N) — 500-atom seeds + more 256 -------------------
d=/root/repo/artifacts/kappa_ni
cd $d || exit 0
if [ ! -f ni_zjw04.npz ]; then
  # model file is uncommitted transient state; regenerate (restart wiped it)
  env JAX_PLATFORMS=cpu python -u make_model.py >> run.log 2>&1
  log "kappa model regen rc=$?"
fi
for tag in "5:500:0" "5:500:1" "4:256:2" "5:500:2" "4:256:3"; do
  sc=$(echo $tag | cut -d: -f1); n=$(echo $tag | cut -d: -f2)
  seed=$(echo $tag | cut -d: -f3)
  [ "$(date +%s)" -ge "$((KILL_TS - 3600))" ] && break
  f=kappa_chip_n${n}_s$seed.csv
  if [ -f "$f" ]; then
    if head -1 "$f" | grep -q PARTIAL; then
      mv "$f" "$f.partial.$(date +%s)"
      log "kappa n=$n seed=$seed: prior PARTIAL preserved, re-running"
    else
      continue
    fi
  fi
  log "kappa n=$n seed=$seed starting"
  timeout 5400 python -u -m tensoralloy_tpu.cli compute kappa \
    ni_zjw04.npz Ni --supercell $sc $sc $sc --temp 300 \
    --equil-steps 4000 --steps 300000 --sample 10 --timestep 2.0 \
    --device-nl --seed $seed -o $f >> run.log 2>&1
  log "kappa n=$n seed=$seed rc=$?"
done

log "queue20 done"
touch $MARK/queue20_done
