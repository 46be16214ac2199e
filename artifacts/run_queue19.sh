#!/bin/bash
# Round-5 chip queue. Order per VERDICT r4 "next round":
#   1. ablation C resume (snap_mo_ref11 ckpt-40000 -> 200k incl the
#      10k f32 anneal) — the last open published accuracy row.
#   2. evaluate C at exact f32 (CPU).
#   3. probes (if the scripts exist by then): probe_train_scaling
#      (bs 32/128/512 stage split — the measured throughput
#      INVERSION), probe_efs_gap (fast-EFS remaining 7.4x + GRAP
#      131k stage split / roofline).
#   4. binary analog snap_moni_ref11 (1/1/1 from scratch, 150k).
#   5. evaluate binary.
#   6. one-shot device-NL inference bench (if script exists).
#   7. kappa(N): 500-atom seeds + 3rd/4th 256-atom seed.
# KILL_TS leaves the driver's round-end bench an idle chip.
set -u
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
END_TS=1787210100
KILL_TS=$((END_TS - 2400))
MARK=/root/repo/artifacts/markers
QLOG=/root/repo/artifacts/queue19.log
log() { echo "[queue19 $(date -u +%H:%M:%S)] $*" >> $QLOG; }

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

log "queue19 start"

# ---- phase 1+2: ablation C to 200k, then f32 eval -------------------
d=/root/repo/artifacts/snap_mo_ref11
if [ ! -f $d/model/DONE ]; then
  run_training $d snap_Mo_refsf.npz 6 && log "mo_ref11 DONE" \
    || log "mo_ref11 NOT done"
fi
eval_groups $d
touch $MARK/q19_ref11_done

# ---- phase 3: probes (short; scripts may land while C trains) -------
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

# ---- phase 4+5: binary 1/1/1 from scratch ----------------------------
d=/root/repo/artifacts/snap_moni_ref11
if [ ! -f $d/model/DONE ] \
   && [ "$(date +%s)" -lt "$((KILL_TS - 3600))" ]; then
  run_training $d snap_MoNi.npz 6 && log "moni_ref11 DONE" \
    || log "moni_ref11 NOT done"
fi
eval_groups $d
touch $MARK/q19_moni_ref11_done

# ---- phase 6: one-shot device-NL inference bench ---------------------
s=/root/repo/artifacts/bench_oneshot_r5.py
if [ -f "$s" ] && [ ! -f $MARK/q19_oneshot_done ] \
   && [ "$(date +%s)" -lt "$KILL_TS" ]; then
  log "oneshot inference bench starting"
  cd /root/repo/artifacts
  timeout 3600 python -u "$s" > bench_oneshot_r5.json 2> bench_oneshot_r5.err
  log "oneshot rc=$?"
  touch $MARK/q19_oneshot_done
fi

# ---- phase 7: kappa(N) — 500-atom seeds + more 256 -------------------
d=/root/repo/artifacts/kappa_ni
cd $d || exit 0
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

log "queue19 done"
touch $MARK/queue19_done
