#!/bin/bash
# Round-4 queue v8 (supersedes run_queue16.sh): queue16's phases 3-5
# all failed on a KeyError('pair_simg_d') — the launch snapshot mixed
# committed consumers with the in-flight packed-shift featurizer.  The
# refactor is now committed (faf6eaa) and 101 affected tests are
# green, so the Mo endgame phases are restored.  Additional fixes vs
# queue16:
#   - run_training watchdog clamps run.log mtime to the attempt START
#     time: queue16 killed ref11's attempts 2-6 within one second
#     because the previous attempt's stale mtime (>2400 s old) was
#     compared before the fresh process had written anything;
#   - phase P runs probe_pallas_fix.py first: a 2-minute chip check
#     that the restructured pallas GRAP kernel survives the scoped-VMEM
#     budget (de-risks the driver's round-end bench.py run);
#   - ablation C (ref11) resumes LAST from its surviving ckpt-40000 —
#     it stalled once on a tunnel hang and is the least-novel ablation.
# Phase order: wait-for-kappa-s0 -> probe -> y15 -> F15 -> ablation D
# (l2+rrmse 135k) -> f32 re-adaptations x3 -> GK seeds -> C resume.
set -u
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
END_TS=1787153300
HARD_STOP=$((END_TS - 2400))
KILL_TS=$((END_TS - 2700))
MARK=/root/repo/artifacts/markers
mkdir -p $MARK

log() { echo "[queue17 $(date -u +%H:%M:%S)] $*" >> /tmp/queue17.log; }

run_training() {
  local d=$1 expname=$2 maxatt=$3 attempt=0
  while [ ! -f "$d/model/DONE" ] && [ "$(date +%s)" -lt "$KILL_TS" ] \
        && [ $attempt -lt "$maxatt" ]; do
    attempt=$((attempt + 1))
    cd "$d" || return 1
    log "training $d attempt $attempt"
    local START; START=$(date +%s)
    python -u -m tensoralloy_tpu.cli run input.toml >> run.log 2>&1 &
    local RUNPID=$!
    echo $RUNPID > /tmp/current_run.pid
    while kill -0 $RUNPID 2>/dev/null; do
      local now; now=$(date +%s)
      if [ "$now" -ge "$KILL_TS" ]; then kill $RUNPID; sleep 10; break; fi
      local mtime; mtime=$(stat -c %Y run.log)
      # clamp to attempt start: a fresh process spends minutes in
      # refeaturize/compile before its first write
      [ "$mtime" -lt "$START" ] && mtime=$START
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

# ---- phase W: let the orphaned kappa n256 s0 finish its window -----
# (pids recorded at queue16 launch; kill -0 only probes liveness)
while kill -0 16801 2>/dev/null || kill -0 16802 2>/dev/null; do
  sleep 30
done
log "kappa s0 window clear, chip free"

# ---- phase P: pallas scoped-VMEM fix probe -------------------------
cd /root/repo
if [ ! -f $MARK/probe_pallas_done ]; then
  log "probe_pallas_fix starting"
  timeout 1800 python -u artifacts/probe_pallas_fix.py \
    > artifacts/probe_pallas_r4.json 2> artifacts/probe_pallas_r4.err
  log "probe_pallas_fix rc=$?"
  touch $MARK/probe_pallas_done
fi

# ---- phase 3: regenerate the baseline's young ckpt-15000 -----------
d=/root/repo/artifacts/snap_mo_y15
if [ ! -f /root/repo/artifacts/snap_mo_refsf_cpu/model/ckpt-15000.npz ] \
   && [ "$(date +%s)" -lt "$((KILL_TS - 1800))" ]; then
  run_training $d snap_Mo_y15.npz 3 && log "mo_y15 DONE" || log "mo_y15 NOT done"
  if [ -f $d/model/ckpt-15000.npz ]; then
    cp $d/model/ckpt-15000.npz /root/repo/artifacts/snap_mo_refsf_cpu/model/
    log "young ckpt-15000 regenerated and staged"
    env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu timeout 2400 \
      python -u /root/repo/artifacts/evaluate_groups.py $d >> $d/run.log 2>&1
    log "mo_y15 evaluate_groups rc=$?"
  fi
fi

# ---- phase 4: Mo ablation F15 on chip (early rrmse switch) ---------
d=/root/repo/artifacts/snap_mo_refsf_f15
if [ -f /root/repo/artifacts/snap_mo_refsf_cpu/model/ckpt-15000.npz ] \
   && [ ! -f $d/model/DONE ] \
   && [ "$(date +%s)" -lt "$((KILL_TS - 1800))" ]; then
  run_training $d snap_Mo_refsf.npz 3 \
    && log "mo_refsf_f15 DONE" || log "mo_refsf_f15 NOT done"
  if ls $d/model/ckpt-*.npz >/dev/null 2>&1; then
    cd $d
    env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu timeout 2400 \
      python -u /root/repo/artifacts/evaluate_groups.py $d >> run.log 2>&1
    log "mo_refsf_f15 evaluate_groups rc=$?"
  fi
fi

# ---- phase 5: Mo ablation D — l2+rrmse from young ckpt, 135k -------
d=/root/repo/artifacts/snap_mo_refsf_l2
if [ -f /root/repo/artifacts/snap_mo_refsf_cpu/model/ckpt-15000.npz ] \
   && [ ! -f $d/model/DONE ] \
   && [ "$(date +%s)" -lt "$((KILL_TS - 3600))" ]; then
  run_training $d snap_Mo_refsf.npz 4 \
    && log "mo_refsf_l2 DONE" || log "mo_refsf_l2 NOT done"
  if ls $d/model/ckpt-*.npz >/dev/null 2>&1; then
    cd $d
    env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu timeout 2400 \
      python -u /root/repo/artifacts/evaluate_groups.py $d >> run.log 2>&1
    log "mo_refsf_l2 evaluate_groups rc=$?"
  fi
fi

# ---- phase 6: E-style f32 re-adaptation of chip-trained GRAP models
for tag in "snap_ni_v5_readapt:snap_Ni.npz" \
           "snap_mo_v3_readapt:snap_Mo.npz" \
           "snap_moni_readapt:snap_MoNi.npz"; do
  d=/root/repo/artifacts/${tag%%:*}; exp=${tag##*:}
  [ "$(date +%s)" -ge "$((KILL_TS - 2400))" ] && break
  if [ -f $d/input.toml ] && [ ! -f $d/model/DONE ]; then
    run_training $d $exp 3 && log "${tag%%:*} DONE" || log "${tag%%:*} NOT done"
    if ls $d/model/ckpt-*.npz >/dev/null 2>&1; then
      env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu timeout 3600 \
        python -u -m tensoralloy_tpu.cli evaluate $d \
        >> $d/run.log 2>&1
      log "${tag%%:*} evaluate rc=$?"
    fi
  fi
done

# ---- phase 7: chip Green-Kubo, remaining seeds ---------------------
d=/root/repo/artifacts/kappa_ni
cd $d || exit 0
for tag in "4:256" "5:500"; do
  sc=${tag%%:*}; n=${tag##*:}
  for seed in 0 1 2; do
    [ "$(date +%s)" -ge "$((HARD_STOP - 3000))" ] && break 2
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
done

# ---- phase 8: ablation C resume (ref11 ckpt-40000 -> 200k) ---------
d=/root/repo/artifacts/snap_mo_ref11
if [ -f $d/input.toml ] && [ ! -f $d/model/DONE ] \
   && [ "$(date +%s)" -lt "$((KILL_TS - 3600))" ]; then
  run_training $d snap_Mo_refsf.npz 4 \
    && log "mo_ref11 DONE" || log "mo_ref11 NOT done"
  if ls $d/model/ckpt-*.npz >/dev/null 2>&1; then
    cd $d
    env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu timeout 2400 \
      python -u /root/repo/artifacts/evaluate_groups.py $d >> run.log 2>&1
    log "mo_ref11 evaluate_groups rc=$?"
  fi
fi
log "queue17 done"
touch $MARK/queue17_done
