#!/bin/bash
# Round-4 queue v6 (supersedes run_queue14.sh): the axon pool ANSWERED
# at 01:44 UTC 08-19 after being down since 19:45 UTC 08-17. Fresh
# session window (~11.5 h). Differences vs v5:
#   - phases 3 (refsf chip resume) and 4 (moni_v3) are already closed
#     on CPU (EVAL_DONE / model/DONE markers) — the guards skip them;
#   - NEW phase 4.62: Mo ablation F15 (early rrmse switch from the
#     baseline's young ckpt-15000) runs on the CHIP — the fine-tune
#     source ckpt-15000 was itself chip-trained, so continuing at chip
#     numerics is the matched protocol, and the chip is ~30x faster;
#   - NEW phase 2.5: the ML-ADP Mo accuracy run (BASELINE.md row
#     20.6 meV/atom) on CPU while the chip trains (EAM-family training
#     is CPU-cheap: ~10 steps/s measured for the Ni run);
#   - END_TS extended to the new window.
set -u
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
END_TS=1787145000
HARD_STOP=$((END_TS - 2400))
KILL_TS=$((END_TS - 2700))

log() { echo "[queue15 $(date -u +%H:%M:%S)] $*" >> /tmp/queue15.log; }

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

# ---- phase 1: bench (the two-rounds-overdue numbers) ---------------
cd /root/repo
if [ ! -f /tmp/bench_r4_done ]; then
  log "bench starting"
  timeout 5400 python -u bench.py > artifacts/bench_r4c.json 2> artifacts/bench_r4c.err
  log "bench rc=$?"
  touch /tmp/bench_r4_done
fi

# ---- phase 2: perf suite (VERDICT item-2 deliverables) -------------
cd /root/repo
if [ ! -f /tmp/perf_suite_done ]; then
  log "probe_scatter starting"
  timeout 2400 python -u artifacts/probe_scatter.py \
    > artifacts/probe_scatter_r4.json 2> artifacts/probe_scatter_r4.err
  log "probe_scatter rc=$?"
  for args in "32" "32 0 --device-nl" "32 --grap" "24 0 --autodiff"; do
    [ "$(date +%s)" -ge "$((KILL_TS - 1200))" ] && break
    log "bench_inference $args starting"
    timeout 3600 python -u bench_inference.py $args \
      >> artifacts/bench_inference_r4.jsonl 2>> artifacts/bench_inference_r4.err
    log "bench_inference $args rc=$?"
  done
  touch /tmp/perf_suite_done
fi

# ---- phase 2.5: ML-ADP Mo accuracy run on CPU (BASELINE.md row) ----
d=/root/repo/artifacts/mladp_mo
if [ -f $d/input.toml ] && [ ! -f $d/model/DONE ]; then
  log "mladp_mo CPU run starting (background)"
  ( cd $d && env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
      timeout 21600 python -u -m tensoralloy_tpu.cli run input.toml \
      >> run.log 2>&1; \
    env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu timeout 2400 \
      python -u -m tensoralloy_tpu.cli evaluate $d >> run.log 2>&1 ) &
  echo $! > /tmp/mladp.pid
fi

# ---- phase 4.5: reference-DEFAULT-protocol Mo run (ablation C) -----
d=/root/repo/artifacts/snap_mo_ref11
if [ -f $d/input.toml ] && [ ! -f $d/model/DONE ] \
   && [ "$(date +%s)" -lt "$((KILL_TS - 3600))" ]; then
  run_training $d snap_Mo_refsf.npz 6 \
    && log "mo_ref11 DONE" || log "mo_ref11 NOT done"
  if ls $d/model/ckpt-*.npz >/dev/null 2>&1; then
    cd $d
    env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu timeout 2400 \
      python -u /root/repo/artifacts/evaluate_groups.py $d >> run.log 2>&1
    log "mo_ref11 evaluate_groups rc=$?"
  fi
fi

# ---- phase 4.6: L2-regularization Mo run (ablation D) --------------
d=/root/repo/artifacts/snap_mo_refsf_l2
if [ -f $d/input.toml ] && [ ! -f $d/model/DONE ] \
   && [ "$(date +%s)" -lt "$((KILL_TS - 3600))" ]; then
  run_training $d snap_Mo_refsf.npz 6 \
    && log "mo_refsf_l2 DONE" || log "mo_refsf_l2 NOT done"
  if ls $d/model/ckpt-*.npz >/dev/null 2>&1; then
    cd $d
    env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu timeout 2400 \
      python -u /root/repo/artifacts/evaluate_groups.py $d >> run.log 2>&1
    log "mo_refsf_l2 evaluate_groups rc=$?"
  fi
fi

# ---- phase 4.62: Mo ablation F15 on chip (early rrmse switch) ------
d=/root/repo/artifacts/snap_mo_refsf_f15
if [ -f $d/input.toml ] && [ ! -f $d/model/DONE ] \
   && [ "$(date +%s)" -lt "$((KILL_TS - 1800))" ]; then
  run_training $d snap_Mo_refsf.npz 4 \
    && log "mo_refsf_f15 DONE" || log "mo_refsf_f15 NOT done"
  if ls $d/model/ckpt-*.npz >/dev/null 2>&1; then
    cd $d
    env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu timeout 2400 \
      python -u /root/repo/artifacts/evaluate_groups.py $d >> run.log 2>&1
    log "mo_refsf_f15 evaluate_groups rc=$?"
  fi
fi

# ---- phase 4.7: E-style f32 re-adaptation of chip-trained GRAP models
for tag in "snap_ni_v5_readapt:snap_Ni.npz" \
           "snap_mo_v3_readapt:snap_Mo.npz" \
           "snap_moni_readapt:snap_MoNi.npz"; do
  d=/root/repo/artifacts/${tag%%:*}; exp=${tag##*:}
  [ "$(date +%s)" -ge "$((KILL_TS - 2400))" ] && break
  if [ -f $d/input.toml ] && [ ! -f $d/model/DONE ]; then
    run_training $d $exp 4 && log "${tag%%:*} DONE" || log "${tag%%:*} NOT done"
    if ls $d/model/ckpt-*.npz >/dev/null 2>&1; then
      env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu timeout 3600 \
        python -u -m tensoralloy_tpu.cli evaluate $d \
        >> $d/run.log 2>&1
      log "${tag%%:*} evaluate rc=$?"
    fi
  fi
done

# ---- phase 5: chip Green-Kubo, 256/500-atom cells ------------------
d=/root/repo/artifacts/kappa_ni
cd $d || exit 0
[ -f ni_zjw04.npz ] || python make_model.py >> run.log 2>&1
for tag in "4:256" "5:500"; do
  sc=${tag%%:*}; n=${tag##*:}
  for seed in 0 1 2; do
    [ "$(date +%s)" -ge "$HARD_STOP" ] && break 2
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
log "queue15 done"
touch /tmp/queue15_done
