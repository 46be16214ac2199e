#!/bin/bash
# Round-4 queue v5 (supersedes run_queue13.sh): same chip chain with
# END_TS extended for the extended round-4 window (ends ~08:10 UTC
# 08-19). New: (a) ablation D config now carries the F+G-posed
# protocol (l2 0.01 + rrmse stress from step 0); (b) a phase 4.7 runs
# E-style 10k f32-matmul re-adaptations of the three chip-trained
# GRAP models (ni_v5 / mo_v3 / moni); (c) the in-flight CPU D-lite
# run (/tmp/mo_dlite.pid) is SIGSTOPped during bench/perf compiles
# (single-core machine; compile is local llvm work) and killed for
# good when chip ablation D starts.  Division of labor:
#   - this script probes the axon pool; when it answers it runs the
#     CHIP-ONLY deliverables first (bench.py backend_matrix/bs_sweep,
#     probe_scatter, 131k bench_inference suite), then Green-Kubo
#     kappa seeds (256/500 atoms x 3 seeds);
#   - snap_mo_refsf chip resume runs ONLY if the CPU continuation has
#     not already landed the 150k number (marker EVAL_DONE);
#   - snap_moni_v3 on chip: if a CPU fine-tune is in flight it is
#     killed first (kill-by-pidfile) and the chip resumes from its
#     newest checkpoint (bit-exact crash-resume contract), because the
#     chip is ~30x faster at this workload.
set -u
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
END_TS=1787127000
HARD_STOP=$((END_TS - 2400))
KILL_TS=$((END_TS - 2700))

log() { echo "[queue14 $(date -u +%H:%M:%S)] $*" >> /tmp/queue14.log; }

# ---- phase 0: probe until the chip answers -------------------------
while [ "$(date +%s)" -lt "$HARD_STOP" ]; do
  if timeout 240 python -c "
import jax, jax.numpy as jnp
print(float((jnp.ones((8,8)) @ jnp.ones((8,8))).sum()))" \
      > /tmp/axon_probe.out 2>&1; then
    log "axon ANSWERED"
    touch /tmp/axon_up
    if [ -f /tmp/mo_dlite.pid ] && kill -0 "$(cat /tmp/mo_dlite.pid)" 2>/dev/null; then
      log "suspending CPU dlite run during bench/perf compiles"
      kill -STOP "$(cat /tmp/mo_dlite.pid)"
    fi
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

# ---- phase 1: bench (the two-rounds-overdue numbers) ---------------
cd /root/repo
log "bench starting"
timeout 3600 python -u bench.py > artifacts/bench_r4b.json 2> artifacts/bench_r4b.err
log "bench rc=$?"
touch /tmp/bench_r4_done

# ---- phase 2: perf suite (VERDICT item-2 deliverables) -------------
cd /root/repo
log "probe_scatter starting"
timeout 2400 python -u artifacts/probe_scatter.py \
  > artifacts/probe_scatter_r4.json 2> artifacts/probe_scatter_r4.err
log "probe_scatter rc=$?"
for args in "32" "32 0 --device-nl" "32 --grap" "24 0 --autodiff"; do
  [ "$(date +%s)" -ge "$((KILL_TS - 1200))" ] && break
  log "bench_inference $args starting"
  timeout 3000 python -u bench_inference.py $args \
    >> artifacts/bench_inference_r4.jsonl 2>> artifacts/bench_inference_r4.err
  log "bench_inference $args rc=$?"
done
touch /tmp/perf_suite_done
if [ -f /tmp/mo_dlite.pid ] && kill -0 "$(cat /tmp/mo_dlite.pid)" 2>/dev/null; then
  log "resuming CPU dlite run"
  kill -CONT "$(cat /tmp/mo_dlite.pid)"
fi

# ---- phase 3: snap_mo_refsf chip resume (only if CPU didn't land it)
if [ ! -f /root/repo/artifacts/snap_mo_refsf_cpu/EVAL_DONE ]; then
  run_training /root/repo/artifacts/snap_mo_refsf snap_Mo.npz 6 \
    && log "refsf DONE" || log "refsf NOT done"
fi

# ---- phase 4: binary rrmse fine-tune (take over from CPU) ----------
d=/root/repo/artifacts/snap_moni_v3
if [ -f $d/input.toml ] && [ ! -f $d/model/DONE ]; then
  if [ -f $d/model/run.pid ] && kill -0 "$(cat $d/model/run.pid)" 2>/dev/null; then
    log "killing CPU moni_v3 run $(cat $d/model/run.pid); chip takes over"
    kill "$(cat $d/model/run.pid)"; sleep 15
    kill -9 "$(cat $d/model/run.pid)" 2>/dev/null
  fi
  run_training $d snap_MoNi.npz 6 \
    && log "moni_v3 DONE" || log "moni_v3 NOT done"
  if [ -f $d/model/DONE ]; then
    cd $d
    log "moni_v3 evaluate"
    env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
      timeout 2400 python -u evaluate.py > eval_out.json 2>> run.log
    env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
      timeout 2400 python -u stress_perframe.py >> run.log 2>&1
  fi
fi

# ---- phase 4.5: reference-DEFAULT-protocol Mo run (ablation C) -----
# The manuscript fixes the descriptor recipe but not the loss
# weights; the reference's defaults.toml ships 1/1/1. 200k steps at
# chip speed ~= 70 min. Runs before GK per VERDICT priority order
# (item 6 Mo endgame > item 7 kappa(N)).
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
# Same recipe as the completed refsf 150k run except l2 0 -> 0.01
# (the reference's own bundled SNAP input uses 0.01 and its logged
# training loss implies a dominant L2 term). Fresh 150k steps.
d=/root/repo/artifacts/snap_mo_refsf_l2
if [ -f $d/input.toml ] && [ ! -f $d/model/DONE ] \
   && [ "$(date +%s)" -lt "$((KILL_TS - 3600))" ]; then
  if [ -f /tmp/mo_dlite.pid ] && kill -0 "$(cat /tmp/mo_dlite.pid)" 2>/dev/null; then
    log "chip ablation D supersedes CPU dlite; killing $(cat /tmp/mo_dlite.pid)"
    kill -CONT "$(cat /tmp/mo_dlite.pid)" 2>/dev/null
    kill "$(cat /tmp/mo_dlite.pid)"; sleep 10
    kill -9 "$(cat /tmp/mo_dlite.pid)" 2>/dev/null
  fi
  run_training $d snap_Mo_refsf.npz 6 \
    && log "mo_refsf_l2 DONE" || log "mo_refsf_l2 NOT done"
  if ls $d/model/ckpt-*.npz >/dev/null 2>&1; then
    cd $d
    env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu timeout 2400 \
      python -u /root/repo/artifacts/evaluate_groups.py $d >> run.log 2>&1
    log "mo_refsf_l2 evaluate_groups rc=$?"
  fi
fi

# ---- phase 4.7: E-style f32 re-adaptation of chip-trained GRAP models
# 10k steps each, final_f32_steps=10000 => whole continuation at f32
# matmuls on chip. Cheap (~10-20 min each) and lifts three headline
# accuracy rows (Ni GRAP 2.30, Mo GRAP 9.04, MoNi binary 3.02 at f32).
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
      # a completed CSV is done; a '# PARTIAL' flush from a killed
      # attempt is preserved aside and the seed re-run from scratch
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
log "queue14 done"
touch /tmp/queue14_done
