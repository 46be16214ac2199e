#!/bin/bash
# Round-4 phase-3 CPU chain: the Mo-gap ablations (VERDICT r3 item 6)
# + the end-of-round full test suite. Runs after run_cpu_chain.sh's
# work is done (or taken over by the chip via /tmp/axon_up):
#   A. snap_mo_refsf_s30  — stress weight 3 -> 30 fine-tune (15k)
#   B. snap_mo_refsf_cont — same-objective continuation (15k)
# each evaluated per group (evaluate_groups.py), then the full pytest
# suite once the CPU is otherwise idle.
set -u
CPU_ENV="PYTHONPATH=/root/repo JAX_PLATFORMS=cpu"
ABL_START_DEADLINE_B=1787073300   # 17:15 UTC: don't start B after this
HARD_KILL=1787078400              # 18:40 UTC: kill any ablation still up
log() { echo "[mo-abl $(date -u +%H:%M:%S)] $*" >> /tmp/mo_ablations.log; }

wait_for_cpu() {
  # CPU is ours when: refsf's 150k checkpoint exists, the refsf
  # process is gone, and moni_v3 is not training on this CPU
  # (either finished/evaluated by run_cpu_chain, or taken over by
  # the chip after /tmp/axon_up).
  while :; do
    now=$(date +%s)
    [ "$now" -ge "$HARD_KILL" ] && return 1
    if [ -f /root/repo/artifacts/snap_mo_refsf_cpu/model/ckpt-150000.npz ]; then
      REFSF_PID=$(cat /root/repo/artifacts/snap_mo_refsf_cpu/model/run.pid 2>/dev/null || echo 0)
      if [ "$REFSF_PID" -eq 0 ] || ! kill -0 "$REFSF_PID" 2>/dev/null; then
        if [ -f /tmp/cpu_chain_done ]; then return 0; fi
        if [ -f /tmp/axon_up ]; then
          # chip owns moni_v3; only a surviving CPU moni run (its env
          # pins JAX_PLATFORMS=cpu, the chip run's does not) blocks us
          MPID=$(cat /root/repo/artifacts/snap_moni_v3/model/run.pid 2>/dev/null || echo 0)
          if [ "$MPID" -gt 0 ] && kill -0 "$MPID" 2>/dev/null \
             && grep -qa "JAX_PLATFORMS=cpu" /proc/$MPID/environ 2>/dev/null; then
            : # keep waiting
          else
            return 0
          fi
        fi
      fi
    fi
    sleep 120
  done
}

run_one() {
  local d=$1
  cd "$d" || return 1
  log "launching $d"
  env $CPU_ENV nohup python -u -m tensoralloy_tpu.cli run input.toml \
    >> run.log 2>&1 &
  local PID=$!
  echo $PID > /tmp/mo_abl.pid
  while kill -0 $PID 2>/dev/null; do
    local now; now=$(date +%s)
    if [ "$now" -ge "$HARD_KILL" ]; then
      log "HARD_KILL reached, killing $PID"; kill $PID; sleep 15
      kill -9 $PID 2>/dev/null; break
    fi
    # stall watchdog (CPU runs log every 500 steps ~= 2 min)
    local mtime; mtime=$(stat -c %Y run.log 2>/dev/null || echo "$now")
    if [ $((now - mtime)) -gt 2400 ]; then
      log "stall watchdog killing $PID in $d"; kill $PID; sleep 15
      kill -9 $PID 2>/dev/null; break
    fi
    sleep 60
  done
  wait $PID 2>/dev/null
  log "$d ended rc=$?"
  if ls "$d"/model/ckpt-*.npz >/dev/null 2>&1; then
    log "evaluating $d per group"
    env $CPU_ENV timeout 2400 python -u /root/repo/artifacts/evaluate_groups.py "$d" \
      >> "$d/run.log" 2>&1
    log "evaluate_groups rc=$?"
  fi
}

if wait_for_cpu; then
  log "CPU free; starting ablation A (stress weight)"
  run_one /root/repo/artifacts/snap_mo_refsf_s30
  if [ "$(date +%s)" -lt "$ABL_START_DEADLINE_B" ]; then
    log "starting ablation B (continuation)"
    run_one /root/repo/artifacts/snap_mo_refsf_cont
  else
    log "too late for ablation B, skipping"
  fi
  if [ "$(date +%s)" -lt "$ABL_START_DEADLINE_B" ]; then
    log "starting ablation E (f32 re-adaptation of snap_ni_refsf)"
    run_one /root/repo/artifacts/snap_ni_refsf_readapt
  else
    log "too late for ablation E, skipping"
  fi
else
  log "CPU never freed before HARD_KILL; skipping ablations"
fi

# ---- end-of-round full test suite ----------------------------------
cd /root/repo
log "full pytest starting"
env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu timeout 3600 \
  python -m pytest tests/ -x -q > artifacts/pytest_r4.log 2>&1
log "full pytest rc=$? (tail: $(tail -1 artifacts/pytest_r4.log))"
touch /tmp/mo_ablations_done
