#!/bin/bash
# Round-3 continuation queue v2 (replaces run_queue3.sh): after the
# in-flight moni_zhou04 run ($1) finishes, take the exclusive-chip
# window to run the large-cell device-NL inference benchmarks (the
# steady-state one-device-call-per-frame numbers need the chip to
# themselves — concurrent probes have stalled the remote link), then
# the stress fine-tune and the long Mo v3. Time-guarded as before:
# stop launching 40 min and kill in-flight 45 min before END_TS so
# the driver's bench.py gets a free chip.
set -u
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
END_TS=1787016000
LAUNCH_CUTOFF=$((END_TS - 2400))
KILL_TS=$((END_TS - 2700))
INFLIGHT=${1:-}
BLOG=/root/repo/artifacts/bench_inference_r3.log

if [ -n "$INFLIGHT" ]; then
  while ps -p "$INFLIGHT" >/dev/null 2>&1; do
    if [ "$(date +%s)" -ge "$KILL_TS" ]; then kill "$INFLIGHT"; sleep 10; fi
    sleep 30
  done
  cd /root/repo/artifacts/moni_zhou04 || exit 1
  if [ "$(date +%s)" -lt "$KILL_TS" ] && [ -f evaluate.py ] && [ -f model/moni_zhou04.npz ]; then
    python -u evaluate.py . >> run.log 2>&1
    touch model/DONE 2>/dev/null || true
  fi
fi

# exclusive-chip benchmark window (device-NL large-cell inference)
if [ "$(date +%s)" -lt "$LAUNCH_CUTOFF" ] && [ ! -f /tmp/bench_nl_done ]; then
  cd /root/repo
  echo "=== device-NL inference bench at $(date)" >> "$BLOG"
  timeout 1500 python -u bench_inference.py 24 0 --device-nl >> "$BLOG" 2>&1
  timeout 1800 python -u bench_inference.py 32 0 --device-nl >> "$BLOG" 2>&1
  echo "=== done rc=$? at $(date)" >> "$BLOG"
  touch /tmp/bench_nl_done
fi

for d in snap_moni_v2 snap_mo_v3; do
  [ "$(date +%s)" -ge "$LAUNCH_CUTOFF" ] && break
  cd /root/repo/artifacts/$d || continue
  [ -f model/DONE ] && continue
  echo "=== queue4: starting $d at $(date)" >> run.log
  python -u -m tensoralloy_tpu.cli run input.toml >> run.log 2>&1 &
  RUNPID=$!
  echo $RUNPID > /tmp/current_run.pid
  while ps -p $RUNPID >/dev/null 2>&1; do
    if [ "$(date +%s)" -ge "$KILL_TS" ]; then kill $RUNPID; sleep 10; fi
    sleep 30
  done
  wait $RUNPID 2>/dev/null
  echo "=== queue4: finished $d rc=$? at $(date)" >> run.log
  if [ "$(date +%s)" -lt "$KILL_TS" ] && [ -f evaluate.py ]; then
    python -u evaluate.py . >> run.log 2>&1
  fi
  touch model/DONE 2>/dev/null || true
done
echo "queue4 done $(date)" > /tmp/queue4_done
