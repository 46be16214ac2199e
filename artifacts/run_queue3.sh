#!/bin/bash
# Round-3 continuation queue (second session). The first queue's
# END_TS assumed the round ended ~6h early; this one carries the
# extended budget. Order: finish the in-flight moni_zhou04 run
# (PID passed as $1), then the stress-focused binary fine-tune,
# then the long Mo v3 (auto-resumes next round if cut). Stops
# launching 40 min before END_TS and kills the in-flight run 45 min
# before it so the driver's bench.py gets the chip to itself
# (crash auto-resume makes the kill safe and bit-exact).
set -u
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
END_TS=1787016000
LAUNCH_CUTOFF=$((END_TS - 2400))
KILL_TS=$((END_TS - 2700))
INFLIGHT=${1:-}

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

for d in snap_moni_v2 snap_mo_v3; do
  [ "$(date +%s)" -ge "$LAUNCH_CUTOFF" ] && break
  cd /root/repo/artifacts/$d || continue
  [ -f model/DONE ] && continue
  echo "=== queue3: starting $d at $(date)" >> run.log
  python -u -m tensoralloy_tpu.cli run input.toml >> run.log 2>&1 &
  RUNPID=$!
  echo $RUNPID > /tmp/current_run.pid
  while ps -p $RUNPID >/dev/null 2>&1; do
    if [ "$(date +%s)" -ge "$KILL_TS" ]; then kill $RUNPID; sleep 10; fi
    sleep 30
  done
  wait $RUNPID 2>/dev/null
  echo "=== queue3: finished $d rc=$? at $(date)" >> run.log
  if [ "$(date +%s)" -lt "$KILL_TS" ] && [ -f evaluate.py ]; then
    python -u evaluate.py . >> run.log 2>&1
  fi
  touch model/DONE 2>/dev/null || true
done
echo "queue3 done $(date)" > /tmp/queue3_done
