#!/bin/bash
# Round-3 sequential TPU queue (time-guarded). Order: the cheap runs
# and the flagship-supporting runs first; the long Mo v3 last (it
# auto-resumes next round if cut). Stops launching 40 min before the
# nominal round end and kills the in-flight run 20 min before it so
# the driver's bench.py gets the chip to itself (crash auto-resume
# makes the kill safe and bit-exact).
set -u
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
END_TS=1786997342           # round-3 start + 12 h
LAUNCH_CUTOFF=$((END_TS - 3600))
KILL_TS=$((END_TS - 2700))
QUEUE="td_be moni_zhou04 snap_moni_v2 snap_mo_v3"

# wait for the in-flight radial-SF Ni run
while ps -p 27960 >/dev/null 2>&1; do
  if [ "$(date +%s)" -ge "$KILL_TS" ]; then kill 27960; sleep 10; fi
  sleep 30
done

for d in $QUEUE; do
  [ "$(date +%s)" -ge "$LAUNCH_CUTOFF" ] && break
  cd /root/repo/artifacts/$d || continue
  [ -f model/DONE ] && continue
  echo "=== queue: starting $d at $(date)" >> run.log
  python -u -m tensoralloy_tpu.cli run input.toml >> run.log 2>&1 &
  RUNPID=$!
  echo $RUNPID > /tmp/current_run.pid
  while ps -p $RUNPID >/dev/null 2>&1; do
    if [ "$(date +%s)" -ge "$KILL_TS" ]; then kill $RUNPID; sleep 10; fi
    sleep 30
  done
  wait $RUNPID 2>/dev/null
  echo "=== queue: finished $d rc=$? at $(date)" >> run.log
  if [ "$(date +%s)" -lt "$KILL_TS" ] && [ -f evaluate.py ]; then
    python -u evaluate.py . >> run.log 2>&1
  fi
  touch model/DONE 2>/dev/null || true
done
echo "queue done $(date)" > /tmp/queue_done
