#!/bin/bash
# Round-3 continuation queue v4: finish snap_mo_refsf (crash
# auto-resume from the newest ckpt) WITH a stall watchdog -- the axon
# link can block a single HTTP request for 30+ min; if run.log goes
# stale >900 s the run is killed and relaunched (bit-exact resume).
# Then the bench.py self-check.
set -u
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
END_TS=1787016000
LAUNCH_CUTOFF=$((END_TS - 2400))
KILL_TS=$((END_TS - 2700))

d=/root/repo/artifacts/snap_mo_refsf
attempt=0
while [ ! -f $d/model/DONE ] && [ "$(date +%s)" -lt "$LAUNCH_CUTOFF" ] \
      && [ $attempt -lt 6 ]; do
  attempt=$((attempt + 1))
  cd $d || exit 1
  echo "=== queue6: starting $d attempt $attempt at $(date)" >> run.log
  python -u -m tensoralloy_tpu.cli run input.toml >> run.log 2>&1 &
  RUNPID=$!
  echo $RUNPID > /tmp/current_run.pid
  while kill -0 $RUNPID 2>/dev/null; do
    now=$(date +%s)
    if [ "$now" -ge "$KILL_TS" ]; then kill $RUNPID; sleep 10; break; fi
    mtime=$(stat -c %Y run.log)
    # 2400 s with no log line = stalled axon request (compiles log
    # nothing, but even the big fused step compiles in <15 min and
    # the first step then writes a line)
    if [ $((now - mtime)) -gt 2400 ]; then
      echo "=== queue6: stall watchdog killing $RUNPID at $(date)" >> run.log
      kill $RUNPID; sleep 15
      kill -9 $RUNPID 2>/dev/null
      break
    fi
    sleep 60
  done
  wait $RUNPID 2>/dev/null
  rc=$?
  echo "=== queue6: attempt $attempt ended rc=$rc at $(date)" >> run.log
  # the trainer writes the exported model only on full completion
  if [ -f $d/model/snap_Mo.npz ]; then touch $d/model/DONE; fi
  [ "$(date +%s)" -ge "$KILL_TS" ] && break
done

# bench self-check (driver contract) if time remains
if [ "$(date +%s)" -lt "$((KILL_TS - 2400))" ] && [ ! -f /tmp/bench_selfcheck_done ]; then
  cd /root/repo
  timeout 2400 python -u bench.py > artifacts/bench_selfcheck_r3.json 2> artifacts/bench_selfcheck_r3.err
  echo "bench selfcheck rc=$?" >> artifacts/bench_selfcheck_r3.err
  touch /tmp/bench_selfcheck_done
fi
echo "queue6 done $(date)" > /tmp/queue6_done
