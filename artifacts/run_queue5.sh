#!/bin/bash
# Round-3 continuation queue v3: after queue4 drains (snap_mo_v3),
# run the reference-protocol radial-SF Mo reproduction, then a
# bench.py self-check so the driver contract is validated after this
# session's changes. Same time guards as queue4.
set -u
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
END_TS=1787016000
LAUNCH_CUTOFF=$((END_TS - 2400))
KILL_TS=$((END_TS - 2700))

while [ ! -f /tmp/queue4_done ]; do
  [ "$(date +%s)" -ge "$LAUNCH_CUTOFF" ] && exit 0
  sleep 30
done

d=snap_mo_refsf
if [ "$(date +%s)" -lt "$LAUNCH_CUTOFF" ] && [ ! -f /root/repo/artifacts/$d/model/DONE ]; then
  cd /root/repo/artifacts/$d || exit 1
  echo "=== queue5: starting $d at $(date)" >> run.log
  python -u -m tensoralloy_tpu.cli run input.toml >> run.log 2>&1 &
  RUNPID=$!
  echo $RUNPID > /tmp/current_run.pid
  while ps -p $RUNPID >/dev/null 2>&1; do
    if [ "$(date +%s)" -ge "$KILL_TS" ]; then kill $RUNPID; sleep 10; fi
    sleep 30
  done
  wait $RUNPID 2>/dev/null
  echo "=== queue5: finished $d rc=$? at $(date)" >> run.log
  touch model/DONE 2>/dev/null || true
fi

# bench self-check (driver contract) if time remains
if [ "$(date +%s)" -lt "$((KILL_TS - 2400))" ] && [ ! -f /tmp/bench_selfcheck_done ]; then
  cd /root/repo
  timeout 2400 python -u bench.py > artifacts/bench_selfcheck_r3.json 2> artifacts/bench_selfcheck_r3.err
  echo "bench selfcheck rc=$?" >> artifacts/bench_selfcheck_r3.err
  touch /tmp/bench_selfcheck_done
fi
echo "queue5 done $(date)" > /tmp/queue5_done
