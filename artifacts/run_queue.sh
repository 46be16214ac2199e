#!/bin/bash
# Sequential TPU training queue for round 3: waits for the running
# snap_moni job, then runs each staged experiment in order. Each run
# auto-resumes from its newest checkpoint if interrupted.
set -u
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
QUEUE="snap_ni_refsf td_be snap_mo_v3 moni_zhou04"
# wait for the in-flight binary run
while ps -p "$(cat /tmp/snap_moni.pid 2>/dev/null)" >/dev/null 2>&1; do
  sleep 60
done
for d in $QUEUE; do
  cd /root/repo/artifacts/$d || continue
  if [ -f model/DONE ]; then continue; fi
  echo "=== queue: starting $d at $(date)" >> run.log
  python -u -m tensoralloy_tpu.cli run input.toml >> run.log 2>&1
  echo "=== queue: finished $d rc=$? at $(date)" >> run.log
  touch model/DONE 2>/dev/null || true
done
echo "queue done $(date)" > /tmp/queue_done
