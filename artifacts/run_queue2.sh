#!/bin/bash
# Stage-2 queue: waits for the stage-1 queue, then runs the
# stress-focused binary fine-tune and the per-subset evaluations.
set -u
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
while [ ! -f /tmp/queue_done ]; do sleep 60; done
for d in snap_moni_v2; do
  cd /root/repo/artifacts/$d || continue
  if [ -f model/DONE ]; then continue; fi
  echo "=== queue2: starting $d at $(date)" >> run.log
  python -u -m tensoralloy_tpu.cli run input.toml >> run.log 2>&1
  echo "=== queue2: finished $d rc=$? at $(date)" >> run.log
  python -u evaluate.py . >> run.log 2>&1
  touch model/DONE 2>/dev/null || true
done
echo "queue2 done $(date)" > /tmp/queue2_done
