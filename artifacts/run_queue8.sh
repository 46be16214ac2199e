#!/bin/bash
# Round-3 queue v6: the axon pool went unresponsive ~19:45 (trivial
# matmul probes hang). Probe every 5 min with a tiny program; when the
# chip answers again, hand off to queue6 (refsf resume + bench).
set -u
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
END_TS=1787016000
HARD_STOP=$((END_TS - 3000))

while [ "$(date +%s)" -lt "$HARD_STOP" ]; do
  if timeout 180 python -c "
import jax, jax.numpy as jnp
print(float((jnp.ones((8,8)) @ jnp.ones((8,8))).sum()))" \
      > /tmp/axon_probe.out 2>&1; then
    echo "axon back at $(date)" >> /tmp/axon_probe.log
    exec /root/repo/artifacts/run_queue6.sh
  fi
  echo "axon still down at $(date)" >> /tmp/axon_probe.log
  sleep 300
done
