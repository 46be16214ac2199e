#!/bin/bash
# Waits for the D' run (snap_mo_refsf_dpr) to end, then evaluates the
# newest checkpoint + matched steps 15000/30000 at exact f32 on CPU.
set -u
d=/root/repo/artifacts/snap_mo_refsf_dpr
log() { echo "[dpr-watch $(date -u +%H:%M:%S)] $*" >> /tmp/dpr_watch.log; }
PID=$(cat /tmp/mo_dlite.pid)
while kill -0 "$PID" 2>/dev/null; do sleep 120; done
log "dpr run ended"
if ls $d/model/ckpt-*.npz >/dev/null 2>&1; then
  env -u PYTHONPATH PYTHONPATH=/root/repo JAX_PLATFORMS=cpu timeout 1800 \
    python -u -m tensoralloy_tpu.cli evaluate $d >> $d/run.log 2>&1
  log "evaluate newest rc=$?"
  for s in 15000 30000; do
    [ -f $d/model/ckpt-$s.npz ] || continue
    env -u PYTHONPATH PYTHONPATH=/root/repo JAX_PLATFORMS=cpu timeout 1800 \
      python -u -m tensoralloy_tpu.cli evaluate $d \
      --ckpt $d/model/ckpt-$s.npz --output group_maes_ckpt$s.json \
      >> $d/run.log 2>&1
    log "evaluate ckpt-$s rc=$?"
  done
fi
log done; touch /tmp/dpr_eval_done
