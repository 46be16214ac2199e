#!/bin/bash
# Round-5 CPU chain (the chip is owned by run_queue19.sh).
# Sequential on the 1-core host:
#   1. mladp_mo_v4 — the paper's stated chi weights (f=2, rose=10,
#      elastic=0.01), single-protocol-knob vs v3.
#   2. evaluate v4 (exact f32) + property columns.
#   3. mladp_mo_v5 — group-upweighted data (Vacancy x5, Elastic x3).
#   4. evaluate v5.
# All subprocesses strip the axon plugin (JAX_PLATFORMS alone is
# overridden by its sitecustomize).
set -u
CPU_ENV() { env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu "$@"; }
END_TS=1787207000
QLOG=/root/repo/artifacts/cpu_r5.log
log() { echo "[cpu-r5 $(date -u +%H:%M:%S)] $*" >> $QLOG; }

train_cpu() {
  local d=$1
  cd "$d" || return 1
  log "training $(basename $d)"
  local START=$(date +%s)
  CPU_ENV timeout $((END_TS - START > 0 ? END_TS - START : 60)) \
    python -u -m tensoralloy_tpu.cli run input.toml >> run.log 2>&1
  log "$(basename $d) train rc=$?"
}

eval_cpu() {
  local d=$1
  if ls $d/model/ckpt-*.npz >/dev/null 2>&1; then
    cd $d
    CPU_ENV timeout 3000 python -u -m tensoralloy_tpu.cli evaluate $d \
      >> run.log 2>&1
    log "$(basename $d) evaluate rc=$?"
  fi
}

log "cpu-r5 start"

d=/root/repo/artifacts/mladp_mo_v4
if [ ! -f $d/model/DONE ]; then
  train_cpu $d
  ls $d/model/*.npz >/dev/null 2>&1 && touch $d/model/DONE
fi
eval_cpu $d

d=/root/repo/artifacts/mladp_mo_v5
if [ ! -f $d/snap-Mo-gw.db ]; then
  CPU_ENV python -u $d/prep_db.py >> $d/run.log 2>&1
  log "v5 prep_db rc=$?"
fi
if [ -f $d/snap-Mo-gw.db ] && [ ! -f $d/model/DONE ] \
   && [ "$(date +%s)" -lt "$((END_TS - 3600))" ]; then
  train_cpu $d
  ls $d/model/*.npz >/dev/null 2>&1 && touch $d/model/DONE
fi
eval_cpu $d

log "cpu-r5 done"
