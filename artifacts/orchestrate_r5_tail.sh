#!/bin/bash
# Round-5 tail orchestrator (replaces the killed queue20 controller):
# wait for the kappa n500 s1 child it left running, then use the last
# chip window for (1) the precision-pinned GRAP layout re-probe and
# (2) a third 256-atom kappa seed bounded to end 10 min before
# KILL_TS so the driver's round-end bench gets an idle chip.
set -u
KILL_TS=1787207700
S1_PID=${1:?pid of running kappa s1 python}
MARK=/root/repo/artifacts/markers
log() { echo "[tail $(date +%H:%M:%S)] $*" >> /root/repo/artifacts/queue20.log; }

while kill -0 "$S1_PID" 2>/dev/null; do sleep 30; done
log "kappa n500 s1 finished"
sleep 10

cd /root/repo/artifacts
if [ "$(date +%s)" -lt $((KILL_TS - 1500)) ]; then
  PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout 1200 \
    python -u probe_grap_layout.py > probe_grap_layout_r5b.json \
    2> probe_grap_layout_r5b.err
  log "grap layout re-probe rc=$?"
  touch $MARK/probe_grap_layout_b_done
fi

if [ "$(date +%s)" -lt $((KILL_TS - 1200)) ]; then
  PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout 600 \
    python -u smoke_microbatch_chip.py > smoke_microbatch_chip.json \
    2> smoke_microbatch_chip.err
  log "microbatch chip smoke rc=$?"
fi

cd /root/repo/artifacts/kappa_ni
now=$(date +%s)
budget=$((KILL_TS - 600 - now))
if [ "$budget" -gt 900 ] && [ ! -f kappa_chip_n256_s2.csv ]; then
  log "kappa n=256 seed=2 starting (budget ${budget}s)"
  PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout "$budget" \
    python -u -m tensoralloy_tpu.cli compute kappa ni_zjw04.npz Ni \
    --supercell 4 4 4 --temp 300 --equil-steps 4000 --steps 300000 \
    --sample 10 --timestep 2.0 --device-nl --seed 2 \
    -o kappa_chip_n256_s2.csv >> run.log 2>&1
  log "kappa n=256 seed=2 rc=$?"
fi
log "tail orchestrator done"
touch $MARK/r5_tail_done
