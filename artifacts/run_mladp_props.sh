#!/bin/bash
# ML-ADP Mo (artifacts/mladp_mo, 30k steps) — step-2 validation:
# per-group test MAEs + the ml-eam paper's Mo property columns
# (a, c11/c12/c44, E_v), all computed by the native verbs on CPU at
# exact f32.  Paper targets (ml-eam manuscript.tex:996-1020):
# 20.6 meV/atom / 0.24 eV/A; c11/c12/c44 = 469/159/102; E_v 2.51 eV.
set -u
# the axon TPU plugin (sitecustomize in /root/.axon_site) overrides
# JAX_PLATFORMS — CPU runs must strip it from PYTHONPATH entirely
export PYTHONPATH=/root/repo
export JAX_PLATFORMS=cpu
cd /root/repo/artifacts/mladp_mo
M=model/snap_Mo_mladp.npz
log() { echo "[mladp_props $(date -u +%H:%M:%S)] $*" >> props.log; }

log "evaluate (group MAEs at 30k)"
timeout 2400 python -u -m tensoralloy_tpu.cli evaluate . > eval_30k.json 2>> props.log
log "evaluate rc=$?"
timeout 1200 python -u -m tensoralloy_tpu.cli compute latt $M Mo > latt.json 2>> props.log
log "latt rc=$?"
timeout 2400 python -u -m tensoralloy_tpu.cli compute elastic $M Mo > elastic.json 2>> props.log
log "elastic rc=$?"
timeout 3600 python -u -m tensoralloy_tpu.cli compute defect $M Mo > defect.json 2>> props.log
log "defect rc=$?"
log "all done"
