#!/bin/bash
# Round-5 property columns:
#  1. trained ML-EAM Ni (artifacts/mleam_ni, 30k) — the open BASELINE
#     row: paper ML-EAM Ni c11/c12/c44 = 274/163/131 GPa, E_v 1.71 eV
#     (ml-eam manuscript.tex:840-870).
#  2. ML-ADP Mo v5 (group-upweighted) — does Vacancy x5 move the E_v
#     blind spot (v1/v2: 4.47-5.06 eV vs paper 2.51)?  Elastic x3 vs
#     the DFT-parity elastic row.
set -u
export PYTHONPATH=/root/repo
export JAX_PLATFORMS=cpu

d=/root/repo/artifacts/mleam_ni
cd $d
M=model/snap_Ni_mleam.npz
log() { echo "[r5_props $(date -u +%H:%M:%S)] $*" >> /root/repo/artifacts/r5_props.log; }
log "mleam_ni latt"
timeout 1200 python -u -m tensoralloy_tpu.cli compute latt $M Ni > latt.json 2>> /root/repo/artifacts/r5_props.log
log "latt rc=$?"
log "mleam_ni elastic"
timeout 2400 python -u -m tensoralloy_tpu.cli compute elastic $M Ni > elastic.json 2>> /root/repo/artifacts/r5_props.log
log "elastic rc=$?"
log "mleam_ni defect"
timeout 3600 python -u -m tensoralloy_tpu.cli compute defect $M Ni > defect.json 2>> /root/repo/artifacts/r5_props.log
log "defect rc=$?"

d=/root/repo/artifacts/mladp_mo_v5
cd $d
M=model/snap_Mo_mladp_gw.npz
log "v5 latt"
timeout 1200 python -u -m tensoralloy_tpu.cli compute latt $M Mo > latt.json 2>> /root/repo/artifacts/r5_props.log
log "latt rc=$?"
log "v5 elastic"
timeout 2400 python -u -m tensoralloy_tpu.cli compute elastic $M Mo > elastic.json 2>> /root/repo/artifacts/r5_props.log
log "elastic rc=$?"
log "v5 defect"
timeout 3600 python -u -m tensoralloy_tpu.cli compute defect $M Mo > defect.json 2>> /root/repo/artifacts/r5_props.log
log "defect rc=$?"
log "all done"
