#!/bin/bash
set -u
cd /root/repo/artifacts/kappa_ni
export PYTHONPATH=/root/repo
export JAX_PLATFORMS=cpu
timeout 3500 python -u -m tensoralloy_tpu.cli compute visc \
  ni_zjw04.npz Ni --supercell 3 3 3 --temp 2400 \
  --equil-steps 40000 --steps 200000 --sample 10 --timestep 2.0 \
  --max-lag 400 --friction 0.1 --seed 7 \
  -o visc_liquid_nve.csv >> run_cpu.log 2>&1
echo "visc2 rc=$? $(date)" >> run_cpu.log
