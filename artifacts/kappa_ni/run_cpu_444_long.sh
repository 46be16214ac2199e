#!/bin/bash
set -u
cd /root/repo/artifacts/kappa_ni
export PYTHONPATH=/root/repo
export JAX_PLATFORMS=cpu
timeout 3300 python -u -m tensoralloy_tpu.cli compute kappa \
  ni_zjw04.npz Ni --supercell 4 4 4 --temp 300 \
  --equil-steps 4000 --steps 300000 --sample 10 --timestep 2.0 \
  --max-lag 750 --seed 20 -o kappa_cpu_444_long_s0.csv \
  >> run_cpu.log 2>&1
echo "444 long rc=$? $(date)" >> run_cpu.log
