#!/bin/bash
# CPU fallback Green-Kubo production (axon pool down since ~19:45):
# one seed, 3x3x3 zjw04 Ni, flux inside the jitted chunk.
set -u
cd /root/repo/artifacts/kappa_ni
export PYTHONPATH=/root/repo
export JAX_PLATFORMS=cpu
timeout 9000 python -u -m tensoralloy_tpu.cli compute kappa \
  ni_zjw04.npz Ni --supercell 3 3 3 --temp 300 \
  --equil-steps 2000 --steps 60000 --sample 10 --timestep 2.0 \
  --seed 0 -o kappa_cpu_s0.csv >> run_cpu.log 2>&1
echo "cpu kappa rc=$? $(date)" >> run_cpu.log
