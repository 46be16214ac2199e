#!/bin/bash
set -u
cd /root/repo/artifacts/kappa_ni
export PYTHONPATH=/root/repo
export JAX_PLATFORMS=cpu
for seed in 0 1 2; do
  timeout 3500 python -u -m tensoralloy_tpu.cli compute kappa \
    ni_zjw04.npz Ni --supercell 3 3 3 --temp 300 \
    --equil-steps 4000 --steps 300000 --sample 10 --timestep 2.0 \
    --max-lag 750 --seed $((seed + 10)) \
    -o kappa_cpu_long_s$seed.csv >> run_cpu.log 2>&1
  echo "long seed $seed rc=$? $(date)" >> run_cpu.log
done
echo "cpu kappa long done $(date)" >> run_cpu.log
