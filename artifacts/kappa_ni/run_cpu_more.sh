#!/bin/bash
set -u
cd /root/repo/artifacts/kappa_ni
export PYTHONPATH=/root/repo
export JAX_PLATFORMS=cpu
for seed in 1 2; do
  timeout 3000 python -u -m tensoralloy_tpu.cli compute kappa \
    ni_zjw04.npz Ni --supercell 3 3 3 --temp 300 \
    --equil-steps 2000 --steps 60000 --sample 10 --timestep 2.0 \
    --seed $seed -o kappa_cpu_s$seed.csv >> run_cpu.log 2>&1
  echo "seed $seed rc=$? $(date)" >> run_cpu.log
done
for seed in 0 1; do
  timeout 6000 python -u -m tensoralloy_tpu.cli compute kappa \
    ni_zjw04.npz Ni --supercell 4 4 4 --temp 300 \
    --equil-steps 2000 --steps 60000 --sample 10 --timestep 2.0 \
    --seed $seed -o kappa_cpu_444_s$seed.csv >> run_cpu.log 2>&1
  echo "444 seed $seed rc=$? $(date)" >> run_cpu.log
done
echo "cpu kappa extras done $(date)" >> run_cpu.log
