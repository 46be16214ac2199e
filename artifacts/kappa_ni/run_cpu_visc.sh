#!/bin/bash
# After the long kappa seeds: shear viscosity of MOLTEN Ni (2200 K,
# well above zjw04 melting) as the compute-visc production demo.
set -u
cd /root/repo/artifacts/kappa_ni
export PYTHONPATH=/root/repo
export JAX_PLATFORMS=cpu
while ! grep -q "cpu kappa long done" run_cpu.log 2>/dev/null; do
  sleep 60
done
timeout 3500 python -u -m tensoralloy_tpu.cli compute visc \
  ni_zjw04.npz Ni --supercell 3 3 3 --temp 2200 \
  --equil-steps 20000 --steps 200000 --sample 10 --timestep 2.0 \
  --max-lag 500 --nvt-production --friction 0.02 --seed 4 \
  -o visc_liquid_2200K.csv >> run_cpu.log 2>&1
echo "visc rc=$? $(date)" >> run_cpu.log
