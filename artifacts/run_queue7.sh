#!/bin/bash
# Round-3 queue v5: after the bench self-check, run a REAL Green-Kubo
# thermal-conductivity production for zjw04 Ni on the chip -- fully
# chip-resident (device-NL MD with the heat flux inside the jitted
# chunk), 3 seeds for an error bar.
set -u
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
END_TS=1787016000
HARD_STOP=$((END_TS - 2400))

while [ ! -f /tmp/bench_selfcheck_done ]; do
  [ "$(date +%s)" -ge "$HARD_STOP" ] && exit 0
  sleep 60
done

d=/root/repo/artifacts/kappa_ni
cd $d || exit 1
[ -f ni_zjw04.npz ] || python make_model.py >> run.log 2>&1
for seed in 0 1 2; do
  [ "$(date +%s)" -ge "$HARD_STOP" ] && break
  [ -f kappa_s$seed.csv ] && continue
  echo "=== kappa seed $seed at $(date)" >> run.log
  timeout 3000 python -u -m tensoralloy_tpu.cli compute kappa \
    ni_zjw04.npz Ni --supercell 4 4 4 --temp 300 \
    --equil-steps 4000 --steps 100000 --sample 10 --timestep 2.0 \
    --device-nl --seed $seed -o kappa_s$seed.csv >> run.log 2>&1
  echo "=== seed $seed rc=$? at $(date)" >> run.log
done
echo "queue7 done $(date)" > /tmp/queue7_done
