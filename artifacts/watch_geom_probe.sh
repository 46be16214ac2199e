#!/bin/bash
# Opportunistic chip work: the moment queue20 releases the TPU, run
# (1) the two layout probes, (2) the 2,048-atom one-shot row (the
# BASELINE.md 1.6 s small-cell reference point never measured here),
# if enough window remains before the driver's round-end bench.
set -u
MARK=/root/repo/artifacts/markers
KILL_TS=1787207700
while :; do
  now=$(date +%s)
  [ "$now" -ge $((KILL_TS - 1500)) ] && { echo "no window"; exit 0; }
  [ -f $MARK/queue20_done ] && break
  sleep 120
done
cd /root/repo/artifacts
for p in probe_geom_layout probe_grap_layout; do
  [ "$(date +%s)" -ge $((KILL_TS - 1200)) ] && { echo "window closed before $p"; exit 0; }
  if [ ! -f $MARK/${p}_done ]; then
    PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout 900 \
      python -u $p.py > ${p}_r5.json 2> ${p}_r5.err
    echo "$p rc=$?"
    touch $MARK/${p}_done
  fi
done
if [ "$(date +%s)" -lt $((KILL_TS - 1200)) ] \
   && [ ! -f $MARK/oneshot_2k_done ]; then
  ONESHOT_AXES=8 PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout 900 \
    python -u bench_oneshot_r5.py > bench_oneshot_2k_r5.json \
    2> bench_oneshot_2k_r5.err
  echo "oneshot2k rc=$?"
  touch $MARK/oneshot_2k_done
fi
