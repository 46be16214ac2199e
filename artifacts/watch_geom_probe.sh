#!/bin/bash
# Opportunistic chip probes: run the two layout probes on the TPU the
# moment queue20 releases it, if enough window remains before the
# driver's round-end bench (KILL_TS leaves the chip idle for it).
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
  [ "$(date +%s)" -ge $((KILL_TS - 1200)) ] && { echo "window closed before $p"; break; }
  if [ ! -f $MARK/${p}_done ]; then
    PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout 900 \
      python -u $p.py > ${p}_r5.json 2> ${p}_r5.err
    echo "$p rc=$?"
    touch $MARK/${p}_done
  fi
done
