#!/bin/bash
# Opportunistic chip probe: run probe_geom_layout.py on the TPU the
# moment queue20 releases it, if enough window remains before the
# driver's round-end bench (KILL_TS leaves the chip idle for it).
set -u
MARK=/root/repo/artifacts/markers
KILL_TS=1787207700
while :; do
  now=$(date +%s)
  [ "$now" -ge $((KILL_TS - 900)) ] && { echo "no window"; exit 0; }
  [ -f $MARK/queue20_done ] && break
  sleep 120
done
if [ ! -f $MARK/geom_probe_done ]; then
  cd /root/repo/artifacts
  PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout 700 \
    python -u probe_geom_layout.py > probe_geom_layout_r5.json \
    2> probe_geom_layout_r5.err
  echo "probe rc=$?"
  touch $MARK/geom_probe_done
fi
