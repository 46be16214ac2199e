#!/bin/bash
# Round-5 layout-probe watcher, corrected trigger: the old watcher
# waited for markers/queue20_done, which only appears after the kappa
# phase ends at KILL_TS — i.e. never in time.  The real chip window is
# the eval_groups gap right after snap_moni_ref11 finishes training
# (queue20 evaluates on CPU for up to 3000 s before kappa grabs the
# device).  Trigger on ref11's model/DONE (or its trainer PID exiting),
# then run both layout probes and the 2,048-atom one-shot row.
set -u
MARK=/root/repo/artifacts/markers
KILL_TS=1787207700
# Trigger ONLY on the DONE marker (or the q19_moni_ref11_done marker
# queue20 writes when it gives up on training) — NOT on trainer-PID
# death: the stall watchdog kills wedged attempts and relaunches, and
# a PID trigger would race the probes against attempt N+1's tunnel.
while :; do
  now=$(date +%s)
  [ "$now" -ge $((KILL_TS - 1800)) ] && { echo "no window"; exit 0; }
  [ -f /root/repo/artifacts/snap_moni_ref11/model/DONE ] && break
  [ -f $MARK/q19_moni_ref11_done ] && break
  sleep 60
done
sleep 20   # let the trainer export + release the tunnel
cd /root/repo/artifacts
for p in probe_geom_layout probe_grap_layout; do
  [ "$(date +%s)" -ge $((KILL_TS - 1200)) ] && { echo "window closed before $p"; exit 0; }
  if [ ! -f $MARK/${p}_done ]; then
    PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout 1500 \
      python -u $p.py > ${p}_r5.json 2> ${p}_r5.err
    echo "$p rc=$?"
    touch $MARK/${p}_done
  fi
done
if [ "$(date +%s)" -lt $((KILL_TS - 1500)) ] \
   && [ ! -f $MARK/oneshot_2k_done ]; then
  ONESHOT_AXES=8 PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout 900 \
    python -u bench_oneshot_r5.py > bench_oneshot_2k_r5.json \
    2> bench_oneshot_2k_r5.err
  echo "oneshot2k rc=$?"
  touch $MARK/oneshot_2k_done
fi
echo "watch_r5_probes done"
