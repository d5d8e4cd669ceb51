#!/bin/bash
# TPU-return watchdog v4: probe every 5 min; when the tunnel relay
# comes back, auto-launch the full re-certification sweep
# (scripts/recert.sh).
#
# v4 fix: busy locks are honored only while FRESH (mtime < 300 s).
# Holders heartbeat-touch their lock every 60 s (scripts/recert.sh,
# scripts/with_box_lock.sh); a kill -9'd holder leaves a stale file
# which v3 treated as busy FOREVER, silently disabling the auto-recert.
# Gates:
#   /tmp/jax_busy.lock   — an interactive session holds the one-JAX-
#                          process slot; defer while fresh.
#   /tmp/recert_running  — a sweep is in flight (heartbeat-touched).
#   /tmp/recert_done     — a sweep already succeeded this round.
#   /tmp/recert_failed   — a sweep failed; left for manual triage.
cd /root/repo

fresh() {  # fresh <path> [max_age_s] -> 0 iff exists and mtime is recent
  local p=$1 max=${2:-300} m now
  m=$(stat -c %Y "$p" 2>/dev/null) || return 1
  now=$(date +%s)
  [ $((now - m)) -lt "$max" ]
}

while true; do
  ts=$(date -u +%H:%M:%S)
  if fresh /tmp/jax_busy.lock || fresh /tmp/recert_running; then
    echo "$ts probe-skipped (busy)" >> /tmp/tpu_probe.log
  else
    ok=$(timeout 120 python -c "
from samplernn_pase_tpu.utils.tpu_guard import tpu_available
print('YES' if tpu_available(timeout_s=60, retries=0) else 'no')" 2>/dev/null)
    echo "$ts tpu=$ok" >> /tmp/tpu_probe.log
    if [ "$ok" = "YES" ]; then
      echo "$ts TPU IS BACK" >> /tmp/tpu_probe.log
      if [ ! -e /tmp/recert_done ] && [ ! -e /tmp/recert_failed ]; then
        echo "$ts launching recert sweep" >> /tmp/tpu_probe.log
        if bash scripts/recert.sh > /tmp/recert_sweep.log 2>&1; then
          touch /tmp/recert_done
          echo "$(date -u +%H:%M:%S) RECERT DONE" >> /tmp/tpu_probe.log
        else
          touch /tmp/recert_failed
          echo "$(date -u +%H:%M:%S) RECERT FAILED" >> /tmp/tpu_probe.log
        fi
      fi
    fi
  fi
  sleep 300
done
