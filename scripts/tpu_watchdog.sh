#!/bin/bash
# TPU-return watchdog: probe every 5 min; when the tunnel relay comes
# back, auto-launch the full re-certification sweep (scripts/recert.sh).
#
# Busy locks are honored only while FRESH (mtime < 300 s). Holders
# heartbeat-touch their lock every 60 s (scripts/recert.sh,
# scripts/with_box_lock.sh, tpu_guard.advertise_busy) and the
# heartbeats die with their holder, so a kill -9'd job cannot leave a
# permanently-fresh lock that silently disables the auto-recert.
# Gates:
#   /tmp/jax_busy.lock   — a JAX job holds the one-process slot;
#                          defer while fresh.
#   /tmp/recert_running  — a sweep is in flight (heartbeat-touched).
#   /tmp/recert_done     — a sweep already succeeded this round.
#   /tmp/recert_failed   — a sweep failed; left for manual triage.
cd /root/repo

# single instance: two watchdogs passing the done/failed gate in the
# same window would launch two concurrent sweeps — the exact
# concurrent-backend-init hang the lock system exists to prevent
exec 9>>/tmp/tpu_watchdog.flock
if ! flock -n 9; then
  echo "$(date -u +%H:%M:%S) another watchdog instance is running" >&2
  exit 1
fi

fresh() {  # fresh <path> [max_age_s] -> 0 iff exists and mtime is recent
  local p=$1 max=${2:-300} m now
  m=$(stat -c %Y "$p" 2>/dev/null) || return 1
  now=$(date +%s)
  [ $((now - m)) -lt "$max" ]
}

BUSY=/tmp/jax_busy.lock
while true; do
  ts=$(date -u +%H:%M:%S)
  if fresh "$BUSY" || fresh /tmp/recert_running; then
    echo "$ts probe-skipped (busy)" >> /tmp/tpu_probe.log
  else
    # advertise our own probe (a short JAX process): a driver arriving
    # mid-probe must defer, not init concurrently. Only remove the
    # file if we created it.
    made=0; [ -e "$BUSY" ] || { touch "$BUSY"; made=1; }
    ok=$(timeout 120 python -c "
from samplernn_pase_tpu.utils.tpu_guard import tpu_available
print('YES' if tpu_available(timeout_s=60, retries=0) else 'no')" 2>/dev/null)
    [ "$made" = 1 ] && rm -f "$BUSY"
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
