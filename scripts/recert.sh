#!/bin/bash
# Full hardware re-certification sweep, in dependency order.
# Run from /root/repo with NO PYTHONPATH (it breaks the TPU plugin);
# one JAX process at a time — this script is strictly sequential.
# Each step logs to /tmp/recert_<step>.log. A failed step does NOT
# stop the sweep (a marginal perf-floor miss must not block bench.py,
# the metric of record, from running and warming the persistent
# compile cache) — but if the TPU becomes unreachable after a failure,
# the remaining steps are aborted instead of serially hanging into
# their 2 h timeouts. Expected wall time: 30-60 min warm cache, up to
# ~2 h cold (megakernel compiles are 3-6 min each through the tunnel).
set -u
cd "$(dirname "$0")/.."

# Advertise the sweep to other driver scripts (tpu_guard waits on a
# FRESH /tmp/recert_running instead of probing into a busy chip and
# reporting a false outage), heartbeat-touching it every 60 s so a
# killed sweep's stale lock is ignored. The heartbeat re-touches only
# while THIS script is alive (kill -0): a kill -9'd sweep (EXIT trap
# never fires on SIGKILL) must not leave an orphaned subshell keeping
# the lock fresh forever. Our own steps are exempted from the wait or
# they would deadlock on this very lock.
LOCK=/tmp/recert_running
MAIN=$$
touch "$LOCK"
( while kill -0 "$MAIN" 2>/dev/null; do
    touch "$LOCK" 2>/dev/null
    sleep 60
  done
  rm -f "$LOCK" ) &
HB_PID=$!
trap 'kill "$HB_PID" 2>/dev/null; rm -f "$LOCK"' EXIT
export SRNN_BOX_LOCK_EXEMPT=1

steps=(
  "tpu_check:python scripts/tpu_check.py"
  "perf_floor:python scripts/perf_floor.py"
  "bench:python bench.py"
  "quality_smoke:python scripts/quality_smoke.py"
  "vpu_ceiling:python scripts/vpu_ceiling.py"
  "bench_pool:python scripts/bench_pool.py"
  "dryrun:python -c 'import __graft_entry__ as g; g.dryrun_multichip(8); print(\"DRYRUN OK\")'"
)

tpu_reachable() {
  timeout 150 python -c "
from samplernn_pase_tpu.utils.tpu_guard import tpu_available
import sys
sys.exit(0 if tpu_available(timeout_s=60, retries=0) else 1)" 2>/dev/null
}

failed=()
for entry in "${steps[@]}"; do
  name="${entry%%:*}"; cmd="${entry#*:}"
  log="/tmp/recert_${name}.log"
  echo "== ${name} -> ${log} ($(date -u +%H:%M:%S))"
  timeout 7200 bash -c "$cmd" > "$log" 2>&1
  rc=$?
  if [ "$rc" -ne 0 ]; then
    echo "FAILED: ${name} (rc=${rc}$([ "$rc" -eq 124 ] && echo ', timed out')) — see ${log}"
    tail -5 "$log"
    failed+=("$name")
    # A dead tunnel relay makes every later JAX step hang to its 2 h
    # timeout; re-probe and abort the cascade if the chip is gone.
    if ! tpu_reachable; then
      echo "TPU UNREACHABLE after ${name} — aborting remaining steps ($(date -u +%H:%M:%S))"
      failed+=("tpu_lost")
      break
    fi
    continue
  fi
  tail -2 "$log"
done
if [ "${#failed[@]}" -gt 0 ]; then
  echo "RECERT SWEEP FINISHED WITH FAILURES: ${failed[*]} ($(date -u +%H:%M:%S))"
  exit 1
fi
echo "RECERT SWEEP COMPLETE ($(date -u +%H:%M:%S))"
