#!/bin/bash
# Full hardware re-certification sweep, in dependency order.
# Run from /root/repo with NO PYTHONPATH (it breaks the TPU plugin);
# one JAX process at a time — this script is strictly sequential.
# Each step logs to /tmp/recert_<step>.log and the sweep stops on the
# first failure. Expected wall time: 30-60 min warm cache, up to ~2 h
# cold (megakernel compiles are 3-6 min each through the tunnel).
set -u
cd "$(dirname "$0")/.."

steps=(
  "tpu_check:python scripts/tpu_check.py"
  "perf_floor:python scripts/perf_floor.py"
  "bench:python bench.py"
  "quality_smoke:python scripts/quality_smoke.py"
  "vpu_ceiling:python scripts/vpu_ceiling.py"
  "bench_pool:python scripts/bench_pool.py"
  "dryrun:python -c 'import __graft_entry__ as g; g.dryrun_multichip(8); print(\"DRYRUN OK\")'"
)

# Run ALL steps even if one fails: a marginal perf-floor miss must not
# block bench.py (the metric of record) from running and warming the
# persistent compile cache for the driver's own bench invocation.
failed=()
for entry in "${steps[@]}"; do
  name="${entry%%:*}"; cmd="${entry#*:}"
  log="/tmp/recert_${name}.log"
  echo "== ${name} -> ${log} ($(date -u +%H:%M:%S))"
  if ! timeout 7200 bash -c "$cmd" > "$log" 2>&1; then
    echo "FAILED: ${name} (rc=$?) — see ${log}"
    tail -5 "$log"
    failed+=("$name")
    continue
  fi
  tail -2 "$log"
done
if [ "${#failed[@]}" -gt 0 ]; then
  echo "RECERT SWEEP FINISHED WITH FAILURES: ${failed[*]} ($(date -u +%H:%M:%S))"
  exit 1
fi
echo "RECERT SWEEP COMPLETE ($(date -u +%H:%M:%S))"
