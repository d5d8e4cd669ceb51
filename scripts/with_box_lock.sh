#!/bin/bash
# Run a command while advertising "this box's one-JAX-process slot is
# taken" via /tmp/jax_busy.lock, heartbeat-touched every 60 s.
#
# Why: concurrent JAX backend init on this box HANGS (one process at a
# time through the tunnel relay). The TPU-return watchdog and the
# driver scripts' tpu_guard both honor this lock — but only while its
# mtime stays fresh. The heartbeat re-touches only while this wrapper
# is alive (kill -0): a kill -9'd wrapper stops refreshing within 60 s,
# so its stale lock cannot disable the auto-recert forever.
#
# The child is exempted from waiting on THIS lock (and only this one):
# a run_guarded driver script launched under the wrapper would
# otherwise see its own wrapper's always-fresh lock and false-skip
# with "box_busy".
#
# Usage: bash scripts/with_box_lock.sh python -m pytest tests/ -x -q
set -u
LOCK=/tmp/jax_busy.lock
MAIN=$$
touch "$LOCK"
( while kill -0 "$MAIN" 2>/dev/null; do
    touch "$LOCK" 2>/dev/null
    sleep 60
  done
  rm -f "$LOCK" ) &
HB_PID=$!
trap 'kill "$HB_PID" 2>/dev/null; rm -f "$LOCK"' EXIT
SRNN_BOX_LOCK_EXEMPT="$LOCK" "$@"
