#!/bin/bash
# Run a command while advertising "this box's one-JAX-process slot is
# taken" via /tmp/jax_busy.lock, heartbeat-touched every 60 s.
#
# Why: concurrent JAX backend init on this box HANGS (one process at a
# time through the tunnel relay). The TPU-return watchdog and the
# driver scripts' tpu_guard both honor this lock — but only while its
# mtime stays fresh, so a killed wrapper's stale lock is ignored
# rather than disabling the auto-recert forever.
#
# Usage: bash scripts/with_box_lock.sh python -m pytest tests/ -x -q
set -u
LOCK=/tmp/jax_busy.lock
touch "$LOCK"
( while true; do touch "$LOCK" 2>/dev/null; sleep 60; done ) &
HB_PID=$!
trap 'kill "$HB_PID" 2>/dev/null; rm -f "$LOCK"' EXIT
"$@"
