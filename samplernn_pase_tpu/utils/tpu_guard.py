"""Outage guard for TPU-only driver scripts (bench.py, perf_floor.py).

The dev box reaches its chip through a tunnel relay that can die
mid-session.  When it does, backend init does NOT raise promptly — the
process hangs at 0 CPU inside a connect-retry sleep — so an in-process
``try/except`` around ``jax.devices()`` is not a sufficient guard.  This
helper probes backend availability in a *subprocess* with a hard
timeout, retries once after a grace period (the backend also fails
transiently for ~30-60 s right after another process releases the
chip), and reports a clean boolean.

Scripts use it to emit one parsable JSON line
``{"skipped": true, "reason": "tpu_unavailable"}`` with exit code 0
instead of a raw traceback, so the driver can tell an outage from a
code regression (round-4 lesson: BENCH_r04.json rc=1 was an outage).
"""

import os
import subprocess
import sys
import time

_PROBE = (
    "import jax\n"
    "assert jax.default_backend() in ('tpu', 'axon'), jax.default_backend()\n"
    "jax.devices()[0]\n"
)


def tpu_available(timeout_s: float = 90.0, retries: int = 1,
                  retry_wait_s: float = 45.0) -> bool:
    """True iff a TPU backend initialises in a subprocess within
    ``timeout_s``.  Retries ``retries`` times after ``retry_wait_s``
    (transient post-release init failures).  Never raises, never hangs
    longer than (retries+1)*timeout_s + retries*retry_wait_s."""
    env = dict(os.environ)
    # PYTHONPATH=/root/repo breaks the axon plugin on this box; the
    # probe needs only stock jax, so drop it unconditionally.
    env.pop("PYTHONPATH", None)
    for attempt in range(retries + 1):
        try:
            r = subprocess.run(
                [sys.executable, "-c", _PROBE],
                timeout=timeout_s,
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
                env=env,
            )
            if r.returncode == 0:
                return True
        except (subprocess.TimeoutExpired, OSError):
            pass
        if attempt < retries:
            time.sleep(retry_wait_s)
    return False


def skip_marker(reason: str = "tpu_unavailable") -> str:
    """The one-line JSON the driver scripts print when skipping."""
    import json
    return json.dumps({"skipped": True, "reason": reason})
