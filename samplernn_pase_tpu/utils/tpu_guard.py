"""Outage guard for TPU-only driver scripts (bench.py, perf_floor.py).

The dev box reaches its chip through a tunnel relay that can die
mid-session.  When it does, backend init does NOT raise promptly — the
process hangs at 0 CPU inside a connect-retry sleep — so an in-process
``try/except`` around ``jax.devices()`` is not a sufficient guard.  This
helper probes backend availability in a *subprocess* with a hard
timeout and reports a clean boolean; retries are reserved for the
failure modes that are actually transient (the backend also fails for
~30-60 s right after another process releases the chip), while a
deterministic "this box has no TPU" assert returns immediately.

Scripts use it to emit one parsable JSON line
``{"skipped": true, "reason": "tpu_unavailable"}`` with exit code 0
instead of a raw traceback, so the driver can tell an outage from a
code regression (round-4 lesson: BENCH_r04.json rc=1 was an outage).

A successful probe has a sting in its tail: the probe subprocess
itself claims and releases the chip, which is exactly the state in
which the PARENT's own backend init is documented to fail transiently.
jax caches a platform's init failure for the process lifetime, so an
in-process retry cannot recover — ``run_guarded`` therefore re-execs
the script once (fresh process, fresh jax) after a grace period, and
only then emits the skip marker.
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

_RETRIED_ENV = "_SRNN_TPU_GUARD_RETRIED"

# One JAX process at a time on this box: concurrent backend init HANGS.
# Long-running JAX jobs advertise themselves via these lock files (the
# auto-recert sweep heartbeats /tmp/recert_running; interactive
# sessions touch /tmp/jax_busy.lock) so a driver script arriving
# mid-job waits its turn instead of timing out its probe and reporting
# a false outage.  Holders are expected to re-touch their lock (the
# recert sweep does, every 60 s); a lock whose mtime goes stale is
# treated as abandoned and ignored.
_BOX_LOCKS = ("/tmp/recert_running", "/tmp/jax_busy.lock")
_BUSY_LOCK = "/tmp/jax_busy.lock"
# "1" exempts ALL locks (the recert sweep sets this for its steps —
# they hold the whole box); a os.pathsep-separated path list exempts
# only those locks (with_box_lock.sh exempts its own /tmp/jax_busy.lock
# so a run_guarded child doesn't false-skip on its wrapper's lock,
# while still honoring a concurrent sweep's recert_running).
_LOCK_EXEMPT_ENV = "SRNN_BOX_LOCK_EXEMPT"


def _exempt_locks() -> set:
    v = os.environ.get(_LOCK_EXEMPT_ENV, "")
    if not v:
        return set()
    if v == "1":
        return set(_BOX_LOCKS) | {"*"}
    return {os.path.abspath(p) for p in v.split(os.pathsep) if p}


def held_box_locks(fresh_s: float = 300.0, locks=_BOX_LOCKS) -> list:
    """Busy locks currently held (exist and mtime < ``fresh_s``),
    minus any this process is exempted from (see _LOCK_EXEMPT_ENV).
    Holders heartbeat-touch every 60 s, so a stale file is an abandoned
    lock from a killed holder, not a live job."""
    exempt = _exempt_locks()
    if "*" in exempt:
        return []
    now = time.time()
    out = []
    for p in locks:
        if os.path.abspath(p) in exempt:
            continue
        try:
            if now - os.path.getmtime(p) < fresh_s:
                out.append(p)
        except OSError:
            pass
    return out


def wait_for_box_idle(max_wait_s: float = 2400.0, fresh_s: float = 300.0,
                      poll_s: float = 15.0, locks=_BOX_LOCKS) -> list:
    """Bounded wait while another JAX job advertises it holds this box.

    Returns the locks STILL held at return (empty = box idle) — a
    caller must not probe into a busy box: concurrent backend init
    hangs BOTH processes, so timing out the wait means skip, not probe.
    Exempt (returns [] immediately) when ``SRNN_BOX_LOCK_EXEMPT=1`` —
    the recert sweep sets this for its own steps, which would otherwise
    deadlock on the sweep's own lock."""
    t0 = time.time()
    held = held_box_locks(fresh_s, locks)
    if held:
        # stdout is the driver's parse surface (one JSON line) — notes
        # go to stderr
        print(f"tpu_guard: box busy ({', '.join(held)}); waiting up to "
              f"{max_wait_s:.0f}s", file=sys.stderr)
    while held and time.time() - t0 < max_wait_s:
        time.sleep(poll_s)
        held = held_box_locks(fresh_s, locks)
    return held


class advertise_busy:
    """Hold /tmp/jax_busy.lock (heartbeat-touched every 60 s from a
    daemon thread) for the duration of a JAX job, so the TPU-return
    watchdog and other drivers defer instead of probing into it —
    concurrent backend init hangs BOTH processes on this box.

    The lock file is removed on exit only if this process created it
    (an enclosing with_box_lock.sh owns its own file and keeps
    re-touching it); a process killed before exit stops heartbeating,
    so the lock goes stale within the 300 s freshness window instead
    of wedging the watchdog forever."""

    def __init__(self, lock: str | None = None, beat_s: float = 60.0):
        self._lock = _BUSY_LOCK if lock is None else lock
        self._beat_s = beat_s
        self._stop = None
        self._created = False

    def __enter__(self):
        import threading
        self._created = not os.path.exists(self._lock)
        try:
            with open(self._lock, "a"):
                os.utime(self._lock, None)
        except OSError:
            return self          # unwritable /tmp: advertise best-effort
        self._stop = threading.Event()

        def _beat():
            while not self._stop.wait(self._beat_s):
                try:
                    os.utime(self._lock, None)
                except OSError:
                    pass

        threading.Thread(target=_beat, daemon=True).start()
        return self

    def __exit__(self, *exc):
        if self._stop is not None:
            self._stop.set()
        if self._created:
            try:
                os.remove(self._lock)
            except OSError:
                pass
        return False


def _sanitized_probe_env(env: dict) -> dict:
    """Probe-subprocess env: PYTHONPATH entries pointing at THIS repo
    break the axon plugin on this box (round-4 lesson: the repo dir
    shadows plugin modules), but the variable itself must survive —
    since round 5 the plugin is itself loaded via
    ``PYTHONPATH=/root/.axon_site``, and dropping it wholesale made the
    probe fail with "Backend 'axon' is not in the list of known
    backends" while the chip was perfectly healthy (bench/tpu_check
    skip-marked a live TPU).  Filter only the repo path; keep the rest."""
    pp = env.get("PYTHONPATH")
    if pp:
        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        kept = [p for p in pp.split(os.pathsep)
                if p and os.path.abspath(p) != repo]
        if kept:
            env["PYTHONPATH"] = os.pathsep.join(kept)
        else:
            env.pop("PYTHONPATH", None)
    return env


def _probe_once(timeout_s: float):
    """Run the probe subprocess once. Returns (ok, transient): ok when
    the backend initialized; transient when a retry could plausibly
    change the outcome (hang/timeout or an init-time UNAVAILABLE), as
    opposed to the deterministic no-TPU assert."""
    env = _sanitized_probe_env(dict(os.environ))
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE],
            timeout=timeout_s,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.PIPE,
            env=env,
        )
    except subprocess.TimeoutExpired:
        return False, True          # hang: dead relay or busy chip
    except OSError:
        return False, True
    if r.returncode == 0:
        return True, False
    err = (r.stderr or b"").decode(errors="replace")
    # AssertionError = the backend initialized fine but is cpu/gpu —
    # deterministic, retrying burns 45 s on every CPU-only box
    transient = "AssertionError" not in err
    return False, transient


def tpu_available(timeout_s: float = 90.0, retries: int = 1,
                  retry_wait_s: float = 45.0) -> bool:
    """True iff a TPU backend initialises in a subprocess within
    ``timeout_s``.  Retries ``retries`` times after ``retry_wait_s``,
    but only for transient failure modes (timeout / init UNAVAILABLE);
    a deterministic non-TPU backend returns False immediately.  Never
    raises, never hangs longer than
    (retries+1)*timeout_s + retries*retry_wait_s."""
    for attempt in range(retries + 1):
        ok, transient = _probe_once(timeout_s)
        if ok:
            return True
        if not transient:
            return False
        if attempt < retries:
            time.sleep(retry_wait_s)
    return False


def pin_reachable_platform(timeout_s: float = 60.0) -> str:
    """For examples/demos that should run ANYWHERE rather than skip:
    pin jax to CPU when no TPU backend is actually reachable, and
    return the platform chosen ("tpu" or "cpu").

    A dead tunnel relay makes in-process backend init HANG (not raise),
    so the probe runs in a subprocess with a hard timeout; call this
    BEFORE the first backend-touching op.  When a TPU is reachable the
    platform is left for normal selection, so the demo runs the real
    device pipeline.  (The probe subprocess claims and releases the
    chip, so the caller's own init can still fail transiently for
    ~30-60 s right after — that raises promptly and a rerun recovers;
    the hang is what this helper exists to avoid.)  On a plain CPU box
    the probe fails its backend assert immediately — no retry wait."""
    import jax

    if tpu_available(timeout_s=timeout_s, retries=0):
        return "tpu"
    jax.config.update("jax_platforms", "cpu")
    return "cpu"


def skip_marker(reason: str = "tpu_unavailable") -> str:
    """The one-line JSON the driver scripts print when skipping."""
    import json
    return json.dumps({"skipped": True, "reason": reason})


def _is_backend_init_error(exc: BaseException) -> bool:
    s = str(exc)
    return ("Unable to initialize backend" in s
            or "failed to initialize" in s.lower()
            or "UNAVAILABLE" in s)


def run_guarded(body, retry_wait_s: float = 45.0) -> int:
    """Run a TPU driver script's body behind the outage guard.

    * no TPU reachable -> print the skip marker, rc 0;
    * the parent's own backend init fails transiently right after the
      probe released the chip -> re-exec this script ONCE (jax caches
      the failed platform for the process lifetime, so an in-process
      retry cannot work) after ``retry_wait_s``;
    * still failing after the re-exec -> skip marker, rc 0 (an init
      failure with a live relay is the documented post-release
      transient, not a code regression);
    * anything else raises normally (a real regression should be rc 1).

    Before probing, waits (bounded) for any advertised box-busy lock —
    most importantly the auto-recert sweep: if the tunnel relay returns
    shortly before the driver's round-end bench run, the sweep holds
    the chip for 30-60 min and a concurrent probe would time out and
    record a false "tpu_unavailable" skip.  If the box is STILL busy
    when the wait expires (a cold sweep can compile for ~2 h), emit a
    distinct ``box_busy`` skip rather than probing: concurrent backend
    init on this box hangs BOTH processes, so probing into a live job
    could wedge the sweep mid-certification.
    """
    still_held = wait_for_box_idle()
    if still_held:
        print(skip_marker("box_busy"))
        return 0
    # advertise our own probe+body the same way we expect others to:
    # the watchdog wakes every 5 min and would otherwise probe (or
    # launch the recert sweep) into our live job
    with advertise_busy():
        if not tpu_available():
            print(skip_marker())
            return 0
        try:
            return body()
        except Exception as e:                # noqa: BLE001
            if not _is_backend_init_error(e):
                raise
            if os.environ.get(_RETRIED_ENV) != "1":
                os.environ[_RETRIED_ENV] = "1"
                time.sleep(retry_wait_s)
                # exec replaces the process: advertise_busy.__exit__
                # never runs, so drop the lock here or the re-exec'd
                # child stalls on its own leftover until it goes stale
                try:
                    os.remove(_BUSY_LOCK)
                except OSError:
                    pass
                os.execv(sys.executable, [sys.executable] + sys.argv)
            print(skip_marker("tpu_init_transient"))
            return 0
