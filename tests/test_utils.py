"""Aux subsystems (SURVEY.md §5): checkify debug wrapper, step timer."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from samplernn_pase_tpu.utils import checked, StepTimer


def test_checked_passes_clean_fn():
    f = checked(lambda x: x * 2.0)
    out = f(jnp.ones(4))
    np.testing.assert_allclose(np.asarray(out), 2.0)


def test_checked_raises_on_nan():
    f = checked(lambda x: jnp.log(x))  # log(-1) -> nan
    with pytest.raises(Exception):
        f(jnp.asarray([-1.0]))


def test_pin_reachable_platform_cpu_fallback(monkeypatch):
    """No reachable TPU -> pins jax to CPU (the examples' guard against
    the dead-relay init hang) and reports "cpu"."""
    from samplernn_pase_tpu.utils import tpu_guard

    monkeypatch.setattr(tpu_guard, "tpu_available", lambda **kw: False)
    assert tpu_guard.pin_reachable_platform() == "cpu"
    assert jax.config.jax_platforms == "cpu"   # conftest pins cpu too


def test_pin_reachable_platform_leaves_tpu_selection(monkeypatch):
    """Reachable TPU -> platform selection untouched (demo runs the
    real device pipeline)."""
    from samplernn_pase_tpu.utils import tpu_guard

    before = jax.config.jax_platforms
    monkeypatch.setattr(tpu_guard, "tpu_available", lambda **kw: True)
    assert tpu_guard.pin_reachable_platform() == "tpu"
    assert jax.config.jax_platforms == before


def test_wait_for_box_idle_no_locks(tmp_path):
    """An idle box (no lock files) returns [] immediately."""
    import time

    from samplernn_pase_tpu.utils import tpu_guard

    t0 = time.perf_counter()
    held = tpu_guard.wait_for_box_idle(
        max_wait_s=5.0, poll_s=0.05,
        locks=(str(tmp_path / "absent.lock"),))
    assert held == []
    assert time.perf_counter() - t0 < 1.0


def test_wait_for_box_idle_waits_for_fresh_lock(tmp_path):
    """A freshly-touched lock (the recert sweep's heartbeat) makes the
    guard wait — bounded by max_wait_s — and a hold that outlives the
    wait is REPORTED (the caller must skip, not probe into a busy
    chip: concurrent backend init hangs both processes)."""
    import time

    from samplernn_pase_tpu.utils import tpu_guard

    lock = tmp_path / "recert_running"
    lock.touch()
    t0 = time.perf_counter()
    held = tpu_guard.wait_for_box_idle(
        max_wait_s=0.3, poll_s=0.05, locks=(str(lock),))
    assert time.perf_counter() - t0 >= 0.3
    assert held == [str(lock)]


def test_wait_for_box_idle_ignores_stale_lock(tmp_path):
    """A lock whose heartbeat stopped (old mtime) is abandoned — e.g.
    the box killed a sweep mid-run — and must not delay the probe."""
    import os
    import time

    from samplernn_pase_tpu.utils import tpu_guard

    lock = tmp_path / "recert_running"
    lock.touch()
    old = 1_000_000.0
    os.utime(lock, (old, old))
    t0 = time.perf_counter()
    held = tpu_guard.wait_for_box_idle(
        max_wait_s=5.0, poll_s=0.05, fresh_s=300.0, locks=(str(lock),))
    assert held == []
    assert time.perf_counter() - t0 < 1.0


def test_wait_for_box_idle_exempt_env(tmp_path, monkeypatch):
    """Recert's own steps set SRNN_BOX_LOCK_EXEMPT=1 — without it they
    would deadlock waiting on the sweep's own lock."""
    from samplernn_pase_tpu.utils import tpu_guard

    lock = tmp_path / "recert_running"
    lock.touch()
    monkeypatch.setenv(tpu_guard._LOCK_EXEMPT_ENV, "1")
    held = tpu_guard.wait_for_box_idle(
        max_wait_s=5.0, poll_s=0.05, locks=(str(lock),))
    assert held == []


def test_held_box_locks_path_specific_exemption(tmp_path, monkeypatch):
    """SRNN_BOX_LOCK_EXEMPT=<path> exempts ONLY that lock — a
    with_box_lock.sh child ignores its own wrapper's jax_busy.lock but
    still honors a concurrent recert sweep's lock."""
    from samplernn_pase_tpu.utils import tpu_guard

    mine = tmp_path / "jax_busy.lock"
    theirs = tmp_path / "recert_running"
    mine.touch()
    theirs.touch()
    monkeypatch.setenv(tpu_guard._LOCK_EXEMPT_ENV, str(mine))
    held = tpu_guard.held_box_locks(locks=(str(theirs), str(mine)))
    assert held == [str(theirs)]


def test_probe_env_keeps_plugin_site_drops_repo_path():
    """The probe subprocess must drop repo entries from PYTHONPATH (they
    shadow the axon plugin) but KEEP everything else — the plugin itself
    is loaded via PYTHONPATH=/root/.axon_site on this box, and dropping
    the variable wholesale skip-marked a perfectly healthy TPU (round-5
    regression: bench/tpu_check reported tpu_unavailable with the chip
    live)."""
    import os

    from samplernn_pase_tpu.utils import tpu_guard

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(tpu_guard.__file__))))
    site = "/root/.axon_site"

    env = tpu_guard._sanitized_probe_env(
        {"PYTHONPATH": os.pathsep.join([site, repo])})
    assert env["PYTHONPATH"] == site

    # repo-only PYTHONPATH: variable removed entirely (round-4 behavior)
    env = tpu_guard._sanitized_probe_env({"PYTHONPATH": repo})
    assert "PYTHONPATH" not in env

    # no PYTHONPATH at all: untouched
    env = tpu_guard._sanitized_probe_env({"OTHER": "x"})
    assert env == {"OTHER": "x"}


def test_advertise_busy_creates_and_cleans(tmp_path):
    """advertise_busy touches the lock for the duration of the body and
    removes it after — but leaves a PRE-EXISTING file alone (an
    enclosing with_box_lock.sh owns its own lock)."""
    import os

    from samplernn_pase_tpu.utils import tpu_guard

    lock = tmp_path / "jax_busy.lock"
    with tpu_guard.advertise_busy(str(lock), beat_s=600):
        assert lock.exists()
    assert not lock.exists()

    lock.touch()
    old = os.path.getmtime(str(lock)) - 100
    os.utime(str(lock), (old, old))
    with tpu_guard.advertise_busy(str(lock), beat_s=600):
        assert os.path.getmtime(str(lock)) > old    # re-touched fresh
    assert lock.exists()                            # not ours to remove


def test_run_guarded_advertises_its_body(tmp_path, monkeypatch):
    """run_guarded holds the busy lock while the body runs, so the
    watchdog defers instead of probing into (or launching the recert
    sweep on top of) the driver's live JAX job."""
    from samplernn_pase_tpu.utils import tpu_guard

    lock = tmp_path / "jax_busy.lock"
    monkeypatch.setattr(tpu_guard, "_BUSY_LOCK", str(lock))
    monkeypatch.setattr(tpu_guard, "wait_for_box_idle", lambda *a, **k: [])
    monkeypatch.setattr(tpu_guard, "tpu_available", lambda **kw: True)
    seen = {}

    def body():
        seen["held"] = lock.exists()
        return 0

    assert tpu_guard.run_guarded(body) == 0
    assert seen["held"]
    assert not lock.exists()


def test_run_guarded_box_busy_skips_without_probing(tmp_path,
                                                    monkeypatch, capsys):
    """A box still busy after the bounded wait must produce the
    ``box_busy`` skip marker WITHOUT probing or running the body —
    probing into a live job (e.g. the auto-recert sweep) hangs both
    processes on this one-JAX-process box."""
    import json

    from samplernn_pase_tpu.utils import tpu_guard

    lock = tmp_path / "recert_running"
    lock.touch()
    monkeypatch.setattr(
        tpu_guard, "wait_for_box_idle",
        lambda *a, **k: [str(lock)])

    def _boom(**kw):
        raise AssertionError("probed into a busy box")

    monkeypatch.setattr(tpu_guard, "tpu_available", _boom)
    rc = tpu_guard.run_guarded(lambda: 1)
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out == {"skipped": True, "reason": "box_busy"}


def test_step_timer_throughput():
    t = StepTimer(window=10)
    x = jnp.ones(8)
    for _ in range(3):
        t.tick(x)
    assert t.steps_per_sec() > 0
    assert t.throughput(100) == pytest.approx(t.steps_per_sec() * 100)
    assert StepTimer.realtime_factor(32_000) == 2.0
