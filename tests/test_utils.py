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


def test_step_timer_throughput():
    t = StepTimer(window=10)
    x = jnp.ones(8)
    for _ in range(3):
        t.tick(x)
    assert t.steps_per_sec() > 0
    assert t.throughput(100) == pytest.approx(t.steps_per_sec() * 100)
    assert StepTimer.realtime_factor(32_000) == 2.0
