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


def test_step_timer_throughput():
    t = StepTimer(window=10)
    x = jnp.ones(8)
    for _ in range(3):
        t.tick(x)
    assert t.steps_per_sec() > 0
    assert t.throughput(100) == pytest.approx(t.steps_per_sec() * 100)
    assert StepTimer.realtime_factor(32_000) == 2.0
