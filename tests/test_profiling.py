"""Profiling/debug hook tests."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpcs_tpu.utils.profiling import StepTimer, barrier, check_finite, trace


def test_trace_writes_files(tmp_path):
    with trace(str(tmp_path)):
        x = jnp.ones((128, 128))
        barrier(jax.jit(lambda a: a @ a)(x))
    found = []
    for root, _, files in os.walk(tmp_path):
        found += files
    assert found, "profiler trace produced no files"


def test_step_timer():
    t = StepTimer(warmup=1)
    for _ in range(4):
        with t.step(jnp.ones((8,))):
            _ = jnp.ones((8,)) * 2
    s = t.summary()
    assert s["steps_timed"] == 3
    assert s["step_time_mean_s"] > 0


def test_check_finite_raises_with_path():
    good = {"a": jnp.ones((3,)), "b": {"c": jnp.zeros((2,))}}
    check_finite(good)
    bad = {"a": jnp.ones((3,)), "b": {"c": jnp.array([1.0, np.nan])}}
    with pytest.raises(FloatingPointError, match="b"):
        check_finite(bad)
