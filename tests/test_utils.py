"""Profiling / observability utilities."""
import time

import pytest
import jax
import jax.numpy as jnp

from deepmimic_diffusion_mujoco_tpu.utils import profiling as P


def test_timer():
    t = P.Timer()
    time.sleep(0.01)
    d = t()
    assert 0.005 < d < 1.0
    assert t(reset=False) < d  # was reset


def test_step_timer():
    st = P.StepTimer()
    x = jnp.ones((4,))
    for _ in range(3):
        st.tick(x * 2)
    assert st.count == 2
    assert st.steps_per_s > 0


def test_progress_meter():
    lines = []
    pm = P.ProgressMeter(total=10, every=5, log_fn=lines.append)
    for i in range(10):
        pm.update(loss=i)
    assert len(lines) == 2
    assert "loss" in lines[0] and "it/s" in lines[0]


@pytest.mark.slow  # ~37s profiler trace round-trip
def test_trace_and_annotate(tmp_path):
    with P.trace(str(tmp_path / "prof")):
        with P.annotate("step"):
            jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    # a profile directory was produced
    import os
    assert any(os.scandir(str(tmp_path / "prof")))
