"""Profiler hook + solve-stats counters (SURVEY.md §5.1 commitment)."""

import glob
import os

import jax
import jax.numpy as jnp
import pytest

import torchsde_tpu as tsde
from torchsde_tpu.utils.profiling import annotate, trace


class _SDE(tsde.BaseSDE):
    def __init__(self):
        super().__init__(noise_type="diagonal", sde_type="ito")
        self.a = jnp.array([0.2, -0.1])

    def f(self, t, y):
        return self.a * y

    def g(self, t, y):
        return 0.1 * y


@pytest.mark.heavy  # ~17 s: spins up the real jax profiler trace machinery
def test_profiler_trace_writes_dump(tmp_path):
    logdir = str(tmp_path / "prof")
    y0 = jnp.ones((8, 2))
    ts = jnp.linspace(0.0, 0.1, 3)
    with trace(logdir):
        with annotate("sde_solve"):
            ys = tsde.sdeint(_SDE(), y0, ts, method="euler", dt=0.01, entropy=0)
        jax.block_until_ready(ys)
    dumped = glob.glob(os.path.join(logdir, "**", "*"), recursive=True)
    assert any(os.path.isfile(f) for f in dumped), dumped


def test_nfe_counter_fixed_vs_adaptive():
    # Reference analogue: nfe counters on problems (tests/problems.py:44).
    y0 = jnp.ones((8, 2))
    ts = jnp.linspace(0.0, 0.2, 3)
    _, st_fixed = tsde.sdeint(_SDE(), y0, ts, method="euler", dt=0.01,
                              entropy=0, return_stats=True)
    # 20 steps x euler's 2 vector-field evals per step (exact accounting).
    assert st_fixed["nfe"] == 40
    _, st_ad = tsde.sdeint(_SDE(), y0, ts, method="euler", dt=0.05,
                           adaptive=True, rtol=1e-3, atol=1e-4, entropy=0,
                           return_stats=True)
    n_att = int(st_ad["n_accepted"]) + int(st_ad["n_rejected"])
    assert int(st_ad["nfe"]) == 3 * 2 * n_att > 0
