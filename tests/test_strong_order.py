"""Fast strong-order convergence checks (CI guard).

The full sweep lives in diagnostics/run_all.py (port of the reference's
diagnostics/, /root/reference/diagnostics/run_all.py:15-21). Here we check the
headline orders on the analytically-solvable problems with a small batch:
slopes must bracket the documented strong orders (euler 0.5, milstein 1.0,
srk 1.5, additive-euler 1.0, Stratonovich midpoint/heun 1.0).
"""

import os
import sys

import jax.numpy as jnp
import pytest

import problems
# Absolute repo root, ahead of any path other test modules may have
# prepended (test_reference_differential.py puts /root/reference first,
# whose own diagnostics/ package would otherwise shadow ours).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from diagnostics.harness import inspect_orders  # noqa: E402

BATCH = 512  # slopes hold to ~±0.1 vs 1024 (bands are ±0.25+); halves CI time
D = 3
M = 5
T0, T1 = 0.0, 2.0
DTS = tuple(2.0 ** -i for i in range(1, 6))
DT_TRUE = 2.0 ** -9


def _orders(sde, noise_size, methods, options=None):
    y0 = jnp.full((BATCH, D), 0.1, jnp.float64)
    return inspect_orders(sde, y0, T0, T1, DTS, methods, options,
                          noise_size=noise_size, dt_true=DT_TRUE, entropy=7)


@pytest.mark.slow  # ~44 s; stratonovich + grad-free stay in the fast tier
def test_ito_diagonal_orders():
    sde = problems.ExDiagonal(d=D, sde_type="ito")
    r = _orders(sde, D, ("euler", "milstein", "srk"))
    assert 0.35 <= r["euler"]["strong_order"] <= 0.85
    assert 0.8 <= r["milstein"]["strong_order"] <= 1.45
    assert 1.25 <= r["srk"]["strong_order"] <= 1.9


@pytest.mark.slow  # ~32 s
def test_ito_additive_orders():
    sde = problems.ExAdditive(d=D, m=M, sde_type="ito")
    r = _orders(sde, M, ("euler", "srk"))
    assert r["euler"]["strong_order"] >= 0.85   # order 1.0 for additive noise
    assert r["srk"]["strong_order"] >= 1.4


@pytest.mark.slow  # ~18 s
def test_ito_scalar_orders():
    sde = problems.ExScalar(d=D, sde_type="ito")
    r = _orders(sde, 1, ("euler", "milstein"))
    assert 0.35 <= r["euler"]["strong_order"] <= 0.9
    assert r["milstein"]["strong_order"] >= 0.85


def test_stratonovich_orders():
    sde = problems.ExScalar(d=D, sde_type="stratonovich")
    r = _orders(sde, 1, ("midpoint", "heun", "euler_heun", "reversible_heun"))
    for label in ("midpoint", "heun", "euler_heun"):
        assert r[label]["strong_order"] >= 0.8, (label, r[label]["strong_order"])
    assert r["reversible_heun"]["strong_order"] >= 0.45


def test_milstein_grad_free_matches_autodiff_order():
    sde = problems.ExDiagonal(d=D, sde_type="ito")
    y0 = jnp.full((BATCH, D), 0.1, jnp.float64)
    r = inspect_orders(sde, y0, T0, T1, DTS, ("milstein", "milstein"),
                       options=(None, dict(grad_free=True)),
                       labels=("milstein", "milstein_grad_free"),
                       noise_size=D, dt_true=DT_TRUE, entropy=7)
    assert r["milstein"]["strong_order"] >= 0.8
    assert r["milstein_grad_free"]["strong_order"] >= 0.8
