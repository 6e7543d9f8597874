"""In-scan vs precomputed fixed-step noise (the O(1)-noise-memory mode).

Fixed-step solves default to batching all per-step increments into one
``(n_steps, *size)`` buffer before the scan; above
``integrate.NOISE_PRECOMPUTE_MAX_BYTES`` (or with ``noise_precompute=False``)
they generate/query noise per step *inside* the scan instead, so adjoint
memory stays O(T) in output count for arbitrarily small dt (the reference's
memory contract, adjoint.py:54-62 saves only ``ys``). Invariants:

* object mode (explicit BrownianInterval): the two modes are BITWISE
  identical — per-step traced-time queries resolve the same dyadic cells as
  the host-side bulk ``query_grid``;
* grid mode (default ``bm=None``): the in-scan stream is keyed per interval
  index (``fold_in``), so the adjoint's backward replays the forward's
  increments exactly despite visiting intervals in a different order —
  checked via adjoint-vs-backprop gradient agreement in the same mode;
* the auto policy is a pure function of (n_steps, size, dtype, needs) that
  both adjoint passes compute identically.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchsde_tpu as tsde
from torchsde_tpu.core import integrate

import problems

b, d, m = 8, 3, 2
ts = [0.0, 0.2, 0.4]
dt = 0.025
DTYPE = jnp.float64


def _bm():
    return tsde.BrownianInterval(0.0, 0.4, (b, d), dtype=DTYPE, entropy=7)


def _y0():
    return jnp.full((b, d), 0.1, DTYPE)


def test_policy_unit():
    # W channel only: n * prod(size) * itemsize.
    assert integrate.noise_buffer_bytes(100, (8, 4), jnp.float32,
                                        False, False) == 100 * 32 * 4
    # U doubles it; A adds an m-times W-sized buffer.
    assert integrate.noise_buffer_bytes(100, (8, 4), jnp.float32,
                                        True, False) == 2 * 100 * 32 * 4
    assert integrate.noise_buffer_bytes(100, (8, 4), jnp.float32,
                                        True, True) == 6 * 100 * 32 * 4
    assert integrate.should_precompute_noise(10, (8, 4), jnp.float32,
                                             False, False)
    huge = integrate.NOISE_PRECOMPUTE_MAX_BYTES // (32 * 4) + 1
    assert not integrate.should_precompute_noise(huge, (8, 4), jnp.float32,
                                                 False, False)
    # Explicit override beats the size policy in both directions.
    assert integrate.should_precompute_noise(huge, (8, 4), jnp.float32,
                                             False, False, override=True)
    assert not integrate.should_precompute_noise(1, (8, 4), jnp.float32,
                                                 False, False, override=False)


@pytest.mark.parametrize("method", ["euler", "milstein"])
def test_object_mode_bitwise(method):
    """Explicit-bm solves: in-scan per-step queries hit the same dyadic cells
    as the bulk host-side precompute — results must be bitwise identical."""
    sde = problems.ExDiagonal(d=d, sde_type="ito")
    bm = _bm()
    a = tsde.sdeint(sde, _y0(), ts, bm=bm, method=method, dt=dt,
                    noise_precompute=True)
    c = tsde.sdeint(sde, _y0(), ts, bm=bm, method=method, dt=dt,
                    noise_precompute=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_object_mode_srk_ulp_close():
    """srk consumes the U channel, whose traced-time reconstruction of the
    interval width differs from the exact host float64 by <= a few ulps (W is
    bitwise; the leaf *selection* is identical, only the accumulated leaf
    start differs in final rounding). The two modes therefore agree to
    float64 roundoff, not bitwise."""
    sde = problems.ExDiagonal(d=d, sde_type="ito")
    bm = tsde.BrownianInterval(0.0, 0.4, (b, d), dtype=DTYPE, entropy=7,
                               levy_area_approximation="space-time")
    a = tsde.sdeint(sde, _y0(), ts, bm=bm, method="srk", dt=dt,
                    noise_precompute=True)
    c = tsde.sdeint(sde, _y0(), ts, bm=bm, method="srk", dt=dt,
                    noise_precompute=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=0,
                               atol=1e-13)


def test_object_mode_adjoint_ulp_close():
    """Adjoint gradients agree to float64 roundoff between noise modes in
    object mode: both passes consume the same BrownianInterval increments
    (bitwise), but the two backward *programs* differ (gathered-xs vs in-body
    descent), so XLA's fusion/FMA choices can shift the last bit of the
    accumulated gradients."""
    sde = problems.ExDiagonal(d=d, sde_type="ito")
    bm = _bm()

    def loss(sde_, pre):
        ys = tsde.sdeint_adjoint(sde_, _y0(), ts, bm=bm, method="milstein",
                                 dt=dt, noise_precompute=pre)
        return jnp.sum(ys[-1] ** 2) + jnp.sum(ys[1])

    g_pre = jax.grad(loss)(sde, True)
    g_scan = jax.grad(loss)(sde, False)
    for x, y in zip(jax.tree_util.tree_leaves(g_pre),
                    jax.tree_util.tree_leaves(g_scan)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-13, atol=0)


def test_grid_mode_in_scan_deterministic():
    """Default-noise in-scan solves are a pure function of the key."""
    sde = problems.ExDiagonal(d=d, sde_type="ito")
    key = jax.random.PRNGKey(11)
    a = tsde.sdeint(sde, _y0(), ts, dt=dt, key=key, noise_precompute=False)
    c = tsde.sdeint(sde, _y0(), ts, dt=dt, key=key, noise_precompute=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    assert bool(jnp.isfinite(a).all())


def test_grid_mode_adjoint_matches_backprop_in_scan():
    """Grid mode, in-scan: sdeint(key=...) and sdeint_adjoint(key=...) share
    the per-interval fold_in stream, so the adjoint's backward replays the
    forward's increments; adjoint-vs-backprop agreement at the same tolerance
    the precomputed-mode test uses (test_adjoint.py: NeuralDiagonal+midpoint
    1e-3) proves the replay is consistent."""
    sde = problems.NeuralDiagonal(sde_type="stratonovich", d=d)
    key = jax.random.PRNGKey(5)
    y0 = _y0()

    def loss_adj(sde_, y0_):
        ys = tsde.sdeint_adjoint(sde_, y0_, ts, method="midpoint", dt=dt,
                                 key=key, noise_precompute=False)
        return jnp.sum(ys[-1] ** 2) + jnp.sum(ys[1])

    def loss_bp(sde_, y0_):
        ys = tsde.sdeint(sde_, y0_, ts, method="midpoint", dt=dt,
                         key=key, noise_precompute=False)
        return jnp.sum(ys[-1] ** 2) + jnp.sum(ys[1])

    ga = jax.grad(loss_adj, argnums=(0, 1))(sde, y0)
    gb = jax.grad(loss_bp, argnums=(0, 1))(sde, y0)
    la = jax.tree_util.tree_leaves(ga)
    lb = jax.tree_util.tree_leaves(gb)
    scale = max(float(jnp.max(jnp.abs(x))) for x in lb) + 1e-12
    err = max(float(jnp.max(jnp.abs(x - y))) for x, y in zip(la, lb))
    assert err / scale < 1e-3


def test_grid_mode_srk_levy_in_scan():
    """In-scan generation covers the U channel (srk needs space-time Levy
    area) with the same law; solve runs and is finite."""
    sde = problems.ExDiagonal(d=d, sde_type="ito")
    a = tsde.sdeint(sde, _y0(), ts, method="srk", dt=dt,
                    key=jax.random.PRNGKey(3), noise_precompute=False)
    assert bool(jnp.isfinite(a).all())


@pytest.mark.heavy
def test_sparse_outputs_match_dense(monkeypatch):
    """Above DENSE_OUTPUT_MAX_BYTES, sdeint keeps only the <= 2T bracketing
    grid states instead of the full trajectory stack; values and gradients
    must match the dense path to float64 roundoff (identical states and
    interpolation arithmetic, different program structure). The schedule
    mixes endpoints, grid-aligned, off-grid, and same-cell output times."""
    sde = problems.ExDiagonal(d=d, sde_type="ito")
    bm = _bm()
    sched = [0.0, 0.011, 0.013, 0.2, 0.317, 0.4]

    def run(y0_):
        return tsde.sdeint(sde, y0_, sched, bm=bm, method="milstein", dt=dt)

    def loss(sde_):
        ys = tsde.sdeint(sde_, _y0(), sched, bm=bm, method="milstein", dt=dt)
        return jnp.sum(ys ** 2)

    dense = run(_y0())
    g_dense = jax.grad(loss)(sde)
    monkeypatch.setattr(integrate, "DENSE_OUTPUT_MAX_BYTES", 0)
    sparse = run(_y0())
    g_sparse = jax.grad(loss)(sde)
    np.testing.assert_allclose(np.asarray(sparse), np.asarray(dense),
                               rtol=1e-13, atol=0)
    for x, y in zip(jax.tree_util.tree_leaves(g_sparse),
                    jax.tree_util.tree_leaves(g_dense)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-13, atol=0)


def test_sparse_outputs_srk_logqp_remat(monkeypatch):
    """Sparse outputs compose with the U noise column (srk), the logqp state
    augmentation, remat, and the in-scan noise mode."""
    sde = problems.ExDiagonal(d=d, sde_type="ito")
    key = jax.random.PRNGKey(9)
    dense, logqp_d = tsde.sdeint(sde, _y0(), ts, method="srk", dt=dt, key=key,
                                 logqp=True)
    monkeypatch.setattr(integrate, "DENSE_OUTPUT_MAX_BYTES", 0)
    sparse, logqp_s = tsde.sdeint(sde, _y0(), ts, method="srk", dt=dt,
                                  key=key, logqp=True)
    np.testing.assert_allclose(np.asarray(sparse), np.asarray(dense),
                               rtol=1e-13, atol=0)
    np.testing.assert_allclose(np.asarray(logqp_s), np.asarray(logqp_d),
                               rtol=1e-12, atol=1e-15)
    monkeypatch.setattr(integrate, "NOISE_PRECOMPUTE_MAX_BYTES", 0)
    both = tsde.sdeint(sde, _y0(), ts, method="milstein", dt=dt, key=key,
                       remat=True)
    assert bool(jnp.isfinite(both).all())


@pytest.mark.heavy
def test_auto_policy_flips_to_in_scan(monkeypatch):
    """With the threshold forced to zero the auto mode must route through the
    in-scan path; in object mode the result is bitwise the precomputed one."""
    sde = problems.ExDiagonal(d=d, sde_type="ito")
    bm = _bm()
    ref = tsde.sdeint(sde, _y0(), ts, bm=bm, method="milstein", dt=dt,
                      noise_precompute=True)
    monkeypatch.setattr(integrate, "NOISE_PRECOMPUTE_MAX_BYTES", 0)
    auto = tsde.sdeint(sde, _y0(), ts, bm=bm, method="milstein", dt=dt)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(auto))

    def loss(sde_):
        ys = tsde.sdeint_adjoint(sde_, _y0(), ts, bm=bm, method="milstein",
                                 dt=dt)
        return jnp.sum(ys[-1] ** 2)

    g = jax.grad(loss)(sde)
    assert all(bool(jnp.isfinite(x).all())
               for x in jax.tree_util.tree_leaves(g))


def test_adjoint_policy_counts_levy_buffers(monkeypatch):
    """The adjoint's shared fwd/bwd precompute policy must size U/A buffers,
    not just W: an A buffer is m times the W buffer for general noise, so a
    solve whose W channel squeaks under the threshold must still flip to
    in-scan when its solver needs Levy area (advisor round-2 finding)."""
    from torchsde_tpu.core import adjoint as adjoint_mod
    from torchsde_tpu.core import solvers

    assert solvers.method_noise_needs("euler") == (False, False)
    assert solvers.method_noise_needs("srk") == (True, False)
    assert solvers.method_noise_needs("log_ode") == (False, True)
    assert solvers.method_noise_needs("milstein") == (False, False)

    def cfg(method, adjoint_method):
        return adjoint_mod._Cfg(
            ts=(0.0, 1.0), dt=0.5, method=method,
            adjoint_method=adjoint_method, grid_noise=True, levy="space-time",
            options=(), adjoint_options=(), rtol=1e-5, atol=1e-4, dt_min=1e-5)

    bm = _bm()
    n_steps = 100
    w_bytes = integrate.noise_buffer_bytes(n_steps, tuple(bm.shape), bm.dtype,
                                           False, False)
    # Threshold admits the W buffer alone but not W + U (and a fortiori not
    # W + m*A): euler precomputes, srk/log_ode must not — and the decision is
    # the union over fwd and adjoint methods, so it is pass-independent.
    monkeypatch.setattr(integrate, "NOISE_PRECOMPUTE_MAX_BYTES", w_bytes)
    assert adjoint_mod._precompute_noise(cfg("euler", "euler"), bm, n_steps)
    assert not adjoint_mod._precompute_noise(cfg("srk", "euler"), bm, n_steps)
    assert not adjoint_mod._precompute_noise(cfg("euler", "srk"), bm, n_steps)
    assert not adjoint_mod._precompute_noise(
        cfg("log_ode", "euler"), bm, n_steps)


def test_pallas_rng_downgrade_warns(monkeypatch):
    """Both entry points must warn when rng_impl='pallas' is silently replaced
    by in-scan threefry generation (the pallas bulk generator only exists for
    the precomputed path)."""
    import warnings as warnings_mod

    sde = problems.ExDiagonal(d=d, sde_type="ito")
    monkeypatch.setattr(integrate, "NOISE_PRECOMPUTE_MAX_BYTES", 0)
    key = jax.random.PRNGKey(3)
    with pytest.warns(UserWarning, match="pallas"):
        tsde.sdeint(sde, _y0(), ts, dt=dt, key=key, rng_impl="pallas")

    def loss(sde_):
        ys = tsde.sdeint_adjoint(sde_, _y0(), ts, dt=dt, key=key,
                                 rng_impl="pallas")
        return jnp.sum(ys[-1] ** 2)

    with warnings_mod.catch_warnings():
        warnings_mod.simplefilter("error", UserWarning)
        with pytest.raises(UserWarning, match="pallas"):
            jax.grad(loss)(sde)


@pytest.mark.heavy
@pytest.mark.parametrize("in_scan", [False, True])
def test_remat_grads_match_nonremat(monkeypatch, in_scan):
    """remat=True only changes WHEN step activations are (re)computed, never
    the values: backprop-through-solver gradients must match the non-remat
    solve to float-equality, in both noise modes (the in-scan mode recomputes
    the fold_in-keyed increments inside the checkpointed step during the
    backward sweep — same keys, same values)."""
    if in_scan:
        monkeypatch.setattr(integrate, "NOISE_PRECOMPUTE_MAX_BYTES", 0)
    sde = problems.ExDiagonal(d=d, sde_type="ito")
    key = jax.random.PRNGKey(5)

    def loss(sde_, remat):
        ys = tsde.sdeint(sde_, _y0(), ts, dt=dt, key=key, remat=remat)
        return jnp.sum(ys ** 2)

    g_plain = jax.grad(lambda s: loss(s, False))(sde)
    g_remat = jax.grad(lambda s: loss(s, True))(sde)
    for a, b in zip(jax.tree_util.tree_leaves(g_plain),
                    jax.tree_util.tree_leaves(g_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-14, atol=0)
