"""Tests for BrownianInterval.

Port of the reference test strategy (/root/reference/tests/test_brownian_interval.py):
shapes for all (levy, return_U, return_A) combos including 0-d/1-d sizes,
determinism, Kolmogorov-Smirnov normality of the unconditional and conditional
bridge laws for W and H, increment/U-chain consistency, and entropy determinism
with query-order permutation invariance (which holds unconditionally here —
the sampler is counter-based, there is no query-dependent tree).

Batch sizes / repetition counts are scaled down vs the reference to keep the
CPU threefry budget sane; the KS alpha matches the reference (1e-5).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import numpy.random as npr
import pytest
from scipy.stats import kstest

import torchsde_tpu as tsde

D = 3
SMALL_BATCH_SIZE = 16
LARGE_BATCH_SIZE = 32768
REPS = 2
MEDIUM_REPS = 3
LARGE_REPS = 30
ALPHA = 0.00001

_rng = npr.RandomState(1147481649)


def _U_to_H(W, U, h):
    return U / h - 0.5 * W


def _setup(levy_area_approximation, shape, entropy=None):
    ta, tb = sorted(_rng.uniform(0., 1., size=2))
    bm = tsde.BrownianInterval(t0=0., t1=1., size=shape, dtype=jnp.float64,
                               entropy=entropy,
                               levy_area_approximation=levy_area_approximation)
    return float(ta), float(tb), bm


def _levy_returns():
    # Every cell compiles its own samplers (~6-9 s); the fast tier keeps one
    # representative per Levy mode plus the all-returns cells, the remaining
    # davie/foster return-combination cells run under -m slow / -m "".
    fast = {("none", False, False), ("space-time", False, False),
            ("space-time", True, False), ("davie", True, True),
            ("foster", True, True)}
    out = [("none", False, False),
           ("space-time", False, False),
           ("space-time", True, False)]
    for levy in ("davie", "foster"):
        for return_U in (True, False):
            for return_A in (True, False):
                out.append((levy, return_U, return_A))
    return [cell if cell in fast
            else pytest.param(*cell, marks=pytest.mark.slow)
            for cell in out]


def _as_tuple(val):
    return (val,) if not isinstance(val, tuple) else val


@pytest.mark.parametrize("levy_area_approximation, return_U, return_A", _levy_returns())
def test_shape(levy_area_approximation, return_U, return_A):
    for shape, A_shape in (((SMALL_BATCH_SIZE, D), (SMALL_BATCH_SIZE, D, D)),
                           ((SMALL_BATCH_SIZE,), (SMALL_BATCH_SIZE,)),
                           ((), ())):
        ta, tb, bm = _setup(levy_area_approximation, shape)
        with pytest.warns(UserWarning):
            sample1 = bm(ta, return_U=return_U, return_A=return_A)
        sample3 = bm(ta, tb, return_U=return_U, return_A=return_A)
        shapes, A_shapes = [], []
        for sample in (sample1, sample3):
            parts = list(_as_tuple(sample))
            W = parts.pop(0)
            shapes.append(W.shape)
            if return_U:
                shapes.append(parts.pop(0).shape)
            if return_A:
                A_shapes.append(parts.pop(0).shape)
        for s in shapes:
            assert tuple(s) == shape
        for s in A_shapes:
            assert tuple(s) == A_shape


@pytest.mark.parametrize("levy_area_approximation, return_U, return_A", _levy_returns())
def test_determinism_simple(levy_area_approximation, return_U, return_A):
    ta, tb, bm = _setup(levy_area_approximation, (SMALL_BATCH_SIZE, D))
    vals = [_as_tuple(bm(ta, tb, return_U=return_U, return_A=return_A))
            for _ in range(REPS)]
    for val in vals[1:]:
        for v, v0 in zip(val, vals[0]):
            assert bool(jnp.all(v == v0))


@pytest.mark.parametrize("levy_area_approximation, return_U, return_A",
                         [("none", False, False), ("space-time", True, False),
                          ("foster", True, True)])
def test_determinism_large(levy_area_approximation, return_U, return_A):
    """Re-query many random intervals; all values must reproduce exactly."""
    _, _, bm = _setup(levy_area_approximation, (SMALL_BATCH_SIZE, D))
    query = jax.jit(lambda a, b: bm(a, b, return_U=return_U, return_A=return_A))
    cache = {}
    for _ in range(LARGE_REPS):
        ta_, tb_ = sorted(_rng.uniform(0., 1., size=2))
        cache[(ta_, tb_)] = _as_tuple(query(ta_, tb_))
    for (ta_, tb_), vals in cache.items():
        vals2 = _as_tuple(query(ta_, tb_))
        for v1, v2 in zip(vals, vals2):
            assert bool(jnp.all(v1 == v2))


@pytest.mark.parametrize("levy_area_approximation",
                         ["none", "space-time", "davie", "foster"])
@pytest.mark.slow
def test_normality_simple(levy_area_approximation):
    t0, t1 = 0.0, 1.0
    for _ in range(REPS):
        base_W = jnp.full((LARGE_BATCH_SIZE,), float(_rng.randn()), jnp.float64)
        bm = tsde.BrownianInterval(t0=t0, t1=t1, W=base_W,
                                   levy_area_approximation=levy_area_approximation)
        t_ = float(_rng.uniform(low=t0 + 0.05, high=t1 - 0.05))

        W = bm(t0, t_)
        mean_W = base_W * (t_ - t0) / (t1 - t0)
        std_W = math.sqrt((t1 - t_) * (t_ - t0) / (t1 - t0))
        rescaled_W = (W - mean_W) / std_W
        _, pval = kstest(np.asarray(rescaled_W), "norm")
        assert pval >= ALPHA

        if levy_area_approximation != "none":
            W, U = bm(t0, t_, return_U=True)
            H = _U_to_H(W, U, t_ - t0)
            std_H = math.sqrt((t_ - t0) / 12)
            _, pval = kstest(np.asarray(H / std_H), "norm")
            assert pval >= ALPHA


@pytest.mark.parametrize("levy_area_approximation", ["none", "space-time"])
@pytest.mark.slow
def test_normality_conditional(levy_area_approximation):
    """Conditional bridge laws for W and H at interior points
    (reference test_brownian_interval.py:199-258)."""
    t0, t1 = 0.0, 1.0
    have_H = levy_area_approximation != "none"
    for _ in range(REPS):
        bm = tsde.BrownianInterval(t0=t0, t1=t1, size=(LARGE_BATCH_SIZE,),
                                   dtype=jnp.float64,
                                   levy_area_approximation=levy_area_approximation)
        query = jax.jit(lambda a, b: bm(a, b, return_U=True)) if have_H \
            else jax.jit(lambda a, b: bm(a, b))
        for _ in range(MEDIUM_REPS):
            ta, t_, tb = sorted(_rng.uniform(low=0.05, high=0.95, size=3))
            if min(t_ - ta, tb - t_) < 0.01:
                continue

            if have_H:
                W, U = query(ta, tb)
                W1, U1 = query(ta, t_)
                W2, U2 = query(t_, tb)
            else:
                W, W1, W2 = query(ta, tb), query(ta, t_), query(t_, tb)

            mean_W1 = W * (t_ - ta) / (tb - ta)
            std_W = math.sqrt((tb - t_) * (t_ - ta) / (tb - ta))
            _, pval = kstest(np.asarray((W1 - mean_W1) / std_W), "norm")
            assert pval >= ALPHA

            mean_W2 = W * (tb - t_) / (tb - ta)
            _, pval = kstest(np.asarray((W2 - mean_W2) / std_W), "norm")
            assert pval >= ALPHA

            if have_H:
                h, h1, h2 = tb - ta, t_ - ta, tb - t_
                denom = math.sqrt(h1 ** 3 + h2 ** 3)
                a = h1 ** 3.5 * h2 ** 0.5 / (2 * h * denom)
                b = h1 ** 0.5 * h2 ** 3.5 / (2 * h * denom)
                c = math.sqrt(3) * h1 ** 1.5 * h2 ** 1.5 / (6 * denom)

                H = _U_to_H(W, U, h)
                H1 = _U_to_H(W1, U1, h1)
                H2 = _U_to_H(W2, U2, h2)

                mean_H1 = H * (h1 / h) ** 2
                std_H1 = math.sqrt(a ** 2 + c ** 2) / h1
                _, pval = kstest(np.asarray((H1 - mean_H1) / std_H1), "norm")
                assert pval >= ALPHA

                mean_H2 = H * (h2 / h) ** 2
                std_H2 = math.sqrt(b ** 2 + c ** 2) / h2
                _, pval = kstest(np.asarray((H2 - mean_H2) / std_H2), "norm")
                assert pval >= ALPHA


@pytest.mark.parametrize("levy_area_approximation", [
    "none", "space-time",
    pytest.param("davie", marks=pytest.mark.slow),
    pytest.param("foster", marks=pytest.mark.slow),
])
def test_consistency(levy_area_approximation):
    """W additivity and the U chain rule (reference test:261-288)."""
    t0, t1 = 0.0, 1.0
    have_H = levy_area_approximation != "none"
    bm = tsde.BrownianInterval(t0=t0, t1=t1, size=(4096,), dtype=jnp.float64,
                               levy_area_approximation=levy_area_approximation)
    for _ in range(MEDIUM_REPS):
        ta, t_, tb = sorted(_rng.uniform(low=t0, high=t1, size=3))
        if have_H:
            W, U = bm(ta, tb, return_U=True)
            W1, U1 = bm(ta, t_, return_U=True)
            W2, U2 = bm(t_, tb, return_U=True)
        else:
            W, W1, W2 = bm(ta, tb), bm(ta, t_), bm(t_, tb)
        np.testing.assert_allclose(np.asarray(W1 + W2), np.asarray(W),
                                   rtol=1e-6, atol=1e-6)
        if have_H:
            np.testing.assert_allclose(np.asarray(U1 + U2 + (tb - t_) * W1),
                                       np.asarray(U), rtol=1e-6, atol=1e-6)


@pytest.mark.slow  # ~11 s per cell (full-depth host descents)
@pytest.mark.parametrize("levy_area_approximation", ["davie", "foster"])
def test_levy_area_query_context_independent(levy_area_approximation):
    """The full Levy area A of one interval must be bitwise identical no
    matter HOW the interval is queried: direct shallow __call__, query_grid
    alongside a non-dyadic point (which deepens the host descent to full
    float64 depth and previously changed the packed-word count keying A's
    noise), and a traced full-depth query under jit. Regression test for
    the depth-dependent n_words bug (code-review r2)."""
    bm = tsde.BrownianInterval(t0=0., t1=1., size=(2, 3), dtype=jnp.float64,
                               levy_area_approximation=levy_area_approximation,
                               entropy=99)
    ta, tb = 0.25, 0.375
    W_d, A_d = bm(ta, tb, return_A=True)
    # grid containing 0.1 forces a depth-52 descent for every grid point
    W_g, _, A_g = bm.query_grid(np.asarray([0.0, 0.1, ta, tb, 1.0]),
                                return_A=True)
    assert bool(jnp.all(W_g[2] == W_d))
    assert bool(jnp.all(A_g[2] == A_d))
    # Traced queries draw the SAME noise (same canonical key words); values
    # agree to ~1 ulp — jit fuses the H*W - W*H chain with FMA contraction,
    # so bitwise equality across the eager/jit boundary is not promised
    # for A (W/U/H are bitwise, asserted above and in test_inside_jit*).
    W_t, A_t = jax.jit(lambda a, b: bm(a, b, return_A=True))(ta, tb)
    assert bool(jnp.all(W_t == W_d))
    np.testing.assert_allclose(np.asarray(A_t), np.asarray(A_d),
                               rtol=0, atol=1e-15)


@pytest.mark.slow  # ~29 s
def test_host_traced_agreement_x64_off():
    """Concrete (host-resolved) and traced (on-device) queries of the same
    interval must return identical noise in BOTH x64 modes. The host descent
    runs in the *canonical* float dtype: under x64-off that is float32, and a
    float64 host descent would take different branches than the float32
    on-device descent — measured on this exact configuration, 39/40 random
    query times resolved to different leaves, giving the same interval
    different noise on the two paths (code-review r2). The solver hot path
    hits exactly this mix: fixed-step forwards resolve host-side via
    precompute_bm_noise while the merged adaptive adjoint backward queries
    the same bm with traced while-loop times."""
    with jax.enable_x64(False):
        bm = tsde.BrownianInterval(t0=0.1, t1=2.3, size=(4,),
                                   dtype=jnp.float32, entropy=77, levels=30)
        query = jax.jit(lambda a, b: bm(a, b))
        rng = np.random.default_rng(12345)
        times = np.sort(rng.uniform(0.1, 2.3, size=40).astype(np.float32))
        for a, b in zip(times[:-1], times[1:]):
            w_c = bm(float(a), float(b))
            w_t = query(jnp.asarray(a, jnp.float32),
                        jnp.asarray(b, jnp.float32))
            assert bool(jnp.all(w_c == w_t)), (a, b)


@pytest.mark.parametrize("random_order", [False, True])
@pytest.mark.parametrize("levy_area_approximation, return_U, return_A",
                         [("none", False, False), ("space-time", True, False),
                          ("foster", True, True)])
def test_entropy_determinism(random_order, levy_area_approximation, return_U, return_A):
    """Same entropy => same sample path, regardless of query order.

    The reference only guarantees order-independence under halfway_tree=True;
    our counter-based sampler guarantees it always.
    """
    entropy = 56789
    n = 100
    points1 = _rng.uniform(0., 1., size=n)
    points2 = _rng.uniform(0., 1., size=n)

    def make_bm():
        return tsde.BrownianInterval(t0=0., t1=1., size=(), dtype=jnp.float64,
                                     levy_area_approximation=levy_area_approximation,
                                     entropy=entropy, tol=1e-6)

    bm = make_bm()
    query = jax.jit(lambda a, b: bm(a, b, return_U=return_U, return_A=return_A))
    outs = []
    for p1, p2 in zip(points1, points2):
        p1, p2 = sorted([p1, p2])
        outs.append(_as_tuple(query(p1, p2)))

    bm2 = make_bm()
    query2 = jax.jit(lambda a, b: bm2(a, b, return_U=return_U, return_A=return_A))
    idx = np.arange(n)
    if random_order:
        idx = _rng.permutation(n)
    for i in idx:
        p1, p2 = sorted([points1[i], points2[i]])
        out_ = _as_tuple(query2(p1, p2))
        for a, b in zip(outs[i], out_):
            assert bool(jnp.all(a == b))


def test_inside_jit_and_scan():
    """Queries with traced times inside jit / lax.scan (the solver hot path)."""
    bm = tsde.BrownianInterval(t0=0., t1=1., size=(8, 2), dtype=jnp.float64,
                               entropy=42,
                               levy_area_approximation="space-time")

    @jax.jit
    def roll(ts):
        def body(carry, tpair):
            W, U = bm(tpair[0], tpair[1], return_U=True)
            return carry + W.sum() + U.sum(), W
        total, Ws = jax.lax.scan(body, 0.0, ts)
        return total, Ws

    grid = jnp.linspace(0., 1., 11)
    tpairs = jnp.stack([grid[:-1], grid[1:]], axis=1)
    total, Ws = roll(tpairs)
    # Sum of scan-queried increments == one big increment (exact additivity).
    W_full = bm(0., 1.)
    np.testing.assert_allclose(np.asarray(Ws.sum(0)), np.asarray(W_full), atol=1e-9)


def test_w_h_overrides_and_repr():
    W = jnp.ones((4, 2), jnp.float64)
    bm = tsde.BrownianInterval(t0=0., t1=1., W=W, entropy=1,
                               levy_area_approximation="space-time")
    full = bm(0., 1.)
    np.testing.assert_allclose(np.asarray(full), np.asarray(W), atol=1e-12)
    assert "BrownianInterval" in repr(bm)
    assert bm.shape == (4, 2)


def test_brownian_interval_like():
    y = jnp.zeros((5, 3), jnp.float64)
    bm = tsde.brownian_interval_like(y, entropy=9)
    assert bm.shape == (5, 3)
    assert bm.dtype == jnp.float64


@pytest.mark.slow
def test_fine_scale_queries_levels_30():
    """Explicitly coarsened interval (levels=30): fine queries quantise to the
    leaf grid but keep the right law at the quantised width (floor
    semantics)."""
    n = 65536
    bm = tsde.BrownianInterval(0.0, 1.0, size=(n,), entropy=13, levels=30,
                               dtype=jnp.float64,
                               levy_area_approximation="space-time")
    width = 1e-9  # ~1.07 leaves at 2**-30 resolution
    t = 0.123456789
    W = np.asarray(bm(t, t + width))
    assert np.abs(W).max() > 0
    # quantisation makes the actual width a whole number of leaves; the
    # std must match sqrt(actual_width), i.e. be within a factor ~sqrt(2)
    leaf = 2.0 ** -30
    k = math.floor((t + width) / leaf) - math.floor(t / leaf)
    assert k >= 1
    z = W / np.sqrt(k * leaf)
    from scipy.stats import kstest
    _, pval = kstest(z, "norm")
    assert pval > 1e-5, (pval, k)
    # additivity at this scale: increments are differences of O(1) prefixes,
    # so the chain rule holds to prefix-cancellation rounding (~1e-16 abs),
    # tiny relative to the ~3e-5 increment scale
    a = bm(t, t + width)
    b = bm(t + width, t + 2 * width)
    c = bm(t, t + 2 * width)
    np.testing.assert_allclose(np.asarray(a + b), np.asarray(c), atol=1e-14)


@pytest.mark.slow
def test_exact_splits_at_default_depth():
    """VERDICT r1 missing-item 1 done-criterion: at the default (exact) depth
    arbitrarily fine real-time queries — far below the round-1 2**-20 leaf —
    return correctly-scaled noise, obey additivity, and pass KS at the true
    (unquantised) width."""
    n = 65536
    bm = tsde.BrownianInterval(0.0, 1.0, size=(n,), entropy=13,
                               dtype=jnp.float64,
                               levy_area_approximation="space-time")
    t = 0.123456789  # non-dyadic
    for width in (1e-9, 1e-12):
        W = np.asarray(bm(t, t + width))
        # width resolved exactly (f64 quantisation error ~2**-52 relative)
        from scipy.stats import kstest
        _, pval = kstest(W / np.sqrt(width), "norm")
        assert pval > 1e-5, (width, pval)
        a = np.asarray(bm(t, t + width))
        b = np.asarray(bm(t + width, t + 2 * width))
        c = np.asarray(bm(t, t + 2 * width))
        np.testing.assert_allclose(a + b, c, atol=1e-13)
    # U chain rule at fine scale
    W1, U1 = bm(t, t + 1e-9, return_U=True)
    W2, U2 = bm(t + 1e-9, t + 2e-9, return_U=True)
    Wf, Uf = bm(t, t + 2e-9, return_U=True)
    np.testing.assert_allclose(np.asarray(U1 + U2 + 1e-9 * W1),
                               np.asarray(Uf), atol=1e-18)


def test_tol_sets_levels_and_cap():
    assert tsde.BrownianInterval(0., 1., size=(2,), tol=1e-9).levels == 30
    assert tsde.BrownianInterval(0., 1., size=(2,)).levels == 52
    with pytest.raises(ValueError):
        tsde.BrownianInterval(0., 1., size=(2,), levels=53)


def test_adaptive_warns_when_dt_min_below_leaf():
    import warnings as _w
    import torchsde_tpu.core.sdeint as sdeint_mod

    bm = tsde.BrownianInterval(0., 1., size=(2, 2), entropy=0, levels=10,
                               dtype=jnp.float64)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        sdeint_mod.warn_if_coarser_than_dt_min(bm, dt_min=1e-5)
    assert any("leaf width" in str(r.message) for r in rec)


@pytest.mark.parametrize("levy_area_approximation", [
    pytest.param("none", marks=pytest.mark.slow),
    "space-time",  # the srk hot path stays in the fast tier
    pytest.param("foster", marks=pytest.mark.slow),
])
def test_query_pairs_bitwise_matches_call(levy_area_approximation):
    """query_pairs (one shared descent per point — the adaptive hot path's
    3-descents-per-attempt form) is bitwise identical to querying each pair
    through __call__, for W, U and A, with traced AND concrete points."""
    bm = tsde.BrownianInterval(0.0, 1.0, (4, D), dtype=jnp.float64, entropy=5,
                               levels=24,
                               levy_area_approximation=levy_area_approximation)
    rU = levy_area_approximation in ("space-time", "foster")
    rA = levy_area_approximation == "foster"
    pairs = ((0, 2), (0, 1), (1, 2))
    pts = jnp.asarray([0.2, 0.35321, 0.5], jnp.float64)

    batched = jax.jit(lambda p: bm.query_pairs(p, pairs, return_U=rU,
                                               return_A=rA))(pts)
    single = jax.jit(lambda a, b: bm(a, b, return_U=rU, return_A=rA))

    for (ia, ib), got in zip(pairs, batched):
        want = single(pts[ia], pts[ib])
        got_leaves = got if isinstance(got, tuple) else (got,)
        want_leaves = want if isinstance(want, tuple) else (want,)
        for gl, wl in zip(got_leaves, want_leaves):
            assert bool(jnp.all(gl == wl)), (ia, ib, levy_area_approximation)

    # ReverseBrownian pairs: rev interval == base(-tb, -ta), shared descents.
    from torchsde_tpu.brownian.derived import ReverseBrownian
    rev = ReverseBrownian(bm)
    rpts = jnp.asarray([-0.5, -0.35321, -0.2], jnp.float64)
    rbatched = jax.jit(lambda p: rev.query_pairs(p, pairs, return_U=rU,
                                                 return_A=rA))(rpts)
    rsingle = jax.jit(lambda a, b: rev(a, b, return_U=rU, return_A=rA))
    for (ia, ib), got in zip(pairs, rbatched):
        want = rsingle(rpts[ia], rpts[ib])
        got_leaves = got if isinstance(got, tuple) else (got,)
        want_leaves = want if isinstance(want, tuple) else (want,)
        for gl, wl in zip(got_leaves, want_leaves):
            assert bool(jnp.all(gl == wl)), ("rev", ia, ib)


def test_query_pairs_inverted_pair_clamps_to_zero():
    """A pair violating points[ia] <= points[ib] returns the degenerate zero
    result (matching __call__'s tb = max(ta, tb) clamp), never sign-flipped
    statistics."""
    bm = tsde.BrownianInterval(0.0, 1.0, (4, D), dtype=jnp.float64, entropy=5,
                               levels=24,
                               levy_area_approximation="space-time")
    pts = jnp.asarray([0.2, 0.6], jnp.float64)
    (W_fwd, U_fwd), (W_inv, U_inv) = bm.query_pairs(
        pts, ((0, 1), (1, 0)), return_U=True)
    assert float(jnp.abs(W_fwd).max()) > 0           # sanity: real increment
    assert bool(jnp.all(W_inv == 0)) and bool(jnp.all(U_inv == 0))


def test_eager_query_jit_cache_bucketing():
    """Repeated eager (concrete-time) queries reuse cached compiled descents:
    at most ceil(levels/8) + 1 programs for any query stream, with values
    bitwise-equal to the traced on-device path. Guards the depth-bucketing
    argument (trailing zero bits descend left — a no-op on every output)."""
    bm = tsde.BrownianInterval(0.0, 1.0, (8, D), dtype=jnp.float64,
                               entropy=99, levels=32,
                               levy_area_approximation="space-time")
    rng = np.random.RandomState(7)
    ts = np.sort(rng.uniform(0.0, 1.0, 40))
    traced = jax.jit(lambda a, b: bm(a, b, return_U=True))
    for ta, tb in zip(ts[:-1], ts[1:]):
        W_e, U_e = bm(float(ta), float(tb), return_U=True)
        W_t, U_t = traced(jnp.float64(ta), jnp.float64(tb))
        assert bool(jnp.all(W_e == W_t)) and bool(jnp.all(U_e == U_t)), (ta, tb)
    assert len(bm._cquery_cache) <= 32 // 8 + 1, sorted(bm._cquery_cache)
