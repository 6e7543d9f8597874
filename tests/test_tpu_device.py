"""Real-device tier: the unit-test contracts exercised ON the TPU chip.

VERDICT r4 item 7: the CPU-forced suite (conftest.py) never touches the real
device; this tier runs a marked subset there —

  * bitwise determinism of a general-noise solve,
  * one solver parity cell per method (TPU vs host-CPU backend, f32),
  * adjoint-vs-backprop gradients (reversible Heun: exact discrete gradient),
  * Brownian additivity to f32 ulp, Lévy-area query-context independence,
  * KS-lite normality of W(0, 1).

Run with ``TSDE_TPU_TESTS=1 pytest -m tpu`` (the env var stops conftest.py
from forcing the CPU backend; x64 stays off — the chip is an f32/bf16
machine). On any other backend every test here skips itself. This mirrors the
reference's opportunistic device parametrisation
(/root/reference/tests/test_sdeint.py:28-30 runs its suite on CUDA when
present).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchsde_tpu as tsde

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(jax.devices()[0].platform != "tpu",
                       reason="needs the real TPU backend"),
]

B, D = 64, 4


class _Diag(tsde.BaseSDE):
    """Diagonal-noise test problem (nonlinear drift/diffusion, f32)."""

    def __init__(self, sde_type):
        super().__init__(noise_type="diagonal", sde_type=sde_type)
        self.a = jnp.asarray(0.3, jnp.float32)
        self.b = jnp.asarray(0.2, jnp.float32)

    def f(self, t, y):
        return self.a * jnp.sin(y) - 0.1 * y

    def g(self, t, y):
        return self.b * (1.0 + 0.5 * jnp.cos(y))


class _General(tsde.BaseSDE):
    M = 3

    def __init__(self):
        super().__init__(noise_type="general", sde_type="ito")
        self.sigma = jnp.full((D, self.M), 0.2, jnp.float32)

    def f(self, t, y):
        return -0.5 * y

    def g(self, t, y):
        return self.sigma * (1.0 + 0.1 * jnp.tanh(y))[..., None]


def _y0():
    return jnp.full((B, D), 0.4, jnp.float32)


def test_bitwise_determinism_on_chip():
    sde = _General()
    ts = np.linspace(0.0, 0.5, 8)
    ys1 = tsde.sdeint(sde, _y0(), ts, method="euler", dt=0.02, entropy=42)
    ys2 = tsde.sdeint(sde, _y0(), ts, method="euler", dt=0.02, entropy=42)
    assert ys1.dtype == jnp.float32
    assert bool(jnp.all(ys1 == ys2))
    assert bool(jnp.all(jnp.isfinite(ys1)))


# (method, sde_type, levy area the default bm needs)
_CELLS = [
    ("euler", "ito", None),
    ("milstein", "ito", None),
    ("srk", "ito", "space-time"),
    ("midpoint", "stratonovich", None),
    ("heun", "stratonovich", None),
    ("euler_heun", "stratonovich", None),
    ("milstein", "stratonovich", None),
    ("reversible_heun", "stratonovich", None),
    ("log_ode", "stratonovich", "foster"),
]


@pytest.mark.parametrize("method,sde_type,levy", _CELLS,
                         ids=[f"{m}-{s}" for m, s, _ in _CELLS])
def test_method_parity_tpu_vs_cpu(method, sde_type, levy):
    """One cell per solver method: the same f32 solve (same entropy, same
    partitionable-threefry noise stream) on the TPU chip and on the host CPU
    backend must agree to f32 accumulation tolerance — TPU matmul/FMA
    rounding differs from the host's, but over 25 small steps the drift is
    bounded."""
    ts = np.linspace(0.0, 0.5, 6)
    kwargs = dict(method=method, dt=0.02, entropy=7)

    def run(device):
        with jax.default_device(device):
            sde = _Diag(sde_type)
            bm = tsde.BrownianInterval(
                0.0, 0.5, (B, D), dtype=jnp.float32, entropy=7,
                levy_area_approximation=levy or "none")
            ys = tsde.sdeint(sde, _y0(), ts, bm=bm, **kwargs)
            return np.asarray(jax.device_get(ys))

    ys_tpu = run(jax.devices("tpu")[0])
    ys_cpu = run(jax.devices("cpu")[0])
    assert ys_tpu.shape == (6, B, D)
    assert np.all(np.isfinite(ys_tpu))
    np.testing.assert_allclose(ys_tpu, ys_cpu, rtol=2e-4, atol=2e-5)


def test_adjoint_vs_backprop_on_chip():
    """Reversible Heun's adjoint pair inverts the forward recurrence
    algebraically, so adjoint and backprop-through-solver compute the SAME
    discrete gradient in exact arithmetic (machine-eps parity is pinned in
    f64 on the CPU tier, tests/test_adjoint.py). On the chip in f32 the
    adjoint's backward-reconstructed states round differently from
    backprop's stored states, and that reconstruction error compounds
    through the 20-step chain — measured as ~2e-3 *additive* noise on O(1)
    gradients (uniform across elements, so small entries show large
    relative error). The bound is therefore an absolute few-e-3 agreement
    check against the gradient scale, not bitwise."""
    sde = _Diag("stratonovich")
    ts = np.linspace(0.0, 0.5, 4)
    bm = tsde.BrownianInterval(0.0, 0.5, (B, D), dtype=jnp.float32, entropy=3)

    def loss(solve):
        def fn(y0):
            ys = solve(sde, y0, ts, bm=bm, method="reversible_heun", dt=0.025)
            return jnp.sum(ys[-1] ** 2)
        return fn

    g_bp = jax.grad(loss(tsde.sdeint))(_y0())
    g_adj = jax.grad(loss(tsde.sdeint_adjoint))(_y0())
    assert bool(jnp.all(jnp.isfinite(g_bp)))
    assert float(jnp.abs(g_bp).max()) > 0
    scale = float(jnp.abs(g_bp).max())
    np.testing.assert_allclose(np.asarray(g_adj), np.asarray(g_bp),
                               rtol=5e-3, atol=5e-3 * scale)


def test_brownian_additivity_on_chip():
    bm = tsde.BrownianInterval(0.0, 1.0, (B, D), dtype=jnp.float32,
                               entropy=11)
    a, t, b = 0.1, 0.4375, 0.9
    w1 = bm(a, t)
    w2 = bm(t, b)
    w = bm(a, b)
    np.testing.assert_allclose(np.asarray(w1 + w2), np.asarray(w),
                               rtol=0, atol=4e-7)  # f32 ulp at O(1) scale


def test_levy_area_query_context_independent_on_chip():
    """The round-4 regression's contract, on the real device: the full Lévy
    area of one interval is bitwise identical via __call__ and query_grid."""
    bm = tsde.BrownianInterval(0.0, 1.0, (8, 3), dtype=jnp.float32,
                               levy_area_approximation="davie", entropy=99)
    ta, tb = 0.25, 0.375
    W_d, A_d = bm(ta, tb, return_A=True)
    W_g, _, A_g = bm.query_grid(np.asarray([0.0, 0.1, ta, tb, 1.0]),
                                return_A=True)
    assert bool(jnp.all(W_g[2] == W_d))
    assert bool(jnp.all(A_g[2] == A_d))


def test_brownian_ks_lite_on_chip():
    """W(0,1) over 4096 scalar paths is standard normal (KS), and increment
    variances scale with interval width."""
    from scipy.stats import kstest

    n = 4096
    bm = tsde.BrownianInterval(0.0, 1.0, (n,), dtype=jnp.float32, entropy=5)
    w = np.asarray(bm(0.0, 1.0))
    _, pval = kstest(w, "norm")
    assert pval > 1e-4, pval
    w_half = np.asarray(bm(0.25, 0.75))
    assert abs(w_half.var() - 0.5) < 0.05
