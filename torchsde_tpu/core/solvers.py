"""SDE solver step functions.

Counterpart of /root/reference/torchsde/_core/methods/ (9 methods) and
base_solver.py. Key TPU-first differences:

* ``step`` is a pure function ``(t0, t1, y0, extra0, noise) -> (y1, extra1)``;
  the Brownian increments are handed in by the integrator (which can precompute
  them for a whole ``lax.scan`` in one fused PRNG pass) instead of each step
  querying a host-side cache.
* States may be arbitrary pytrees (linear combinations via ``tree_lc``), which
  is how the adjoint's augmented ``(y, adj_y, adj_params)`` state flows through
  the same solver code without the reference's flatten-to-one-row trick
  (reference adjoint.py:75-79).
* Solver metadata (sde_type / noise_types / orders / Levy-area needs) is
  validated once at construction, exactly mirroring reference
  base_solver.py:49-58.
"""

import jax
import jax.numpy as jnp

from . import tableaus
from ..settings import LEVY_AREA_APPROXIMATIONS, METHODS, METHOD_OPTIONS, NOISE_TYPES, SDE_TYPES
from ..utils.misc import tree_lc

_ALL_LEVY = tuple(LEVY_AREA_APPROXIMATIONS.all())
_ALL_NOISE = tuple(NOISE_TYPES.all())


class BaseSDESolver:
    """Solver base: trait validation + step interface (reference base_solver.py:29-90)."""

    strong_order = None
    weak_order = None
    sde_type = None
    noise_types = None
    levy_area_approximations = None
    needs_U = False
    needs_A = False

    def __init__(self, sde, bm=None, dt=None, adaptive=False, rtol=1e-5,
                 atol=1e-4, dt_min=1e-5, options=None, **kwargs):
        del kwargs
        if sde.sde_type != self.sde_type:
            raise ValueError(f"SDE is of type {sde.sde_type} but solver is for type "
                             f"{self.sde_type}")
        if sde.noise_type not in self.noise_types:
            raise ValueError(f"SDE has noise type {sde.noise_type} but solver only "
                             f"supports noise types {self.noise_types}")
        if bm is not None and bm.levy_area_approximation not in self.levy_area_approximations:
            raise ValueError(f"SDE solver requires one of {self.levy_area_approximations} "
                             f"set as the `levy_area_approximation` on the Brownian motion.")
        if sde.noise_type == NOISE_TYPES.scalar and bm is not None:
            import numpy as np
            if int(np.prod(bm.shape[1:])) != 1:
                raise ValueError("The Brownian motion for scalar SDEs must of dimension 1.")
        self.sde = sde
        self.bm = bm
        self.dt = dt
        self.adaptive = adaptive
        self.rtol = rtol
        self.atol = atol
        self.dt_min = dt_min
        self.options = {} if options is None else dict(options)

    def __repr__(self):
        return (f"{self.__class__.__name__} of strong order: {self.strong_order}, "
                f"and weak order: {self.weak_order}")

    def init_extra_solver_state(self, t0, y0):
        return ()

    @property
    def nfe_per_step(self):
        """Vector-field evaluations per step, counted the way the reference's
        per-problem nfe counters do (/root/reference/tests/problems.py:55-72:
        each call of ``f`` or ``g`` is one evaluation, so ``f_and_g`` /
        ``f_and_g_prod`` count 2, ``g_prod`` counts 1, and vjp/jvp-based
        brackets count the single primal diffusion evaluation)."""
        raise NotImplementedError

    def step(self, t0, t1, y0, extra0, noise):
        """One step from t0 to t1. ``noise`` is ``(W, U, A)`` for the full step
        (entries are None unless the solver declared needs_U / needs_A)."""
        raise NotImplementedError


class Euler(BaseSDESolver):
    """Euler-Maruyama (reference euler.py:19-37)."""
    weak_order = 1.0
    sde_type = SDE_TYPES.ito
    noise_types = _ALL_NOISE
    levy_area_approximations = _ALL_LEVY

    def __init__(self, sde, **kwargs):
        self.strong_order = 1.0 if sde.noise_type == NOISE_TYPES.additive else 0.5
        super().__init__(sde=sde, **kwargs)

    nfe_per_step = 2  # one fused f_and_g_prod

    def step(self, t0, t1, y0, extra0, noise):
        del extra0
        dt = t1 - t0
        I_k = noise[0]
        f, g_prod = self.sde.f_and_g_prod(t0, y0, I_k)
        y1 = tree_lc((1.0, y0), (dt, f), (1.0, g_prod))
        return y1, ()


class Midpoint(BaseSDESolver):
    """Explicit midpoint, Stratonovich (reference midpoint.py:19-45)."""
    weak_order = 1.0
    sde_type = SDE_TYPES.stratonovich
    noise_types = _ALL_NOISE
    levy_area_approximations = _ALL_LEVY

    def __init__(self, sde, **kwargs):
        self.strong_order = 0.5 if sde.noise_type == NOISE_TYPES.general else 1.0
        super().__init__(sde=sde, **kwargs)

    nfe_per_step = 4  # two fused f_and_g_prod calls

    def step(self, t0, t1, y0, extra0, noise):
        del extra0
        dt = t1 - t0
        I_k = noise[0]
        f, g_prod = self.sde.f_and_g_prod(t0, y0, I_k)
        half_dt = 0.5 * dt
        t_prime = t0 + half_dt
        y_prime = tree_lc((1.0, y0), (half_dt, f), (0.5, g_prod))
        f_prime, g_prod_prime = self.sde.f_and_g_prod(t_prime, y_prime, I_k)
        y1 = tree_lc((1.0, y0), (dt, f_prime), (1.0, g_prod_prime))
        return y1, ()


class Heun(BaseSDESolver):
    """Stratonovich Heun, trapezoidal predictor-corrector (reference heun.py:25-48)."""
    weak_order = 1.0
    sde_type = SDE_TYPES.stratonovich
    noise_types = _ALL_NOISE
    levy_area_approximations = _ALL_LEVY

    def __init__(self, sde, **kwargs):
        self.strong_order = 0.5 if sde.noise_type == NOISE_TYPES.general else 1.0
        super().__init__(sde=sde, **kwargs)

    nfe_per_step = 4  # two fused f_and_g_prod calls

    def step(self, t0, t1, y0, extra0, noise):
        del extra0
        dt = t1 - t0
        I_k = noise[0]
        f, g_prod = self.sde.f_and_g_prod(t0, y0, I_k)
        y0_prime = tree_lc((1.0, y0), (dt, f), (1.0, g_prod))
        f_prime, g_prod_prime = self.sde.f_and_g_prod(t1, y0_prime, I_k)
        y1 = tree_lc((1.0, y0), (0.5 * dt, f), (0.5 * dt, f_prime),
                     (0.5, g_prod), (0.5, g_prod_prime))
        return y1, ()


class EulerHeun(BaseSDESolver):
    """Euler drift + Heun-averaged diffusion, Stratonovich
    (reference euler_heun.py:19-42)."""
    weak_order = 1.0
    sde_type = SDE_TYPES.stratonovich
    noise_types = _ALL_NOISE
    levy_area_approximations = _ALL_LEVY

    def __init__(self, sde, **kwargs):
        self.strong_order = 0.5 if sde.noise_type == NOISE_TYPES.general else 1.0
        super().__init__(sde=sde, **kwargs)

    nfe_per_step = 3  # f_and_g_prod + one extra g_prod

    def step(self, t0, t1, y0, extra0, noise):
        del extra0
        dt = t1 - t0
        I_k = noise[0]
        f, g_prod = self.sde.f_and_g_prod(t0, y0, I_k)
        y_prime = tree_lc((1.0, y0), (1.0, g_prod))
        g_prod_prime = self.sde.g_prod(t1, y_prime, I_k)
        y1 = tree_lc((1.0, y0), (dt, f), (0.5, g_prod), (0.5, g_prod_prime))
        return y1, ()


class BaseMilstein(BaseSDESolver):
    """Milstein family (reference milstein.py:22-94): adds the Levy-bracket
    correction ``0.5 * gdg_prod(v)``; the derivative can come from autodiff
    (default) or a derivative-free second diffusion evaluation
    (``options={'grad_free': True}``)."""
    strong_order = 1.0
    weak_order = 1.0
    noise_types = (NOISE_TYPES.additive, NOISE_TYPES.diagonal, NOISE_TYPES.scalar)
    levy_area_approximations = _ALL_LEVY

    def __init__(self, sde, options=None, **kwargs):
        options = {} if options is None else dict(options)
        if METHOD_OPTIONS.grad_free not in options:
            options[METHOD_OPTIONS.grad_free] = False
        if options[METHOD_OPTIONS.grad_free] and sde.noise_type == NOISE_TYPES.additive:
            # dg = 0: the autodiff path already returns an exact zero correction.
            options[METHOD_OPTIONS.grad_free] = False
        if options[METHOD_OPTIONS.grad_free] and getattr(sde, "is_adjoint_sde", False):
            raise ValueError(
                "Derivative-free Milstein cannot be used for adjoint SDEs, because it "
                "requires direct access to the diffusion, whilst adjoint SDEs rely on "
                "a more efficient diffusion-vector product. Use derivative-using "
                "Milstein instead: `adjoint_options=dict(grad_free=False)`")
        super().__init__(sde=sde, options=options, **kwargs)

    @property
    def nfe_per_step(self):
        # grad-based: f + one primal g inside the vjp bracket; grad-free:
        # f_and_g + the extra derivative-free g evaluation.
        return 3 if self.options[METHOD_OPTIONS.grad_free] else 2

    def v_term(self, I_k, dt):
        raise NotImplementedError

    def y_prime_f_factor(self, dt, f):
        raise NotImplementedError

    def step(self, t0, t1, y0, extra0, noise):
        del extra0
        dt = t1 - t0
        I_k = noise[0]
        v = self.v_term(I_k, dt)

        if self.options[METHOD_OPTIONS.grad_free]:
            f, g = self.sde.f_and_g(t0, y0)
            g_ = jnp.squeeze(g, 2) if g.ndim == 3 else g  # scalar vs diagonal noise
            sqrt_dt = jnp.sqrt(dt)
            y0_prime = y0 + self.y_prime_f_factor(dt, f) + g_ * sqrt_dt
            g_prime = self.sde.g(t0, y0_prime)
            g_prod_I_k = self.sde.prod(g, I_k)
            gdg_prod = self.sde.prod(g_prime - g, v) / (2 * sqrt_dt)
            y1 = y0 + f * dt + g_prod_I_k + gdg_prod
        else:
            f = self.sde.f(t0, y0)
            g_prod_I_k, gdg_prod = self.sde.g_prod_and_gdg_prod(t0, y0, I_k, 0.5 * v)
            terms = [(1.0, y0), (dt, f), (1.0, g_prod_I_k)]
            if not (isinstance(gdg_prod, float) and gdg_prod == 0.0):
                terms.append((1.0, gdg_prod))
            y1 = tree_lc(*terms)
        return y1, ()


class MilsteinIto(BaseMilstein):
    sde_type = SDE_TYPES.ito

    def v_term(self, I_k, dt):
        return I_k ** 2 - dt

    def y_prime_f_factor(self, dt, f):
        return dt * f


class MilsteinStratonovich(BaseMilstein):
    sde_type = SDE_TYPES.stratonovich

    def v_term(self, I_k, dt):
        return I_k ** 2

    def y_prime_f_factor(self, dt, f):
        return 0.0


class SRK(BaseSDESolver):
    """Strong order 1.5 stochastic Runge-Kutta (Rößler 2010); tableau srid2 for
    diagonal/scalar noise, sra1 for additive (reference srk.py:31-111)."""
    strong_order = 1.5
    weak_order = 1.5
    sde_type = SDE_TYPES.ito
    noise_types = (NOISE_TYPES.additive, NOISE_TYPES.diagonal, NOISE_TYPES.scalar)
    levy_area_approximations = (LEVY_AREA_APPROXIMATIONS.space_time,
                                LEVY_AREA_APPROXIMATIONS.davie,
                                LEVY_AREA_APPROXIMATIONS.foster)
    needs_U = True

    def __init__(self, sde, **kwargs):
        if getattr(sde, "is_adjoint_sde", False):
            raise ValueError(
                "Stochastic Runge-Kutta methods cannot be used for adjoint SDEs, "
                "because it requires direct access to the diffusion, whilst adjoint "
                "SDEs rely on a more efficient diffusion-vector product. Use a "
                "different method instead.")
        super().__init__(sde=sde, **kwargs)

    @property
    def nfe_per_step(self):
        # Exact evaluation counts of the stage loops below: srid2 (4 stages)
        # re-evaluates (f, g) for every (stage, substage) pair — 6 pairs — plus
        # one f and one g_prod per stage: 12 + 8 = 20. sra1 (2 stages):
        # 1 inner (f + g_prod) pair + 2 stage (f + g_prod) pairs = 6.
        if self.sde.noise_type == NOISE_TYPES.additive:
            s = tableaus.SRA1.STAGES
            return s * (s - 1) + 2 * s
        s = tableaus.SRID2.STAGES
        return s * (s - 1) + 2 * s

    def step(self, t0, t1, y0, extra0, noise):
        if self.sde.noise_type == NOISE_TYPES.additive:
            return self._additive_step(t0, t1, y0, extra0, noise)
        return self._diagonal_or_scalar_step(t0, t1, y0, extra0, noise)

    def _diagonal_or_scalar_step(self, t0, t1, y0, extra0, noise):
        del extra0
        tab = tableaus.SRID2
        dt = t1 - t0
        rdt = 1.0 / dt
        sqrt_dt = jnp.sqrt(jnp.asarray(dt, jnp.result_type(noise[0])))
        I_k, I_k0 = noise[0], noise[1]
        I_kk = (I_k ** 2 - dt) * 0.5
        I_kkk = (I_k ** 3 - 3 * dt * I_k) * (1.0 / 6.0)

        y1 = y0
        H0, H1 = [], []
        for s in range(tab.STAGES):
            H0s, H1s = y0, y0
            for j in range(s):
                f = self.sde.f(t0 + tab.C0[j] * dt, H0[j])
                g = self.sde.g(t0 + tab.C1[j] * dt, H1[j])
                g = jnp.squeeze(g, 2) if g.ndim == 3 else g
                H0s = H0s + tab.A0[s][j] * f * dt + tab.B0[s][j] * g * I_k0 * rdt
                H1s = H1s + tab.A1[s][j] * f * dt + tab.B1[s][j] * g * sqrt_dt
            H0.append(H0s)
            H1.append(H1s)

            f = self.sde.f(t0 + tab.C0[s] * dt, H0s)
            g_weight = (tab.beta1[s] * I_k +
                        tab.beta2[s] * I_kk / sqrt_dt +
                        tab.beta3[s] * I_k0 * rdt +
                        tab.beta4[s] * I_kkk * rdt)
            g_prod = self.sde.g_prod(t0 + tab.C1[s] * dt, H1s, g_weight)
            y1 = y1 + tab.alpha[s] * f * dt + g_prod
        return y1, ()

    def _additive_step(self, t0, t1, y0, extra0, noise):
        del extra0
        tab = tableaus.SRA1
        dt = t1 - t0
        rdt = 1.0 / dt
        I_k, I_k0 = noise[0], noise[1]

        y1 = y0
        H0 = []
        for i in range(tab.STAGES):
            H0i = y0
            for j in range(i):
                f = self.sde.f(t0 + tab.C0[j] * dt, H0[j])
                g_weight = tab.B0[i][j] * I_k0 * rdt
                g_prod = self.sde.g_prod(t0 + tab.C1[j] * dt, y0, g_weight)
                H0i = H0i + tab.A0[i][j] * f * dt + g_prod
            H0.append(H0i)

            f = self.sde.f(t0 + tab.C0[i] * dt, H0i)
            g_weight = tab.beta1[i] * I_k + tab.beta2[i] * I_k0 * rdt
            g_prod = self.sde.g_prod(t0 + tab.C1[i] * dt, y0, g_weight)
            y1 = y1 + tab.alpha[i] * f * dt + g_prod
        return y1, ()


class LogODEMidpoint(BaseSDESolver):
    """Log-ODE scheme: midpoint + full-Levy-area correction
    (reference log_ode.py:25-56)."""
    weak_order = 1.0
    sde_type = SDE_TYPES.stratonovich
    noise_types = _ALL_NOISE
    levy_area_approximations = (LEVY_AREA_APPROXIMATIONS.davie,
                                LEVY_AREA_APPROXIMATIONS.foster)
    needs_A = True

    def __init__(self, sde, **kwargs):
        if getattr(sde, "is_adjoint_sde", False):
            raise ValueError(
                "Log-ODE schemes cannot be used for adjoint SDEs, because they "
                "require direct access to the diffusion, whilst adjoint SDEs rely on "
                "a more efficient diffusion-vector product. Use a different method "
                "instead.")
        self.strong_order = 0.5 if sde.noise_type == NOISE_TYPES.general else 1.0
        super().__init__(sde=sde, **kwargs)

    nfe_per_step = 5  # two f_and_g_prod + the jvp bracket's primal g

    def step(self, t0, t1, y0, extra0, noise):
        del extra0
        dt = t1 - t0
        I_k, A = noise[0], noise[2]
        f, g_prod = self.sde.f_and_g_prod(t0, y0, I_k)
        half_dt = 0.5 * dt
        t_prime = t0 + half_dt
        y_prime = y0 + half_dt * f + 0.5 * g_prod
        f_prime, g_prod_prime = self.sde.f_and_g_prod(t_prime, y_prime, I_k)
        dg_ga_prime = self.sde.dg_ga_jvp_column_sum(t_prime, y_prime, A)
        y1 = y0 + dt * f_prime + g_prod_prime + dg_ga_prime
        return y1, ()


class ReversibleHeun(BaseSDESolver):
    """Algebraically reversible Heun (arXiv:2105.13493;
    reference reversible_heun.py:48-73). Carries extra state (f0, g0, z0)."""
    weak_order = 1.0
    sde_type = SDE_TYPES.stratonovich
    noise_types = _ALL_NOISE
    levy_area_approximations = _ALL_LEVY

    def __init__(self, sde, **kwargs):
        self.strong_order = 1.0 if sde.noise_type == NOISE_TYPES.additive else 0.5
        super().__init__(sde=sde, **kwargs)

    nfe_per_step = 2  # one f_and_g at z1; (f0, g0) ride in the carry

    def init_extra_solver_state(self, t0, y0):
        f0, g0 = self.sde.f_and_g(t0, y0)
        return (f0, g0, y0)

    def step(self, t0, t1, y0, extra0, noise):
        f0, g0, z0 = extra0
        dt = t1 - t0
        dW = noise[0]
        z1 = tree_lc((2.0, y0), (-1.0, z0), (dt, f0), (1.0, self.sde.prod(g0, dW)))
        f1, g1 = self.sde.f_and_g(t1, z1)
        g_sum_prod = self.sde.prod(jax.tree_util.tree_map(lambda a, b: a + b, g0, g1),
                                   0.5 * dW)
        y1 = tree_lc((1.0, y0), (0.5 * dt, f0), (0.5 * dt, f1), (1.0, g_sum_prod))
        return y1, (f1, g1, z1)


SOLVER_REGISTRY = {
    METHODS.euler: {SDE_TYPES.ito: Euler},
    METHODS.milstein: {SDE_TYPES.ito: MilsteinIto,
                       SDE_TYPES.stratonovich: MilsteinStratonovich},
    METHODS.srk: {SDE_TYPES.ito: SRK},
    METHODS.midpoint: {SDE_TYPES.stratonovich: Midpoint},
    METHODS.heun: {SDE_TYPES.stratonovich: Heun},
    METHODS.euler_heun: {SDE_TYPES.stratonovich: EulerHeun},
    METHODS.reversible_heun: {SDE_TYPES.stratonovich: ReversibleHeun},
    METHODS.log_ode_midpoint: {SDE_TYPES.stratonovich: LogODEMidpoint},
}


def select(method, sde_type):
    """String -> solver class dispatch (reference methods/__init__.py:26-48)."""
    if method == METHODS.adjoint_reversible_heun:
        from .adjoint_solvers import AdjointReversibleHeun
        return AdjointReversibleHeun
    table = SOLVER_REGISTRY.get(method)
    if table is None:
        raise ValueError(f"Method '{method}' does not match any known method.")
    cls = table.get(sde_type)
    if cls is None:
        cls = next(iter(table.values()))
    return cls


def method_noise_needs(method):
    """``(needs_U, needs_A)`` for a method string without instantiating the
    solver, OR-ed over the method's sde_type variants. Used by the noise
    precompute size policy, which must account for U/A buffers (an A buffer
    is ``m`` times the W buffer for general noise)."""
    if method == METHODS.adjoint_reversible_heun:
        return False, False
    table = SOLVER_REGISTRY.get(method)
    if table is None:
        raise ValueError(f"Method '{method}' does not match any known method.")
    return (any(c.needs_U for c in table.values()),
            any(c.needs_A for c in table.values()))
