"""Reversible-Heun adjoint pair: exact gradients by algebraic inversion.

Counterpart of reference reversible_heun.py:76-144 (arXiv:2105.13493). The
forward ``ReversibleHeun`` carries extra state ``(f, g, z)`` such that its
input can be exactly reconstructed from its output; the backward pass inverts
the recurrence step-by-step and accumulates adjoints
``(adj_y, adj_f, adj_g, adj_z, adj_params)`` with one local vjp of
``f_and_g`` per step — giving gradients that are exact for the *discrete*
forward computation (up to floating point), unlike the continuous adjoint.

Because our forward grid steps to every output time (integrate.build_interval_grid),
the reference's caveat about ``ts`` not being a multiple of ``dt``
(adjoint.py:243-257) does not bite: the backward reconstruction re-steps the
exact forward sequence.
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import integrate, sdeint as sdeint_mod, solvers
from ..brownian.derived import ReverseBrownian
from ..settings import NOISE_TYPES
from ..utils.misc import tree_lc


class AdjointReversibleHeun(solvers.BaseSDESolver):
    """Registry placeholder: the reversible adjoint is orchestrated by
    ``sdeint_adjoint_reversible_heun`` rather than the generic solver loop."""
    weak_order = 1.0
    sde_type = "stratonovich"
    noise_types = tuple(NOISE_TYPES.all())
    levy_area_approximations = ("none", "space-time", "davie", "foster")

    def __init__(self, *args, **kwargs):
        raise ValueError("adjoint_reversible_heun can only be used as the "
                         "adjoint_method of sdeint_adjoint with "
                         "method='reversible_heun'.")


@dataclasses.dataclass(frozen=True)
class _RevCfg:
    ts: tuple
    dt: float
    grid_noise: bool
    levy: str


def _adjoint_of_prod(sde, a, v):
    """Cotangent of ``prod(g, v)`` w.r.t. g: diagonal -> a*v;
    general/scalar/additive -> outer product (reference reversible_heun.py:91-95)."""
    if sde.noise_type == NOISE_TYPES.diagonal:
        return a * v
    return a[..., None] * v[..., None, :]


def _fwd_integrate(cfg, sde, bm, y0, extra0):
    solver = solvers.ReversibleHeun(sde=sde, bm=None, dt=cfg.dt)
    grid, bidx = integrate.build_interval_grid(cfg.ts, cfg.dt)
    if cfg.grid_noise:
        noise_xs = integrate.sample_grid_noise(bm._key, grid, tuple(bm.shape),
                                               bm.dtype,
                                               levy_area_approximation=cfg.levy)
        return integrate.integrate_to_outputs(solver, y0, extra0, grid, bidx,
                                              noise_xs=noise_xs)
    return integrate.integrate_to_outputs(solver, y0, extra0, grid, bidx, bm=bm)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _rev_solve(cfg, sde, bm, y0, extra0):
    return _fwd_integrate(cfg, sde, bm, y0, extra0)


def _rev_solve_fwd(cfg, sde, bm, y0, extra0):
    ys, extra_out = _fwd_integrate(cfg, sde, bm, y0, extra0)
    return (ys, extra_out), (sde, bm, ys, extra_out)


def _rev_solve_bwd(cfg, res, ct):
    grad_ys, grad_extra = ct
    sde, bm, ys, extra_out = res
    fwd = sde  # a ForwardSDE

    grid, bidx = integrate.build_interval_grid(cfg.ts, cfg.dt)
    n_steps = len(grid) - 1
    T = len(bidx)
    order = np.concatenate([
        np.arange(bidx[i], bidx[i + 1])[::-1] for i in range(T - 2, -1, -1)])
    time_dtype = jnp.result_type(ys)
    bt0 = jnp.asarray(-grid[1:][order], time_dtype)
    bt1 = jnp.asarray(-grid[:-1][order], time_dtype)

    inject = np.zeros(n_steps, bool)
    out_idx = np.zeros(n_steps, np.int32)
    for i in range(T - 1):
        inject[bidx[i + 1] - 1] = True
        out_idx[bidx[i + 1] - 1] = i + 1
    inj_xs = jnp.asarray(inject[order])
    oi_xs = jnp.asarray(out_idx[order])

    if cfg.grid_noise:
        W, _, _ = integrate.sample_grid_noise(bm._key, grid, tuple(bm.shape),
                                              bm.dtype,
                                              levy_area_approximation=cfg.levy)
        noise_cols = (W[order],)
        rev_bm = None
    else:
        noise_cols = ()
        rev_bm = ReverseBrownian(bm)

    def zero_ct(tree):
        def zero(x):
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.inexact):
                return jnp.zeros_like(x)
            return np.zeros(np.shape(x), dtype=jax.dtypes.float0)
        return jax.tree_util.tree_map(zero, tree)

    grad_f0, grad_g0, grad_z0 = grad_extra
    y_like = ys[0]
    aug0 = dict(y=jnp.zeros_like(y_like), adj_y=jnp.zeros_like(y_like),
                adj_f=grad_f0, adj_g=grad_g0, adj_z=grad_z0,
                adj_sde=zero_ct(sde))
    carry0 = (aug0, extra_out)  # backward starts from the final forward extras

    xs = (bt0, bt1, inj_xs, oi_xs) + noise_cols

    def body(carry, x):
        aug, extra = carry
        t0b, t1b, inj, oi, *noise_list = x
        f0, g0, z0 = extra

        y = jnp.where(inj, ys[oi], aug["y"])
        adj_y = jnp.where(inj, aug["adj_y"] + grad_ys[oi], aug["adj_y"])

        dt = t1b - t0b
        if cfg.grid_noise:
            dW = noise_list[0]
        else:
            dW = rev_bm(t0b, t1b)
        half_dt = 0.5 * dt
        half_dW = 0.5 * dW

        # Invert the forward recurrence (reference reversible_heun.py:109-144).
        # Note signs: on the reversed clock the forward update is subtracted.
        z1 = 2 * y - z0 - f0 * dt - fwd.prod(g0, dW)

        adj_y_half_dt = adj_y * half_dt
        adj_y_half_dW = _adjoint_of_prod(fwd, adj_y, half_dW)

        adj_f1 = adj_y_half_dt
        adj_f0 = aug["adj_f"] + adj_y_half_dt
        adj_g1 = adj_y_half_dW
        adj_g0 = aug["adj_g"] + adj_y_half_dW

        def f_and_g(z_, sde_):
            return sde_.f_and_g(-t0b, z_)

        _, fg_vjp = jax.vjp(f_and_g, z0, fwd)
        vjp_z, vjp_sde = fg_vjp((adj_f0, adj_g0))
        adj_z0 = aug["adj_z"] + vjp_z
        adj_sde = tree_lc((1.0, aug["adj_sde"]), (1.0, vjp_sde))

        f1, g1 = fwd.f_and_g(-t1b, z1)
        y1 = y - (f0 + f1) * half_dt - fwd.prod(g0 + g1, half_dW)

        adj_y1 = adj_y + 2 * adj_z0
        adj_z1 = -adj_z0
        adj_f1 = adj_f1 + adj_z0 * dt
        adj_g1 = adj_g1 + _adjoint_of_prod(fwd, adj_z0, dW)

        aug1 = dict(y=y1, adj_y=adj_y1, adj_f=adj_f1, adj_g=adj_g1,
                    adj_z=adj_z1, adj_sde=adj_sde)
        return (aug1, (f1, g1, z1)), None

    (aug_fin, _), _ = jax.lax.scan(body, carry0, xs)

    grad_y0 = aug_fin["adj_y"] + grad_ys[0]
    grad_extra0 = (aug_fin["adj_f"], aug_fin["adj_g"], aug_fin["adj_z"])
    grad_bm = zero_ct(bm)
    return aug_fin["adj_sde"], grad_bm, grad_y0, grad_extra0


_rev_solve.defvjp(_rev_solve_fwd, _rev_solve_bwd)


def sdeint_adjoint_reversible_heun(sde, y0, ts, bm, dt, options, adjoint_options,
                                   logqp, extra, extra_solver_state):
    """Entry point used by sdeint_adjoint for method='reversible_heun'."""
    del options, adjoint_options
    grid_noise = isinstance(bm, sdeint_mod._BMWrapper)
    inner_bm = bm.bm if grid_noise else bm
    cfg = _RevCfg(ts=tuple(float(t) for t in ts), dt=float(dt),
                  grid_noise=grid_noise,
                  levy=inner_bm.levy_area_approximation)
    if extra_solver_state is None:
        solver = solvers.ReversibleHeun(sde=sde, bm=None, dt=dt)
        t0_arr = jnp.asarray(ts[0], sdeint_mod._time_dtype(y0))
        extra_solver_state = solver.init_extra_solver_state(t0_arr, y0)
    ys, extra_solver_state = _rev_solve(cfg, sde, inner_bm, y0,
                                        tuple(extra_solver_state))
    return sdeint_mod.parse_return(y0, ys, extra_solver_state, extra, logqp)
