"""O(1)-memory gradients: the stochastic adjoint as a ``jax.custom_vjp``.

Counterpart of /root/reference/torchsde/_core/adjoint.py. The reference wraps
the solve in a ``torch.autograd.Function`` whose backward loops over output
intervals in reverse, re-integrating an augmented adjoint SDE and re-injecting
output cotangents (adjoint.py:97-119). Here:

* the forward solve steps *to* each output time (per-interval grid) instead of
  interpolating, so the backward pass re-steps exactly the same (t0, t1)
  pairs — noise replay is bitwise, either by re-deriving the same per-step
  i.i.d. increments from the same key (grid mode, default) or by querying the
  same counter-based BrownianInterval cells through ``ReverseBrownian``
  (object mode);
* the backward pass is ONE merged ``lax.scan`` over all backward steps, with
  cotangent injection and state resets applied at interval boundaries via
  masked gathers — no per-interval Python loop, no host syncs;
* "adjoint params" are the array leaves of the SDE pytree itself, so the
  augmented state is the pytree ``(y, adj_y, adj_sde)`` and parameter
  gradients come out with the SDE's own structure (the reference flattens to
  one row, adjoint.py:75-79).

Memory: residuals are the ``(T, batch, d)`` output states only — O(T), not
O(n_steps) — exactly the reference's memory contract (SURVEY.md §3.2). Noise
is batch-precomputed per pass only while the buffers stay under
``integrate.NOISE_PRECOMPUTE_MAX_BYTES``; past that both passes generate it
per step inside the scan, keeping the O(T) total for arbitrarily small ``dt``.
"""

import dataclasses
import functools
import warnings

import jax
import jax.numpy as jnp
import numpy as np

from . import integrate, sdeint as sdeint_mod, solvers
from .adjoint_sde import AdjointSDE
from ..brownian.derived import ReverseBrownian
from ..settings import METHODS, NOISE_TYPES, SDE_TYPES
from ..utils import misc


@dataclasses.dataclass(frozen=True)
class _Cfg:
    ts: tuple
    dt: float
    method: str
    adjoint_method: str
    grid_noise: bool
    levy: str
    options: tuple
    adjoint_options: tuple
    rtol: float
    atol: float
    dt_min: float
    adaptive: bool = False
    rng_impl: str = "threefry"
    adjoint_adaptive: bool = False
    adjoint_rtol: float = 1e-5
    adjoint_atol: float = 1e-4
    unroll: int = 1
    adjoint_max_steps: int = 16384
    noise_precompute: object = None  # True/False force; None = size policy


def _zero_cotangent(tree):
    def zero(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.inexact):
            return jnp.zeros_like(x)
        return np.zeros(np.shape(x), dtype=jax.dtypes.float0)
    return jax.tree_util.tree_map(zero, tree)


def _make_solver(cfg, sde, bm, adjoint):
    method = cfg.adjoint_method if adjoint else cfg.method
    options = dict(cfg.adjoint_options if adjoint else cfg.options)
    cls = solvers.select(method=method, sde_type=sde.sde_type)
    return cls(sde=sde, bm=None, dt=cfg.dt, adaptive=False, rtol=cfg.rtol,
               atol=cfg.atol, dt_min=cfg.dt_min, options=options)


def _fwd_integrate(cfg, sde, bm, y0, extra0):
    solver = _make_solver(cfg, sde, bm, adjoint=False)
    if cfg.adaptive:
        # Adaptive forward solve (on-device while_loop); the backward pass
        # re-integrates each output interval with fixed steps, querying the
        # same BrownianInterval, so noise stays consistent even though the
        # backward grid differs from the accepted forward steps (this matches
        # the reference, whose backward never sees the forward's accepted
        # steps either, base_solver.py:114-147 + adjoint.py:97-113).
        ys, extra_out, _stats = integrate.integrate_adaptive(
            solver, y0, extra0, np.asarray(cfg.ts), bm, cfg.dt, cfg.rtol,
            cfg.atol, cfg.dt_min)
        return ys, extra_out
    grid, bidx = integrate.build_interval_grid(cfg.ts, cfg.dt)
    noise_xs = noise_fn = None
    if _precompute_noise(cfg, bm, len(grid) - 1):
        if cfg.grid_noise:
            noise_xs = integrate.sample_grid_noise(
                bm._key, grid, tuple(bm.shape), bm.dtype,
                needs_U=solver.needs_U, needs_A=solver.needs_A,
                levy_area_approximation=cfg.levy, rng_impl=cfg.rng_impl)
        else:
            noise_xs = integrate.precompute_bm_noise(bm, grid, solver.needs_U,
                                                     solver.needs_A)
    else:
        # O(1)-noise-memory mode for long solves: generate/query per step
        # inside the scan. The backward pass makes the same (deterministic)
        # choice and replays the identical increments — grid mode by
        # per-interval fold_in keys (order-independent), object mode by
        # querying the same BrownianInterval cells.
        noise_fn = _make_noise_fn(cfg, bm, solver.needs_U, solver.needs_A)
    return integrate.integrate_to_outputs(solver, y0, extra0, grid, bidx,
                                          noise_xs=noise_xs, noise_fn=noise_fn,
                                          unroll=cfg.unroll)


def _precompute_noise(cfg, bm, n_steps):
    """Shared fwd/bwd policy. Sized on the UNION of the forward and adjoint
    solvers' U/A needs — both derivable from cfg alone, so the decision is
    identical in the two passes even though their per-solver needs may differ
    (an A buffer is m times the W buffer for general noise and must count)."""
    fwd_U, fwd_A = solvers.method_noise_needs(cfg.method)
    adj_U, adj_A = solvers.method_noise_needs(cfg.adjoint_method)
    return integrate.should_precompute_noise(
        n_steps, tuple(bm.shape), bm.dtype, fwd_U or adj_U, fwd_A or adj_A,
        override=cfg.noise_precompute)


def _make_noise_fn(cfg, bm, needs_U, needs_A):
    if cfg.grid_noise:
        # In-scan generation always uses threefry fold_in keys (the pallas
        # bulk generator only exists for the precomputed path); fwd and bwd
        # both come through here, so they agree. Warn like sdeint does when
        # this silently overrides a requested hardware PRNG.
        if cfg.rng_impl == "pallas":
            reason = ("noise_precompute=False was requested"
                      if cfg.noise_precompute is False else
                      "noise buffers exceed the precompute threshold")
            warnings.warn("rng_impl='pallas' only applies to precomputed "
                          "noise; this solve generates per-step threefry "
                          f"noise inside the scan ({reason}).")
        return integrate.make_iid_noise_fn(
            bm._key, tuple(bm.shape), bm.dtype, needs_U=needs_U,
            needs_A=needs_A, levy_area_approximation=cfg.levy)
    return lambda i, t0, t1: integrate.query_bm(bm, t0, t1, needs_U, needs_A)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _adjoint_solve(cfg, sde, bm, y0, extra0):
    return _fwd_integrate(cfg, sde, bm, y0, extra0)


def _adjoint_solve_fwd(cfg, sde, bm, y0, extra0):
    ys, extra_out = _fwd_integrate(cfg, sde, bm, y0, extra0)
    return (ys, extra_out), (sde, bm, ys)


def _adjoint_solve_bwd(cfg, res, ct):
    grad_ys, _grad_extra = ct
    sde, bm, ys = res

    adjoint_sde = AdjointSDE(sde)
    adj_solver = _make_solver(cfg, adjoint_sde, bm, adjoint=True)

    if cfg.adjoint_adaptive:
        return _adjoint_bwd_adaptive(cfg, sde, bm, ys, grad_ys, adj_solver)

    grid, bidx = integrate.build_interval_grid(cfg.ts, cfg.dt)
    n_steps = len(grid) - 1
    T = len(bidx)

    # Backward step order: intervals T-2..0, each interval's steps reversed.
    order = np.concatenate([
        np.arange(bidx[i], bidx[i + 1])[::-1] for i in range(T - 2, -1, -1)
    ]) if n_steps > 0 else np.zeros((0,), np.int64)
    time_dtype = jnp.result_type(*jax.tree_util.tree_leaves(ys))
    fwd_t0s = grid[:-1][order]
    fwd_t1s = grid[1:][order]
    bt0 = jnp.asarray(-fwd_t1s, time_dtype)
    bt1 = jnp.asarray(-fwd_t0s, time_dtype)

    # A backward step injects (state reset + cotangent) when it is the first
    # step of its interval in processing order (forward idx == bidx[i+1]-1).
    inject = np.zeros(n_steps, bool)
    out_idx = np.zeros(n_steps, np.int32)
    for i in range(T - 1):
        inject[bidx[i + 1] - 1] = True
        out_idx[bidx[i + 1] - 1] = i + 1
    inj_xs = jnp.asarray(inject[order])
    oi_xs = jnp.asarray(out_idx[order])

    needs_U = adj_solver.needs_U
    needs_A = adj_solver.needs_A

    noise_fn = None
    if _precompute_noise(cfg, bm, n_steps):
        if cfg.grid_noise:
            # Re-derive the forward pass's increments from the same key: W
            # comes from its own split of the key, so it is bitwise identical
            # regardless of whether U/A are also generated.
            W, U, A = integrate.sample_grid_noise(
                bm._key, grid, tuple(bm.shape), bm.dtype,
                needs_U=needs_U, needs_A=needs_A,
                levy_area_approximation=cfg.levy, rng_impl=cfg.rng_impl)
        else:
            # Object mode: the backward grid's (t0, t1) pairs are known
            # host-side, so batch the interval queries into one pass here too.
            # Increments are in *forward* orientation — exactly what querying
            # ReverseBrownian per step returned (rev(−t1, −t0) == bm(t0, t1)).
            W, U, A = integrate.precompute_bm_noise(bm, grid, needs_U, needs_A)
        noise_cols = (W[order],) + ((U[order],) if needs_U else ()) \
            + ((A[order],) if needs_A else ())
        xs_noise = noise_cols
    else:
        # O(1)-noise-memory replay (same policy decision as the forward pass):
        # re-derive each forward interval's increments inside the scan, keyed
        # by the interval's forward index / forward times.
        noise_fn = _make_noise_fn(cfg, bm, needs_U, needs_A)
        xs_noise = (jnp.asarray(order, jnp.int32),)

    y_like = jax.tree_util.tree_map(lambda l: l[0], ys)
    aug0 = (jnp.zeros_like(y_like), jnp.zeros_like(y_like), _zero_cotangent(sde))

    xs = (bt0, bt1, inj_xs, oi_xs) + xs_noise

    def body(aug, x):
        t0b, t1b, inj, oi, *noise_list = x
        y, adj_y, adj_sde = aug
        y = jnp.where(inj, ys[oi], y)
        adj_y = jnp.where(inj, adj_y + grad_ys[oi], adj_y)
        aug = (y, adj_y, adj_sde)
        if noise_fn is not None:
            # Forward-orientation times: bt0 = −fwd_t1, bt1 = −fwd_t0, and
            # float negation is exact, so these are bitwise the forward pair.
            noise = noise_fn(noise_list[0], -t1b, -t0b)
        else:
            noise_list = list(noise_list)
            W_step = noise_list.pop(0)
            U_step = noise_list.pop(0) if needs_U else None
            A_step = noise_list.pop(0) if needs_A else None
            noise = (W_step, U_step, A_step)
        aug1, _ = adj_solver.step(t0b, t1b, aug, (), noise)
        return aug1, None

    (y_fin, adj_y_fin, adj_sde_fin), _ = jax.lax.scan(body, aug0, xs,
                                                      unroll=cfg.unroll)

    grad_y0 = adj_y_fin + grad_ys[0]
    grad_sde = adj_sde_fin
    grad_bm = _zero_cotangent(bm)
    grad_extra0 = ()
    return grad_sde, grad_bm, grad_y0, grad_extra0


def _merged_bwd_adaptive(cfg, adj_solver, rev_bm, ys, grad_ys, adj_sde0,
                         bounded):
    """ONE merged adaptive solve over ALL backward output intervals.

    Processes segments ``T-1 -> 1`` sequentially inside a single on-device
    loop; at each segment boundary the augmented state is reset to the saved
    trajectory and the incoming output cotangent injected — the same
    boundary semantics as the reference's per-interval reverse loop
    (/root/reference/torchsde/_core/adjoint.py:97-119), but with program size
    and compile time flat in ``len(ts)`` (the round-1 design unrolled T-1
    separate while-loops).

    ``bounded=False``: a dynamic ``lax.while_loop`` (fast primal, not
    reverse-differentiable). ``bounded=True``: exactly
    ``cfg.adjoint_max_steps`` masked iterations of a ``lax.scan`` with
    identical arithmetic, so ``jax.grad`` works — this is what makes double
    backward through ``adjoint_adaptive`` possible. When the bounded budget
    runs out before segment 1 completes the result is NaN (loud), matching
    ``integrate.integrate_adaptive_scan``'s contract.

    Per-segment controller state (step size ``h``, PI ratio) resets at each
    boundary, matching the reference's fresh ``integrate`` call per interval.
    """
    ts = np.asarray(cfg.ts, np.float64)
    T = len(ts)
    if T == 1:
        # Degenerate single-output schedule: the solve is the identity, so the
        # output cotangent passes straight through to y0 and no parameter
        # gradient accumulates. (The general path below would double-count:
        # init injects grad_ys[T-1] and the final line adds grad_ys[0], the
        # same index when T == 1.)
        return adj_sde0, grad_ys[0]
    time_dtype = jnp.result_type(ys)
    neg_ts = jnp.asarray(-ts, time_dtype)
    dt0 = jnp.asarray(cfg.dt, time_dtype)
    rtol, atol, dt_min = cfg.adjoint_rtol, cfg.adjoint_atol, cfg.dt_min

    init = dict(
        seg=jnp.asarray(T - 1, jnp.int32),
        curr_t=neg_ts[T - 1],
        y=ys[T - 1],
        adj_y=grad_ys[T - 1],
        adj_sde=adj_sde0,
        h=dt0,
        prev_ratio=jnp.asarray(1.0, time_dtype),
        prev_ratio_valid=jnp.asarray(False),
        n_accepted=jnp.asarray(0, jnp.int32),
        n_rejected=jnp.asarray(0, jnp.int32),
    )

    def tree_where(pred, new, old):
        return jax.tree_util.tree_map(lambda n, o: jnp.where(pred, n, o),
                                      new, old)

    def transition(c, active):
        """Finish segment c['seg']; start the next (state reset + cotangent
        injection). curr_t needs no update: the old segment's end time IS the
        new segment's start time."""
        seg2 = c["seg"] - active.astype(jnp.int32)
        inject = jnp.logical_and(active, seg2 >= 1)
        idx = jnp.clip(seg2, 0, T - 1)
        c = dict(c)
        c["seg"] = seg2
        c["y"] = jnp.where(inject, ys[idx], c["y"])
        c["adj_y"] = jnp.where(inject, c["adj_y"] + grad_ys[idx], c["adj_y"])
        c["h"] = jnp.where(inject, dt0, c["h"])
        c["prev_ratio_valid"] = jnp.logical_and(c["prev_ratio_valid"], ~inject)
        return c

    def attempt(c, active):
        """One adaptive step attempt — the shared ``integrate.adaptive_attempt``
        arithmetic (1 full + 2 half steps, PI controller), minus the output
        interpolation (only segment-end states matter here)."""
        seg_end = neg_ts[jnp.clip(c["seg"] - 1, 0, T - 1)]
        t = c["curr_t"]
        next_t = jnp.where(active, jnp.minimum(t + c["h"], seg_end), t + c["h"])
        aug = (c["y"], c["adj_y"], c["adj_sde"])
        (aug_next, _, accept, h_new, prev_ratio,
         prev_ratio_valid) = integrate.adaptive_attempt(
            adj_solver, rev_bm, t, next_t, aug, (), c["h"], c["prev_ratio"],
            c["prev_ratio_valid"], rtol, atol, dt_min, active=active)

        c = dict(c)
        c["curr_t"] = jnp.where(accept, next_t, c["curr_t"])
        y1, adj_y1, adj_sde1 = aug_next
        c["y"] = jnp.where(accept, y1, c["y"])
        c["adj_y"] = jnp.where(accept, adj_y1, c["adj_y"])
        c["adj_sde"] = tree_where(accept, adj_sde1, c["adj_sde"])
        c["h"] = jnp.where(active, h_new, c["h"])
        c["prev_ratio"] = jnp.where(active, prev_ratio, c["prev_ratio"])
        c["prev_ratio_valid"] = jnp.where(active, prev_ratio_valid,
                                          c["prev_ratio_valid"])
        c["n_accepted"] = c["n_accepted"] + accept.astype(jnp.int32)
        c["n_rejected"] = (c["n_rejected"]
                           + jnp.logical_and(active, ~accept).astype(jnp.int32))
        return c

    if bounded:
        def body(c, _):
            act = c["seg"] >= 1
            seg_end = neg_ts[jnp.clip(c["seg"] - 1, 0, T - 1)]
            done = jnp.logical_and(act, c["curr_t"] >= seg_end)
            step_mode = jnp.logical_and(act, ~done)
            c = transition(c, done)
            c = attempt(c, step_mode)
            return c, None

        final, _ = jax.lax.scan(body, init, None,
                                length=int(cfg.adjoint_max_steps))
        incomplete = final["seg"] >= 1
        # Multiplicative NaN poisoning: a `where(incomplete, nan, x)` would
        # route cotangents to the NaN *constant* and silently zero every
        # gradient — multiplying keeps both the values AND their gradients
        # loud when the budget is exhausted (raise `adjoint_max_steps`).
        poison = jnp.where(incomplete, jnp.asarray(jnp.nan, time_dtype),
                           jnp.asarray(1.0, time_dtype))
        final["adj_y"] = final["adj_y"] * poison
        final["adj_sde"] = jax.tree_util.tree_map(
            lambda l: l * poison.astype(l.dtype)
            if jnp.issubdtype(jnp.result_type(l), jnp.inexact) else l,
            final["adj_sde"])
    else:
        def cond(c):
            return c["seg"] >= 1

        def body(c):
            seg_end = neg_ts[jnp.clip(c["seg"] - 1, 0, T - 1)]
            done = c["curr_t"] >= seg_end
            return jax.lax.cond(
                done,
                lambda c: transition(c, jnp.asarray(True)),
                lambda c: attempt(c, jnp.asarray(True)),
                c)

        final = jax.lax.while_loop(cond, body, init)

    grad_y0 = final["adj_y"] + grad_ys[0]
    return final["adj_sde"], grad_y0


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _adaptive_backward_solve(cfg, sde, bm, ys, grad_ys):
    """Merged adaptive adjoint backward with the same fast/differentiable
    dispatch as ``integrate.adaptive_solve``: the primal runs the dynamic
    while-loop; under differentiation (double backward) the forward is
    re-traced as the bounded masked scan, whose transpose is plain backprop —
    the reference gets double backward by recursing into its own autograd
    Function (/root/reference/torchsde/_core/adjoint.py:98)."""
    adjoint_sde = AdjointSDE(sde)
    adj_solver = _make_solver(cfg, adjoint_sde, bm, adjoint=True)
    return _merged_bwd_adaptive(cfg, adj_solver, ReverseBrownian(bm), ys,
                                grad_ys, _zero_cotangent(sde), bounded=False)


def _adaptive_backward_solve_fwd(cfg, sde, bm, ys, grad_ys):
    def run(sde, bm, ys, grad_ys):
        adjoint_sde = AdjointSDE(sde)
        adj_solver = _make_solver(cfg, adjoint_sde, bm, adjoint=True)
        return _merged_bwd_adaptive(cfg, adj_solver, ReverseBrownian(bm), ys,
                                    grad_ys, _zero_cotangent(sde),
                                    bounded=True)

    return jax.vjp(run, sde, bm, ys, grad_ys)


def _adaptive_backward_solve_bwd(cfg, vjp_fn, ct):
    return vjp_fn(ct)


_adaptive_backward_solve.defvjp(_adaptive_backward_solve_fwd,
                                _adaptive_backward_solve_bwd)


def _adjoint_bwd_adaptive(cfg, sde, bm, ys, grad_ys, adj_solver):
    """Adaptive backward solve (``adjoint_adaptive=True``): re-integrate the
    augmented adjoint state over every output interval in reverse in ONE
    merged on-device loop, at ``adjoint_rtol``/``adjoint_atol``, querying the
    same counter-based BrownianInterval through ReverseBrownian so noise
    replay stays exact at whatever sub-intervals the controller visits.
    Reference: separate adjoint tolerances plumbed to the backward integrate,
    /root/reference/torchsde/_core/adjoint.py:133-141."""
    del adj_solver  # rebuilt inside the custom_vjp boundary
    adj_sde_grad, grad_y0 = _adaptive_backward_solve(cfg, sde, bm, ys, grad_ys)
    grad_bm = _zero_cotangent(bm)
    grad_extra0 = ()
    return adj_sde_grad, grad_bm, grad_y0, grad_extra0


_adjoint_solve.defvjp(_adjoint_solve_fwd, _adjoint_solve_bwd)


def _select_default_adjoint_method(sde, method, adjoint_method):
    """Default adjoint-method table (reference adjoint.py:281-296)."""
    if adjoint_method is not None:
        return adjoint_method
    if method == METHODS.reversible_heun:
        return METHODS.adjoint_reversible_heun
    return {
        SDE_TYPES.ito: {
            NOISE_TYPES.diagonal: METHODS.milstein,
            NOISE_TYPES.additive: METHODS.euler,
            NOISE_TYPES.scalar: METHODS.euler,
            NOISE_TYPES.general: METHODS.euler,
        }[sde.noise_type],
        SDE_TYPES.stratonovich: METHODS.midpoint,
    }[sde.sde_type]


def sdeint_adjoint(sde,
                   y0,
                   ts,
                   bm=None,
                   method=None,
                   adjoint_method=None,
                   dt=1e-3,
                   adaptive=False,
                   adjoint_adaptive=False,
                   rtol=1e-5,
                   adjoint_rtol=1e-5,
                   atol=1e-4,
                   adjoint_atol=1e-4,
                   dt_min=1e-5,
                   options=None,
                   adjoint_options=None,
                   adjoint_params=None,
                   names=None,
                   logqp=False,
                   extra=False,
                   extra_solver_state=None,
                   key=None,
                   entropy=None,
                   rng_impl="threefry",
                   unroll=1,
                   adjoint_max_steps=None,
                   noise_precompute=None,
                   **unused_kwargs):
    """Integrate an SDE with O(1)-memory stochastic-adjoint gradients.

    API parity with reference adjoint.py:130-224, with one JAX-native
    difference: gradients flow to *all array leaves of the SDE pytree* (and
    ``y0``), so ``adjoint_params`` is unnecessary — parameters entering the
    drift via closure in the reference (e.g. a context tensor,
    latent_sde_lorenz.py:180-187) should instead live as attributes on the SDE
    module. Passing ``adjoint_params`` raises unless every entry already is a
    leaf of the SDE pytree (in which case it is a harmless no-op): silently
    accepting foreign arrays would produce *different* gradient coverage than
    the reference.

    ``noise_precompute``: fixed-step noise strategy (see ``sdeint``). The
    default (``None``) batches per-step increments into one O(n_steps) buffer
    when small, and switches both the forward and the backward solve to
    per-step in-scan generation above ``integrate.NOISE_PRECOMPUTE_MAX_BYTES``
    so total adjoint memory stays O(T) in output count for arbitrarily small
    ``dt``. Both passes make the same decision and replay bitwise-identical
    increments in either mode.
    """
    misc.handle_unused_kwargs(unused_kwargs, msg="`sdeint_adjoint`")
    del unused_kwargs
    if adjoint_params is not None:
        sde_leaves = jax.tree_util.tree_leaves(sde)
        sde_leaf_ids = {id(leaf) for leaf in sde_leaves}
        leaf_sigs = {(np.shape(l), jnp.result_type(l)) for l in sde_leaves}
        foreign = []
        copies = []
        for i, p in enumerate(adjoint_params):
            if id(p) in sde_leaf_ids:
                continue
            # Not the same object — a rebuilt leaf (device_put / tree_map /
            # jit boundaries recreate array objects) still matches some SDE
            # leaf structurally; gradients flow to the pytree's own leaves
            # either way, so that is a warn-not-crash situation. Only an
            # array matching NO leaf signature (e.g. a closure context, the
            # one pattern where reference gradient coverage would silently
            # differ) is a hard error.
            if (np.shape(p), jnp.result_type(p)) in leaf_sigs:
                copies.append(i)
            else:
                foreign.append(i)
        if foreign:
            raise ValueError(
                f"`adjoint_params` entries at positions {foreign} are not leaves "
                f"of the SDE pytree, so the adjoint would not differentiate with "
                f"respect to them. Attach them as attributes on the SDE module "
                f"(arrays on a torchsde_tpu Module are pytree leaves and receive "
                f"gradients automatically); `adjoint_params` itself is redundant "
                f"in this framework.")
        if copies:
            warnings.warn(
                f"`adjoint_params` entries at positions {copies} are not the "
                f"SDE pytree's own array objects (they match a leaf's "
                f"shape/dtype, so they are likely rebuilt copies from a "
                f"device_put/tree_map/jit boundary). Gradients flow to the "
                f"leaves of the `sde` actually passed in; `adjoint_params` is "
                f"ignored.")

    # dt_min only steers the default bm's descent depth, and only matters
    # when some direction of the solve is adaptive (fixed-step solves never
    # descend the default interval).
    sde, y0, ts, bm, method, options = sdeint_mod.check_contract(
        sde, y0, ts, bm, method, adaptive, options, names, logqp, key, entropy,
        dt_min=dt_min if (adaptive or adjoint_adaptive) else None)
    adjoint_method = _select_default_adjoint_method(sde, method, adjoint_method)
    adjoint_options = {} if adjoint_options is None else dict(adjoint_options)

    ts_traced = isinstance(ts, jax.core.Tracer)
    if ts_traced and (adaptive or adjoint_adaptive):
        raise ValueError("Traced `ts` is only supported for fixed-step "
                         "adjoint solves (the adaptive loop's output "
                         "bookkeeping needs concrete output times).")

    if method == METHODS.reversible_heun or adjoint_method == METHODS.adjoint_reversible_heun:
        if adaptive:
            raise ValueError("method='reversible_heun' with adaptive=True is not "
                             "supported under sdeint_adjoint: the backward "
                             "reconstruction must re-step the exact forward grid.")
        if ts_traced:
            raise ValueError(
                "Traced `ts` is not supported with method='reversible_heun' "
                "under sdeint_adjoint: its algebraically-reversed backward "
                "must re-step the exact forward grid, which a traced "
                "schedule cannot pin down. Use a concrete `ts`, or a "
                "non-reversible method.")
        from .adjoint_solvers import sdeint_adjoint_reversible_heun
        return sdeint_adjoint_reversible_heun(
            sde, y0, ts, bm, dt, options, adjoint_options, logqp, extra,
            extra_solver_state)

    if ts_traced:
        # Same contract as `sdeint`'s traced branch (reference sdeint.py:
        # 161-166 accepts tensor ts on both entry points): the explicit
        # `bm`'s [t0, t1] provides the static solve range; `ts` only steers
        # on-device output interpolation. The adjoint solves over the FULL
        # static step grid with an output at every grid point (each output
        # interval is exactly one dt-step, so build_interval_grid reproduces
        # this same grid), then interpolates onto the traced schedule OUTSIDE
        # the custom_vjp — output cotangents flow through the interpolation
        # weights into the merged adjoint backward unchanged. Residuals in
        # this mode are the (n_grid, batch, d) grid states — O(n_steps), not
        # O(T): a traced schedule can bracket any grid cell, so every state
        # is a potential output.
        ts_solve = integrate.build_step_grid(bm.t0, bm.t1, dt)
    else:
        ts_solve = ts

    grid_noise = isinstance(bm, sdeint_mod._BMWrapper)
    if (adaptive or adjoint_adaptive) and grid_noise:
        # Adaptive stepping (forward or backward) queries arbitrary
        # sub-intervals: both directions must source noise from the same
        # interval sampler, not the per-grid-step iid stream.
        grid_noise = False
    inner_bm = bm.bm if isinstance(bm, sdeint_mod._BMWrapper) else bm
    if adaptive or adjoint_adaptive:
        sdeint_mod.warn_if_coarser_than_dt_min(inner_bm, dt_min)

    def _hash_opts(d):
        return tuple(sorted(d.items()))

    if adjoint_max_steps is None:
        # Step-attempt budget for the *differentiated* (double-backward)
        # merged adaptive backward; the undifferentiated primal uses a
        # dynamic while-loop and ignores it.
        adjoint_max_steps = sdeint_mod.default_max_steps(ts_solve, dt, dt_min)
    cfg = _Cfg(ts=tuple(float(t) for t in ts_solve), dt=float(dt), method=method,
               adjoint_method=adjoint_method, grid_noise=grid_noise,
               levy=inner_bm.levy_area_approximation,
               options=_hash_opts(options), adjoint_options=_hash_opts(adjoint_options),
               rtol=float(rtol), atol=float(atol), dt_min=float(dt_min),
               adaptive=bool(adaptive), rng_impl=rng_impl,
               adjoint_adaptive=bool(adjoint_adaptive),
               adjoint_rtol=float(adjoint_rtol), adjoint_atol=float(adjoint_atol),
               unroll=int(unroll), adjoint_max_steps=int(adjoint_max_steps),
               noise_precompute=noise_precompute)

    solver = _make_solver(cfg, sde, inner_bm, adjoint=False)
    if inner_bm.levy_area_approximation not in solver.levy_area_approximations:
        raise ValueError(f"SDE solver requires one of "
                         f"{solver.levy_area_approximations} set as the "
                         f"`levy_area_approximation` on the Brownian motion.")
    if extra_solver_state is None:
        t0_arr = jnp.asarray(ts_solve[0], sdeint_mod._time_dtype(y0))
        extra_solver_state = solver.init_extra_solver_state(t0_arr, y0)

    ys, extra_solver_state = _adjoint_solve(cfg, sde, inner_bm, y0,
                                            tuple(extra_solver_state))
    if ts_traced:
        # Interpolate the grid outputs onto the traced schedule, then poison
        # out-of-range schedules exactly like `sdeint`'s traced branch (and
        # for the same reason — neither bound is checkable at trace time;
        # multiplicative poisoning keeps values AND gradients loud).
        time_dtype = sdeint_mod._time_dtype(y0)
        grid_dev = jnp.asarray(ts_solve, time_dtype)
        ts_dev = jnp.asarray(ts, time_dtype)
        ys = integrate.linear_interp_on_grid(ts_dev, grid_dev, ys)
        ok = jnp.logical_and(ts_dev[0] == grid_dev[0],
                             ts_dev[-1] <= grid_dev[-1])
        poison = jnp.where(ok, jnp.asarray(1.0, time_dtype),
                           jnp.asarray(jnp.nan, time_dtype))
        ys = jax.tree_util.tree_map(lambda l: l * poison.astype(l.dtype), ys)
    return sdeint_mod.parse_return(y0, ys, extra_solver_state, extra, logqp)
