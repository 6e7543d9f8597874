"""Scan-based integration loops.

This replaces the reference's per-step Python ``while`` loop
(/root/reference/torchsde/_core/base_solver.py:92-149) with:

* fixed-step: a single ``lax.scan`` over a host-precomputed step grid, with the
  outputs linearly interpolated onto the requested ``ts`` exactly as the
  reference does (base_solver.py:147, interp.py:15-18) — but vectorised; long
  solves keep only the grid states bracketing an output time
  (``integrate_fixed_sparse``) and generate noise inside the scan
  (``make_iid_noise_fn`` / per-step queries), so memory is O(T) in output
  count, not O(n_steps);
* adaptive: a ``lax.while_loop`` whose error estimate and PI step-size
  controller (reference adaptive_stepping.py:21-69) run entirely on device —
  the reference's ``.cpu().item()`` host sync per step does not exist here.

Noise for fixed-step solves can be *precomputed in one fused pass*
(``sample_grid_noise``): per-step increments over disjoint intervals are
independent ``N(0, dt)`` (and ``H ~ N(0, dt/12)``), so when the caller did not
supply an explicit Brownian-motion object there is no need to run the dyadic
tree descent per step. When a ``BaseBrownian`` is supplied, each scan step
queries it with traced times (everything stays on device).
"""

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..settings import LEVY_AREA_APPROXIMATIONS

# Precomputed per-step noise buffers above this size are generated inside the
# scan body instead (O(1) noise memory; see `should_precompute_noise`). The
# adjoint's memory contract is O(T) in output count (reference adjoint.py
# saves only `ys`), so a (n_steps, batch, m) buffer must not be allowed to
# grow without bound just because dt is small.
NOISE_PRECOMPUTE_MAX_BYTES = 1 << 30


def noise_buffer_bytes(n_steps, size, dtype, needs_U, needs_A):
    """Bytes of the (W[, U][, A]) buffers precomputed for a fixed grid."""
    base = int(n_steps) * int(np.prod(size, dtype=np.int64)) if size else int(n_steps)
    itemsize = jnp.dtype(dtype).itemsize
    m = size[-1] if len(size) >= 2 else 1
    channels = 1 + int(bool(needs_U)) + (m if needs_A else 0)
    return base * itemsize * channels


def should_precompute_noise(n_steps, size, dtype, needs_U, needs_A,
                            override=None):
    """Precompute-vs-in-scan policy for fixed-step noise.

    ``override``: True/False forces the mode (``sdeint(...,
    noise_precompute=)``); None picks precompute unless the buffers would
    exceed ``NOISE_PRECOMPUTE_MAX_BYTES``. Forward and backward passes of the
    adjoint call this with identical arguments, so they always agree."""
    if override is not None:
        return bool(override)
    return noise_buffer_bytes(n_steps, size, dtype, needs_U, needs_A) \
        <= NOISE_PRECOMPUTE_MAX_BYTES


def make_iid_noise_fn(key, size, dtype, needs_U=False, needs_A=False,
                      levy_area_approximation=LEVY_AREA_APPROXIMATIONS.none):
    """Per-step i.i.d. increment sampler for in-scan noise generation.

    Returns ``noise_fn(i, t0, t1) -> (W, U, A)`` where ``i`` is the step's
    *grid interval index*. Each channel is keyed by ``fold_in(channel_key,
    i)``, so the stream is a pure function of (key, index): the adjoint's
    backward scan replays the forward's increments bitwise even though it
    visits the intervals in a different order. Same law as
    :func:`sample_grid_noise` (which the precomputed path uses), but a
    different deterministic stream — solves switch streams when the
    precompute policy flips, never within one solve.
    """
    key_w, key_h, key_a = jax.random.split(key, 3)

    def noise_fn(i, t0, t1):
        h = (t1 - t0).astype(dtype)
        W = jax.random.normal(jax.random.fold_in(key_w, i), size, dtype) \
            * jnp.sqrt(h)
        U = H = None
        if needs_U or needs_A:
            H = jax.random.normal(jax.random.fold_in(key_h, i), size, dtype) \
                * jnp.sqrt(h / 12.0)
            U = h * (0.5 * W + H)
        A = None
        if needs_A:
            if len(size) in (0, 1):
                A = jnp.zeros(size, dtype)
            else:
                m = size[-1]
                noise = jax.random.normal(jax.random.fold_in(key_a, i),
                                          (*size, m), dtype)
                noise = noise - jnp.swapaxes(noise, -1, -2)
                A = (H[..., :, None] * W[..., None, :] -
                     W[..., :, None] * H[..., None, :])
                if levy_area_approximation == LEVY_AREA_APPROXIMATIONS.foster:
                    tenth_h = 0.1 * h
                    H_sq = jnp.square(H)
                    std = jnp.sqrt(tenth_h *
                                   (tenth_h + H_sq[..., :, None] +
                                    H_sq[..., None, :]))
                else:
                    std = jnp.sqrt(h * h / 12.0)
                A = A + std * noise
        return W, U if needs_U else None, A

    return noise_fn


def build_step_grid(t0, t1, dt):
    """Host-side step grid in float64: t0, t0+dt, ..., capped at t1
    (reference base_solver.py:115 semantics: the last step may be short)."""
    t0, t1, dt = float(t0), float(t1), float(dt)
    n = max(1, int(math.ceil((t1 - t0) / dt - 1e-9)))
    grid = t0 + dt * np.arange(n + 1, dtype=np.float64)
    grid[-1] = t1
    return grid


def sample_grid_noise(key, grid, size, dtype, needs_U=False, needs_A=False,
                      levy_area_approximation=LEVY_AREA_APPROXIMATIONS.none,
                      rng_impl="threefry"):
    """I.i.d. per-step Brownian increments for a fixed step grid, in one pass.

    Returns ``(W, U, A)`` with shapes ``(N, *size)`` (``U``/``A`` are None when
    not requested). Increments over disjoint steps are independent, so direct
    sampling matches the law of any virtual-tree sampler restricted to this
    grid.

    ``rng_impl='pallas'`` generates the Gaussians with the TPU hardware PRNG
    (ops/prng.py) — faster bulk generation, different (but still
    deterministic) stream than threefry.
    """
    n = len(grid) - 1
    dts = jnp.asarray(np.diff(grid), dtype)
    bshape = (n,) + (1,) * len(size)
    dts_b = dts.reshape(bshape)
    key_w, key_h, key_a = jax.random.split(key, 3)
    if rng_impl == "pallas":
        from ..ops.prng import pallas_normal
        seed = jax.random.randint(key_w, (), 0, 2 ** 31 - 1)
        normal_w = pallas_normal(seed, (n, *size), dtype)
        normal_h = pallas_normal(seed + 1, (n, *size), dtype)
    else:
        normal_w = jax.random.normal(key_w, (n, *size), dtype)
        normal_h = None
    W = normal_w * jnp.sqrt(dts_b)
    U = None
    H = None
    if needs_U or needs_A:
        if rng_impl == "pallas":
            H = normal_h * jnp.sqrt(dts_b / 12.0)
        else:
            H = jax.random.normal(key_h, (n, *size), dtype) * jnp.sqrt(dts_b / 12.0)
        U = dts_b * (0.5 * W + H)
    A = None
    if needs_A:
        if len(size) in (0, 1):
            A = jnp.zeros((n, *size), dtype)
        else:
            m = size[-1]
            noise = jax.random.normal(key_a, (n, *size, m), dtype)
            noise = noise - jnp.swapaxes(noise, -1, -2)
            A = (H[..., :, None] * W[..., None, :] -
                 W[..., :, None] * H[..., None, :])
            if levy_area_approximation == LEVY_AREA_APPROXIMATIONS.foster:
                tenth_h = 0.1 * dts_b
                H_sq = jnp.square(H)
                std = jnp.sqrt(tenth_h[..., None] *
                               (tenth_h[..., None] + H_sq[..., :, None] + H_sq[..., None, :]))
            else:
                std = (jnp.sqrt(dts * dts / 12.0)).reshape(bshape + (1,))
            A = A + std * noise
    return W, U, A


def query_bm(bm, t0, t1, needs_U, needs_A):
    """Query a BaseBrownian, normalising the return to a (W, U, A) triple."""
    if needs_U and needs_A:
        W, U, A = bm(t0, t1, return_U=True, return_A=True)
    elif needs_U:
        W, U = bm(t0, t1, return_U=True)
        A = None
    elif needs_A:
        W, A = bm(t0, t1, return_A=True)
        U = None
    else:
        W = bm(t0, t1)
        U = A = None
    return W, U, A


def query_bm_pairs(bm, points, pairs, needs_U, needs_A):
    """Query several intervals over shared endpoints, as (W, U, A) triples.

    Samplers exposing ``query_pairs`` (BrownianInterval and its wrappers) run
    ONE traced dyadic descent per unique point instead of two per pair —
    bitwise-identical results, half the descents on the adaptive hot path.
    Duck-typed samplers fall back to per-pair ``__call__`` queries.
    """
    if hasattr(bm, "query_pairs"):
        outs = bm.query_pairs(points, pairs, return_U=needs_U,
                              return_A=needs_A)
        res = []
        for o in outs:
            if needs_U and needs_A:
                W, U, A = o
            elif needs_U:
                W, U = o
                A = None
            elif needs_A:
                W, A = o
                U = None
            else:
                W, U, A = o, None, None
            res.append((W, U, A))
        return res
    return [query_bm(bm, points[ia], points[ib], needs_U, needs_A)
            for ia, ib in pairs]


def precompute_bm_noise(bm, grid, needs_U, needs_A):
    """Batch all of a fixed grid's noise queries into one pass, outside any scan.

    The grid times are known host-side before the solve, so there is no reason
    to run the O(levels) dyadic descent inside the sequential scan body (the
    round-1 design did, costing ~2x20 Gaussian generations per step). Uses the
    sampler's bulk ``query_grid`` when available (bitwise identical to per-pair
    queries), else a ``vmap`` over the interval API. Returns ``(W, U, A)``
    with leading dimension ``len(grid) - 1``.
    """
    if hasattr(bm, "query_grid"):
        return bm.query_grid(grid, return_U=needs_U, return_A=needs_A)
    # Duck-typed bm without the bulk API (every library sampler inherits it
    # from BaseBrownian): run the base class's generic vmapped implementation
    # unbound rather than keeping a second copy of it here.
    from ..brownian.base import BaseBrownian
    return BaseBrownian.query_grid(bm, grid, return_U=needs_U,
                                   return_A=needs_A)


def linear_interp_on_grid(out_ts, grid, ys_grid):
    """Vectorised linear interpolation of grid states onto output times
    (reference interp.py:15-18). Exact (bitwise y-grid value) when an output
    time coincides with a grid point."""
    idx = jnp.clip(jnp.searchsorted(grid, out_ts, side="left"), 1, len(grid) - 1)
    t_lo = grid[idx - 1]
    t_hi = grid[idx]
    w = ((out_ts - t_lo) / (t_hi - t_lo))

    def leaf_interp(ys):
        w_b = w.reshape(w.shape + (1,) * (ys.ndim - 1)).astype(ys.dtype)
        return ys[idx - 1] * (1 - w_b) + ys[idx] * w_b

    return jax.tree_util.tree_map(leaf_interp, ys_grid)


def _noise_stream(solver, n_steps, bm, noise_xs, noise_fn):
    """Normalise the three noise modes into one scan contract.

    Returns ``(tail_xs, get_noise)``: ``tail_xs`` is a tuple of per-step
    arrays the caller appends to its scanned ``xs``, and
    ``get_noise(t0, t1, tail)`` produces the step's ``(W, U, A)`` triple from
    the corresponding slice. Exactly one of ``noise_xs`` (precomputed
    buffers), ``noise_fn`` (``noise_fn(i, t0, t1)`` in-scan, O(1) noise
    memory) or ``bm`` (in-scan interval query) drives the noise — shared by
    every fixed-step integrator so the noise-triple contract lives in one
    place."""
    needs_U = solver.needs_U
    needs_A = solver.needs_A
    if noise_xs is not None:
        W, U, A = noise_xs
        if needs_U and U is None:
            raise ValueError(
                f"Solver '{type(solver).__name__}' needs the space-time Lévy "
                "area channel U, but the precomputed noise buffers were built "
                "without it. Precompute with needs_U=True (or use a "
                "levy_area_approximation that includes 'space-time').")
        if needs_A and A is None:
            raise ValueError(
                f"Solver '{type(solver).__name__}' needs the Lévy area "
                "channel A, but the precomputed noise buffers were built "
                "without it. Precompute with needs_A=True.")
        tail_xs = (W,) + ((U,) if needs_U else ()) + ((A,) if needs_A else ())

        def get_noise(t0, t1, tail):
            tail = list(tail)
            W_step = tail.pop(0)
            U_step = tail.pop(0) if needs_U else None
            A_step = tail.pop(0) if needs_A else None
            return W_step, U_step, A_step
    elif noise_fn is not None:
        tail_xs = (jnp.arange(n_steps, dtype=jnp.int32),)

        def get_noise(t0, t1, tail):
            return noise_fn(tail[0], t0, t1)
    else:
        tail_xs = ()

        def get_noise(t0, t1, tail):
            return query_bm(bm, t0, t1, needs_U, needs_A)
    return tail_xs, get_noise


def _make_step_fn(solver, get_noise, remat):
    """One solver step fed by ``get_noise``; ``remat=True`` checkpoints it so
    reverse-mode stores only the step's inputs (carry-sized), never its
    internal activations. Callers keep any output-buffer scatter OUTSIDE this
    function — checkpointing a body that carries an output buffer would save
    the whole buffer as a residual every step."""
    def step_fn(y, extra, t0, t1, tail):
        noise = get_noise(t0, t1, tail)
        return solver.step(t0, t1, y, extra, noise)
    return jax.checkpoint(step_fn) if remat else step_fn


def integrate_fixed(solver, y0, extra0, grid, ts, bm=None, noise_xs=None,
                    noise_fn=None, time_dtype=None, unroll=1, remat=False):
    """Fixed-step solve over ``grid``, interpolated onto ``ts``.

    Exactly one of ``bm`` (queried per step inside the scan), ``noise_fn``
    (``noise_fn(i, t0, t1)`` called per step inside the scan — O(1) noise
    memory), or ``noise_xs`` (a precomputed ``(W, U, A)`` triple with leading
    dim ``len(grid)-1``) must drive the noise.

    ``remat=True`` checkpoints the solver step (:func:`jax.checkpoint`):
    reverse-mode
    differentiation then stores only the per-step carry ``(y, extra)`` and
    recomputes the step's internal activations in the backward pass. This
    cuts backprop-through-solver residual memory from O(n_steps x step
    activations) — which for neural vector fields dwarfs the states — to
    O(n_steps x state), at the cost of one extra forward evaluation per step
    during the backward sweep.

    Returns ``(ys, extra_final)`` with ``ys`` a pytree whose leaves have
    leading dimension ``len(ts)``.
    """
    if time_dtype is None:
        time_dtype = jnp.result_type(*jax.tree_util.tree_leaves(y0))
    grid_dev = jnp.asarray(grid, time_dtype)
    t0s = grid_dev[:-1]
    t1s = grid_dev[1:]

    tail_xs, get_noise = _noise_stream(solver, len(grid) - 1, bm, noise_xs,
                                       noise_fn)
    step = _make_step_fn(solver, get_noise, remat)
    xs = (t0s, t1s) + tail_xs

    def body(carry, x):
        y, extra = carry
        t0, t1, *tail = x
        y1, extra1 = step(y, extra, t0, t1, tuple(tail))
        return (y1, extra1), y1

    (_, extra_final), ys_steps = jax.lax.scan(body, (y0, extra0), xs,
                                              unroll=unroll)
    ys_grid = jax.tree_util.tree_map(
        lambda first, rest: jnp.concatenate([first[None], rest], axis=0), y0, ys_steps)
    if isinstance(ts, jax.core.Tracer):
        ts_dev = jnp.asarray(ts, time_dtype)
    else:
        ts_dev = jnp.asarray(np.asarray(ts, np.float64), time_dtype)
    ys = linear_interp_on_grid(ts_dev, grid_dev, ys_grid)
    return ys, extra_final


# Dense (T, n_grid, ...) state stacks above this size switch integrate_fixed
# to the sparse-output path: only the <= 2T grid states bracketing the output
# times are kept, so forward solves are O(T) in output count for arbitrarily
# small dt (matching the reference, whose integrate loop stores accepted
# states transiently and appends outputs only, base_solver.py:114-147).
DENSE_OUTPUT_MAX_BYTES = 1 << 30


def state_buffer_bytes(n_grid, y0):
    """Bytes of the stacked (n_grid, *state) trajectory integrate_fixed keeps
    for interpolation."""
    return int(n_grid) * sum(
        int(np.prod(np.shape(l), dtype=np.int64)) * jnp.dtype(l.dtype).itemsize
        for l in jax.tree_util.tree_leaves(y0))


def integrate_fixed_sparse(solver, y0, extra0, grid, ts, bm=None,
                           noise_xs=None, noise_fn=None, time_dtype=None,
                           unroll=1, remat=False):
    """O(T)-memory variant of :func:`integrate_fixed` for concrete ``ts``.

    Instead of stacking every grid state and interpolating, the scan scatters
    each state into a buffer of the (host-precomputed, ``<= 2T``) unique grid
    indices that bracket some output time; interpolation then gathers from
    that buffer with arithmetic identical to :func:`linear_interp_on_grid`.
    Noise/remat/unroll semantics match :func:`integrate_fixed`.
    """
    if time_dtype is None:
        time_dtype = jnp.result_type(*jax.tree_util.tree_leaves(y0))
    grid_dev = jnp.asarray(grid, time_dtype)
    t0s = grid_dev[:-1]
    t1s = grid_dev[1:]
    n_steps = len(grid) - 1

    ts_host = np.asarray(ts, np.float64)
    idx = np.clip(np.searchsorted(grid, ts_host, side="left"), 1, n_steps)
    lo, hi = idx - 1, idx
    needed = np.unique(np.concatenate([lo, hi]))
    P = len(needed)
    # grid index -> buffer position; P is the OOB sentinel (scatter drops it,
    # same pattern as integrate_to_outputs's out_slot).
    pos = np.full(n_steps + 1, P, np.int32)
    pos[needed] = np.arange(P, dtype=np.int32)

    buf0 = jax.tree_util.tree_map(
        lambda leaf: jnp.zeros((P,) + leaf.shape, leaf.dtype)
        .at[pos[0]].set(leaf), y0)
    slot_xs = jnp.asarray(pos[1:])

    tail_xs, get_noise = _noise_stream(solver, n_steps, bm, noise_xs, noise_fn)
    # remat checkpoints ONLY the solver step: the (P, *state) output buffer is
    # scattered outside the checkpointed region, so reverse-mode residuals
    # stay O(n_steps x state), never O(n_steps x P x state).
    step = _make_step_fn(solver, get_noise, remat)
    xs = (t0s, t1s, slot_xs) + tail_xs

    def body(carry, x):
        y, extra, buf = carry
        t0, t1, slot, *tail = x
        y1, extra1 = step(y, extra, t0, t1, tuple(tail))
        buf = jax.tree_util.tree_map(lambda b, v: b.at[slot].set(v), buf, y1)
        return (y1, extra1, buf), None

    (_, extra_final, buf), _ = jax.lax.scan(body, (y0, extra0, buf0), xs,
                                            unroll=unroll)

    # Interpolate with EXACTLY linear_interp_on_grid's arithmetic (grid
    # values, weight formula, blend), reading states through the buffer map.
    pos_lo = jnp.asarray(pos[lo])
    pos_hi = jnp.asarray(pos[hi])
    t_lo = grid_dev[jnp.asarray(lo)]
    t_hi = grid_dev[jnp.asarray(hi)]
    ts_dev = jnp.asarray(ts_host, time_dtype)
    w = (ts_dev - t_lo) / (t_hi - t_lo)

    def leaf_interp(b):
        w_b = w.reshape(w.shape + (1,) * (b.ndim - 1)).astype(b.dtype)
        return b[pos_lo] * (1 - w_b) + b[pos_hi] * w_b

    ys = jax.tree_util.tree_map(leaf_interp, buf)
    return ys, extra_final


def build_interval_grid(ts, dt):
    """Per-output-interval step grid: each [ts[i], ts[i+1]] is stepped with
    size ``dt`` (last sub-step shortened), and every output time is itself a
    grid point. Returns ``(grid, boundary_idx)`` on host (float64 / int64).

    Used by the adjoint: the backward pass re-steps each interval in reverse,
    hitting exactly the same (t0, t1) pairs, so per-step noise keyed by global
    step index replays bitwise (SURVEY.md §7.3 "noise replay equality").
    """
    ts = np.asarray(ts, np.float64)
    grid = [ts[0]]
    boundary_idx = [0]
    for a, b in zip(ts[:-1], ts[1:]):
        n = max(1, int(math.ceil((b - a) / dt - 1e-9)))
        sub = a + dt * np.arange(1, n + 1)
        sub[-1] = b
        grid.extend(sub.tolist())
        boundary_idx.append(len(grid) - 1)
    return np.asarray(grid, np.float64), np.asarray(boundary_idx, np.int64)


def integrate_to_outputs(solver, y0, extra0, grid, boundary_idx, bm=None,
                         noise_xs=None, noise_fn=None, time_dtype=None,
                         unroll=1):
    """Fixed-step solve over ``grid`` where every output time is a grid point;
    states are scattered into a (T, ...) buffer inside the scan, so memory is
    O(T), not O(n_steps). Noise comes from one of ``noise_xs`` (precomputed),
    ``noise_fn`` (per-step in-scan, O(1) noise memory), or ``bm`` (per-step
    in-scan query). Returns (ys, extra_final)."""
    if time_dtype is None:
        time_dtype = jnp.result_type(*jax.tree_util.tree_leaves(y0))
    grid_dev = jnp.asarray(grid, time_dtype)
    t0s = grid_dev[:-1]
    t1s = grid_dev[1:]
    n_steps = len(grid) - 1
    T = len(boundary_idx)

    # out_slot[j] = output position filled when step j completes, else T (OOB
    # sentinel: scatter drops it).
    out_slot = np.full(n_steps, T, np.int32)
    for pos, b in enumerate(boundary_idx):
        if b > 0:
            out_slot[b - 1] = pos
    out_slot = jnp.asarray(out_slot)

    buf0 = jax.tree_util.tree_map(
        lambda leaf: jnp.zeros((T,) + leaf.shape, leaf.dtype).at[0].set(leaf), y0)

    tail_xs, get_noise = _noise_stream(solver, n_steps, bm, noise_xs, noise_fn)
    step = _make_step_fn(solver, get_noise, remat=False)
    xs = (t0s, t1s, out_slot) + tail_xs

    def body(carry, x):
        y, extra, buf = carry
        t0, t1, slot, *tail = x
        y1, extra1 = step(y, extra, t0, t1, tuple(tail))
        buf = jax.tree_util.tree_map(lambda b, v: b.at[slot].set(v), buf, y1)
        return (y1, extra1, buf), None

    (_, extra_final, buf), _ = jax.lax.scan(body, (y0, extra0, buf0), xs,
                                            unroll=unroll)
    return buf, extra_final


# --------------------------------------------------------------------------- #
#  Adaptive stepping (reference adaptive_stepping.py, base_solver.py:114-147)  #
# --------------------------------------------------------------------------- #

_SAFETY = 0.9
_FACMAX = 1.4
_FACMIN = 0.2


def _compute_error(y_full, y_half, rtol, atol, eps=1e-7):
    """RMS of (y_full - y_half) / tol over all leaves
    (reference adaptive_stepping.py:42-69), kept on device."""
    leaves_full = jax.tree_util.tree_leaves(y_full)
    leaves_half = jax.tree_util.tree_leaves(y_half)
    sq_sum = 0.0
    count = 0
    for a, b in zip(leaves_full, leaves_half):
        tol = jnp.maximum(rtol * jnp.maximum(jnp.abs(a), jnp.abs(b)) + atol, eps)
        sq_sum = sq_sum + jnp.sum(jnp.square((a - b) / tol))
        count += a.size
    error = jnp.maximum(jnp.sqrt(sq_sum / count), eps)
    # The reference host-asserts on NaN (adaptive_stepping.py:66-68); on device
    # we instead treat a NaN estimate as "reject with a huge error" so the
    # controller shrinks the step rather than looping forever.
    return jnp.where(jnp.isnan(error), jnp.asarray(1e30, error.dtype), error)


def _update_step_size(error, prev_h, prev_ratio, prev_ratio_valid):
    """On-device PI controller (reference adaptive_stepping.py:21-39)."""
    reject = error > 1.0
    ifactor = jnp.where(reject, 1.0 / 1.5, 1.0 / 4.5)
    pfactor = jnp.where(reject, 0.0, 0.13)
    ratio = _SAFETY / error
    prev_ratio_eff = jnp.where(prev_ratio_valid, prev_ratio, ratio)
    factor = ratio ** ifactor * (ratio / prev_ratio_eff) ** pfactor
    facmin = jnp.where(reject, _FACMIN, 1.0)
    factor = jnp.minimum(_FACMAX, jnp.maximum(facmin, factor))
    new_h = prev_h * factor
    new_prev_ratio = jnp.where(reject, prev_ratio_eff, ratio)
    # The reference's prev_error_ratio is non-None after *any* first call
    # (adaptive_stepping.py:30-36), so the valid flag is always True on exit.
    return new_h, new_prev_ratio, jnp.full_like(prev_ratio_valid, True)


def adaptive_attempt(solver, bm, t, next_t, state, extra, h, prev_ratio,
                     prev_ratio_valid, rtol, atol, dt_min, active):
    """One adaptive step attempt: 1 full step vs 2 half steps, RMS error
    estimate, PI step-size update, accept decision (reference
    base_solver.py:117-142 + adaptive_stepping.py). Shared by the forward
    while-loop integrator, the bounded differentiable scan integrator, and the
    merged adjoint backward so the controller arithmetic cannot drift apart.

    ``active`` masks the accept decision for bounded/masked callers (pass a
    True scalar from dynamic while-loops). The error estimate is
    stop-gradiented: step sizes are data, not differentiable quantities — the
    reference's estimate crosses to the host via ``.item()``
    (adaptive_stepping.py:69) so torch autograd never differentiates through
    the controller either.

    Returns ``(y_next, extra_next, accept, h_new, prev_ratio,
    prev_ratio_valid)`` — the caller applies its own masked carry updates.
    """
    needs_U = solver.needs_U
    needs_A = solver.needs_A
    mid_t = 0.5 * (t + next_t)
    # Three intervals over three unique endpoints: share the per-point
    # descents (3 instead of 6) — bitwise the same noise.
    noise_full, noise_h1, noise_h2 = query_bm_pairs(
        bm, jnp.stack([t, mid_t, next_t]), ((0, 2), (0, 1), (1, 2)),
        needs_U, needs_A)

    y_full, _ = solver.step(t, next_t, state, extra, noise_full)
    y_mid, extra_mid = solver.step(t, mid_t, state, extra, noise_h1)
    y_next, extra_next = solver.step(mid_t, next_t, y_mid, extra_mid, noise_h2)

    error = jax.lax.stop_gradient(_compute_error(y_full, y_next, rtol, atol))
    h_new, prev_ratio, prev_ratio_valid = _update_step_size(
        error, h, prev_ratio, prev_ratio_valid)
    hit_min = h_new < dt_min
    h_new = jnp.maximum(h_new, dt_min)
    prev_ratio_valid = jnp.logical_and(prev_ratio_valid, ~hit_min)
    # Reference accept rule (base_solver.py:139-140): accept when the error
    # passes OR the *updated* step size has hit the floor.
    accept = jnp.logical_and(
        active, jnp.logical_or(error <= 1.0, h_new <= dt_min))
    return y_next, extra_next, accept, h_new, prev_ratio, prev_ratio_valid


def integrate_adaptive(solver, y0, extra0, ts, bm, dt0, rtol, atol, dt_min,
                       time_dtype=None):
    """Adaptive solve with 1-full-step vs 2-half-steps error control.

    Everything (error estimate, accept/reject, controller state, output
    interpolation) lives in a single ``lax.while_loop`` carry — zero host
    synchronisation per step, unlike the reference's per-step ``.item()``
    (adaptive_stepping.py:69).

    Returns ``(ys, extra_final, stats)`` where ``stats`` carries on-device
    scalar counters: ``n_accepted`` / ``n_rejected`` step-attempt counts and
    ``nfe`` (number of ``solver.step`` evaluations, 3 per attempt — the
    analogue of the reference's per-problem nfe counters,
    /root/reference/tests/problems.py:44).

    Not reverse-mode differentiable (``lax.while_loop``); ``jax.grad`` callers
    go through :func:`adaptive_solve`, whose differentiable path is the
    bounded :func:`integrate_adaptive_scan`.
    """
    if time_dtype is None:
        time_dtype = jnp.result_type(*jax.tree_util.tree_leaves(y0))
    ts_host = np.asarray(ts, np.float64)
    ts_dev = jnp.asarray(ts_host, time_dtype)
    t_end = jnp.asarray(ts_host[-1], time_dtype)
    T = len(ts_host)

    buf0 = jax.tree_util.tree_map(
        lambda leaf: jnp.zeros((T,) + leaf.shape, leaf.dtype).at[0].set(leaf), y0)

    init = dict(
        curr_t=jnp.asarray(ts_host[0], time_dtype),
        prev_t=jnp.asarray(ts_host[0], time_dtype),
        curr_y=y0, prev_y=y0, extra=extra0,
        h=jnp.asarray(float(dt0), time_dtype),
        prev_ratio=jnp.asarray(1.0, time_dtype),
        prev_ratio_valid=jnp.asarray(False),
        out_idx=jnp.asarray(1, jnp.int32),
        n_accepted=jnp.asarray(0, jnp.int32),
        n_rejected=jnp.asarray(0, jnp.int32),
        buf=buf0,
    )

    def cond(c):
        return c["out_idx"] < T

    def body(c):
        out_t = ts_dev[c["out_idx"]]
        emit = c["curr_t"] >= out_t

        def do_emit(c):
            denom = jnp.where(c["curr_t"] > c["prev_t"],
                              c["curr_t"] - c["prev_t"],
                              jnp.ones_like(c["curr_t"]))
            w = (out_t - c["prev_t"]) / denom
            y_out = jax.tree_util.tree_map(
                lambda a, b: a + (b - a) * w.astype(a.dtype), c["prev_y"], c["curr_y"])
            buf = jax.tree_util.tree_map(
                lambda bufl, yl: bufl.at[c["out_idx"]].set(yl), c["buf"], y_out)
            c = dict(c)
            c["buf"] = buf
            c["out_idx"] = c["out_idx"] + 1
            return c

        def do_step(c):
            t = c["curr_t"]
            next_t = jnp.minimum(t + c["h"], t_end)
            (y_next, extra_next, accept, h_new, prev_ratio,
             prev_ratio_valid) = adaptive_attempt(
                solver, bm, t, next_t, c["curr_y"], c["extra"], c["h"],
                c["prev_ratio"], c["prev_ratio_valid"], rtol, atol, dt_min,
                active=jnp.asarray(True))

            def pick(new, old):
                return jax.tree_util.tree_map(
                    lambda n, o: jnp.where(accept, n, o), new, old)

            c = dict(c)
            c["prev_t"] = jnp.where(accept, t, c["prev_t"])
            c["prev_y"] = pick(c["curr_y"], c["prev_y"])
            c["curr_t"] = jnp.where(accept, next_t, c["curr_t"])
            c["curr_y"] = pick(y_next, c["curr_y"])
            c["extra"] = pick(extra_next, c["extra"])
            c["h"] = h_new
            c["prev_ratio"] = prev_ratio
            c["prev_ratio_valid"] = prev_ratio_valid
            c["n_accepted"] = c["n_accepted"] + accept.astype(jnp.int32)
            c["n_rejected"] = c["n_rejected"] + (~accept).astype(jnp.int32)
            return c

        return jax.lax.cond(emit, do_emit, do_step, c)

    final = jax.lax.while_loop(cond, body, init)
    n_attempts = final["n_accepted"] + final["n_rejected"]
    stats = dict(n_accepted=final["n_accepted"], n_rejected=final["n_rejected"],
                 nfe=3 * solver.nfe_per_step * n_attempts,
                 incomplete=jnp.asarray(False))
    return final["buf"], final["extra"], stats


def integrate_adaptive_scan(solver, y0, extra0, ts, bm, dt0, rtol, atol, dt_min,
                            max_steps, time_dtype=None):
    """Reverse-mode-differentiable adaptive solve: a bounded ``lax.scan``.

    Semantically identical to :func:`integrate_adaptive` (same error estimate,
    PI controller, accept/reject and interpolation arithmetic, in the same
    order) but runs exactly ``max_steps`` masked iterations of a ``lax.scan``
    instead of a dynamic ``lax.while_loop``, so ``jax.grad`` works — the
    reference gets this for free because its hot loop is plain Python under
    autograd (/root/reference/torchsde/_core/base_solver.py:92-149).

    If the budget is exhausted before the final output time is reached, the
    unreached output slots hold NaN (loud, not silently wrong) and
    ``stats['incomplete']`` is True; raise ``max_steps``.

    Memory: O(max_steps) residuals for the backward pass — the same cost
    profile as the reference's backprop-through-solver. Use ``sdeint_adjoint``
    for O(1)-memory gradients.
    """
    if time_dtype is None:
        time_dtype = jnp.result_type(*jax.tree_util.tree_leaves(y0))
    ts_host = np.asarray(ts, np.float64)
    ts_dev = jnp.asarray(ts_host, time_dtype)
    t_end = jnp.asarray(ts_host[-1], time_dtype)
    T = len(ts_host)

    def buf_init(leaf):
        buf = jnp.full((T,) + leaf.shape,
                       jnp.nan if jnp.issubdtype(leaf.dtype, jnp.inexact) else 0,
                       leaf.dtype)
        return buf.at[0].set(leaf)

    init = dict(
        curr_t=jnp.asarray(ts_host[0], time_dtype),
        prev_t=jnp.asarray(ts_host[0], time_dtype),
        curr_y=y0, prev_y=y0, extra=extra0,
        h=jnp.asarray(float(dt0), time_dtype),
        prev_ratio=jnp.asarray(1.0, time_dtype),
        prev_ratio_valid=jnp.asarray(False),
        out_idx=jnp.asarray(1, jnp.int32),
        n_accepted=jnp.asarray(0, jnp.int32),
        n_rejected=jnp.asarray(0, jnp.int32),
        buf=jax.tree_util.tree_map(buf_init, y0),
    )

    def tree_where(pred, new, old):
        return jax.tree_util.tree_map(
            lambda n, o: jnp.where(pred, n, o), new, old)

    def body(c, _):
        active = c["out_idx"] < T
        safe_idx = jnp.minimum(c["out_idx"], T - 1)
        out_t = ts_dev[safe_idx]
        emit = jnp.logical_and(active, c["curr_t"] >= out_t)
        step_mode = jnp.logical_and(active, ~emit)

        # ---- emit branch (cheap; value-level no-op unless `emit`) ----
        denom = jnp.where(c["curr_t"] > c["prev_t"],
                          c["curr_t"] - c["prev_t"],
                          jnp.ones_like(c["curr_t"]))
        w = (out_t - c["prev_t"]) / denom
        y_out = jax.tree_util.tree_map(
            lambda a, b: a + (b - a) * w.astype(a.dtype), c["prev_y"], c["curr_y"])
        buf = jax.tree_util.tree_map(
            lambda bufl, yl: bufl.at[safe_idx].set(
                jnp.where(emit, yl, bufl[safe_idx])),
            c["buf"], y_out)
        out_idx = c["out_idx"] + emit.astype(jnp.int32)

        # ---- step branch (expensive; masked via where) ----
        t = c["curr_t"]
        # Clamp to t_end only when actually stepping: masked iterations keep
        # dt = h > 0 so no 1/dt NaNs leak into reverse-mode gradients.
        next_t = jnp.where(step_mode, jnp.minimum(t + c["h"], t_end), t + c["h"])
        (y_next, extra_next, accept, h_new, prev_ratio,
         prev_ratio_valid) = adaptive_attempt(
            solver, bm, t, next_t, c["curr_y"], c["extra"], c["h"],
            c["prev_ratio"], c["prev_ratio_valid"], rtol, atol, dt_min,
            active=step_mode)

        c_new = dict(c)
        c_new["buf"] = buf
        c_new["out_idx"] = out_idx
        c_new["prev_t"] = jnp.where(accept, t, c["prev_t"])
        c_new["prev_y"] = tree_where(accept, c["curr_y"], c["prev_y"])
        c_new["curr_t"] = jnp.where(accept, next_t, c["curr_t"])
        c_new["curr_y"] = tree_where(accept, y_next, c["curr_y"])
        c_new["extra"] = tree_where(accept, extra_next, c["extra"])
        c_new["h"] = jnp.where(step_mode, h_new, c["h"])
        c_new["prev_ratio"] = jnp.where(step_mode, prev_ratio, c["prev_ratio"])
        c_new["prev_ratio_valid"] = jnp.where(step_mode, prev_ratio_valid,
                                              c["prev_ratio_valid"])
        c_new["n_accepted"] = c["n_accepted"] + accept.astype(jnp.int32)
        c_new["n_rejected"] = (c["n_rejected"]
                               + jnp.logical_and(step_mode, ~accept).astype(jnp.int32))
        return c_new, None

    final, _ = jax.lax.scan(body, init, None, length=max_steps)
    n_attempts = final["n_accepted"] + final["n_rejected"]
    stats = dict(n_accepted=final["n_accepted"], n_rejected=final["n_rejected"],
                 nfe=3 * solver.nfe_per_step * n_attempts,
                 incomplete=final["out_idx"] < T)
    return final["buf"], final["extra"], stats


# --------------------------------------------------------------------------- #
#  Differentiable adaptive entry point                                         #
# --------------------------------------------------------------------------- #


@dataclasses.dataclass(frozen=True)
class AdaptiveCfg:
    """Hashable static config for :func:`adaptive_solve` (a custom_vjp
    nondiff argument)."""
    solver_cls: type
    ts: tuple
    dt0: float
    rtol: float
    atol: float
    dt_min: float
    max_steps: int
    options: tuple  # sorted (key, value) items

    def make_solver(self, sde):
        return self.solver_cls(sde=sde, bm=None, dt=self.dt0, adaptive=True,
                               rtol=self.rtol, atol=self.atol,
                               dt_min=self.dt_min, options=dict(self.options))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def adaptive_solve(cfg, sde, bm, y0, extra0):
    """Adaptive solve that is fast when not differentiated and correct when it
    is: the primal runs the ``lax.while_loop`` integrator (dynamic step count,
    no wasted iterations); under ``jax.grad``/``jax.vjp`` the forward pass is
    re-traced as the bounded masked ``lax.scan`` (identical arithmetic), whose
    reverse-mode transpose is plain backprop-through-the-solver — matching the
    reference's autograd semantics for ``sdeint(adaptive=True)``."""
    solver = cfg.make_solver(sde)
    return integrate_adaptive(solver, y0, extra0, np.asarray(cfg.ts), bm,
                              cfg.dt0, cfg.rtol, cfg.atol, cfg.dt_min)


def _adaptive_solve_fwd(cfg, sde, bm, y0, extra0):
    def run(sde, bm, y0, extra0):
        solver = cfg.make_solver(sde)
        return integrate_adaptive_scan(solver, y0, extra0, np.asarray(cfg.ts),
                                       bm, cfg.dt0, cfg.rtol, cfg.atol,
                                       cfg.dt_min, cfg.max_steps)

    return jax.vjp(run, sde, bm, y0, extra0)


def _adaptive_solve_bwd(cfg, vjp_fn, ct):
    return vjp_fn(ct)


adaptive_solve.defvjp(_adaptive_solve_fwd, _adaptive_solve_bwd)
