"""Fused whole-solve SRK (srid2, diagonal noise) Pallas kernel.

SURVEY.md §7.2 step 8 / VERDICT r1 item 7: fuse the 4-stage Rößler srid2
tableau arithmetic (reference /root/reference/torchsde/_core/methods/srk.py:57-88)
into one kernel and measure against the XLA ``lax.scan`` path.

Design (TPU-first, not a per-step fusion):

* the ENTIRE fixed-step solve runs in ONE ``pallas_call``. Grid =
  ``(batch_tiles, n_steps)`` with the step dimension innermost — TPU grids
  execute sequentially, so the state block ``out_ref`` acts as a VMEM-resident
  accumulator that is initialised at step 0 and revisited (never re-DMA'd)
  for all subsequent steps of the same batch tile;
* per-step Brownian increments ``(W, U)`` live in HBM as ``(N, B, D)`` arrays
  and are streamed into VMEM one ``(tile_b, D)`` block per grid step — the
  Pallas pipeline double-buffers these DMAs behind the stage arithmetic
  automatically;
* drift/diffusion are Python callables traced *into* the kernel, so any
  elementwise (diagonal-noise) SDE works; stage arithmetic is a fully
  unrolled elementwise chain on the VPU with zero per-step dispatch overhead.

This removes the two costs the XLA scan path still pays per step: scan
iteration overhead (buffer rotation, loop bookkeeping) and HBM round-trips of
the carried state. Use ``benchmarks/srk_fused.py`` to reproduce the
measurements recorded in BENCH_NOTES.md.
"""

import functools
import math

import jax
import jax.numpy as jnp

from ..core import tableaus

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False


def _srid2_step(f, g, t, dt, y0, I_k, I_k0, dtype):
    """One srid2 step, identical math to solvers.SRK._diagonal_or_scalar_step
    (reference srk.py:57-88) with the diffusion kept 2-D (diagonal)."""
    tab = tableaus.SRID2
    rdt = 1.0 / dt
    sqrt_dt = math.sqrt(dt)
    I_kk = (I_k * I_k - dt) * 0.5
    I_kkk = (I_k * I_k * I_k - 3.0 * dt * I_k) * (1.0 / 6.0)

    y1 = y0
    H0, H1 = [], []
    for s in range(tab.STAGES):
        H0s, H1s = y0, y0
        for j in range(s):
            fj = f(t + tab.C0[j] * dt, H0[j])
            gj = g(t + tab.C1[j] * dt, H1[j])
            if tab.A0[s][j] != 0.0:
                H0s = H0s + tab.A0[s][j] * fj * dt
            if tab.B0[s][j] != 0.0:
                H0s = H0s + tab.B0[s][j] * gj * I_k0 * rdt
            if tab.A1[s][j] != 0.0:
                H1s = H1s + tab.A1[s][j] * fj * dt
            if tab.B1[s][j] != 0.0:
                H1s = H1s + tab.B1[s][j] * gj * sqrt_dt
        H0.append(H0s)
        H1.append(H1s)

        fs = f(t + tab.C0[s] * dt, H0s)
        g_weight = (tab.beta1[s] * I_k
                    + tab.beta2[s] * I_kk * (1.0 / sqrt_dt)
                    + tab.beta3[s] * I_k0 * rdt
                    + tab.beta4[s] * I_kkk * rdt)
        y1 = y1 + tab.alpha[s] * fs * dt + g(t + tab.C1[s] * dt, H1s) * g_weight
    return y1


def _kernel(y0_ref, W_ref, U_ref, *rest, f, g, t0, dt, dtype, n_params):
    param_refs, out_ref = rest[:n_params], rest[n_params]
    params = tuple(r[0] for r in param_refs)  # (1, D) blocks -> (D,) rows
    fp = lambda t, y: f(t, y, *params)  # noqa: E731
    gp = lambda t, y: g(t, y, *params)  # noqa: E731
    n = pl.program_id(1)

    @pl.when(n == 0)
    def _():
        out_ref[:] = y0_ref[:]

    y = out_ref[:]
    # Reconstruct t at >= f32 index precision, then round once to the state
    # dtype: n.astype(bfloat16) would corrupt the step index itself past
    # n=256 (8 mantissa bits), biasing every stage time by up to a full dt.
    tdtype = jnp.promote_types(dtype, jnp.float32)
    t = (t0 + n.astype(tdtype) * dt).astype(dtype)
    out_ref[:] = _srid2_step(fp, gp, t, dt, y, W_ref[0], U_ref[0], dtype)


def srk_solve_fused(f, g, y0, t0, dt, n_steps, W, U, params=(), tile_b=None,
                    interpret=False):
    """Solve ``n_steps`` srid2 steps of a diagonal-noise SDE in one fused
    Pallas kernel.

    Args:
        f, g: elementwise drift/diffusion callables
            ``(t, y, *params) -> (B, D)``, traced into the kernel (jnp ops
            only; array-valued coefficients go through ``params``).
        y0: ``(B, D)`` initial state.
        t0, dt, n_steps: fixed step grid ``t0 + k*dt``.
        W, U: ``(n_steps, B, D)`` per-step Brownian increment / space-time
            Levy integral (from ``integrate.sample_grid_noise`` or
            ``BrownianInterval.query_grid``).
        tile_b: batch tile; defaults to the largest divisor of B ≤ 512.
    Returns:
        ``(B, D)`` final state (bitwise-comparable to the XLA scan path up to
        fused-arithmetic reassociation).
    """
    if not _HAVE_PALLAS and not interpret:
        raise RuntimeError("Pallas unavailable; pass interpret=True.")
    B, D = y0.shape
    orig_shape = y0.shape
    dtype = y0.dtype
    n_steps = int(n_steps)

    # Lane packing: VMEM blocks pad the last dim to 128 lanes, so a (tile, 8)
    # state block wastes 15/16 of both VMEM and VPU lanes. For elementwise
    # (diagonal) dynamics the layout is irrelevant, so fold the state dim into
    # full 128-wide rows: (B, D) -> (B*D/128, 128), with the (D,) parameters
    # tiled to a (128,) row. Requires f/g elementwise with params broadcast
    # along batch (true for all diagonal-noise SDEs this kernel targets).
    pack = D < 128 and 128 % D == 0 and (B * D) % 128 == 0
    if pack:
        rep = 128 // D
        B_p, D_p = (B * D) // 128, 128
        y0 = y0.reshape(B_p, D_p)
        W = W.reshape(n_steps, B_p, D_p)
        U = U.reshape(n_steps, B_p, D_p)
        params = tuple(jnp.tile(jnp.asarray(p, dtype).reshape(1, D), (1, rep))
                       for p in params)
        B, D = B_p, D_p
    else:
        params = tuple(jnp.asarray(p, dtype).reshape(1, D) for p in params)

    if tile_b is None:
        # Keep each streamed noise block ~64K elements (256 KB f32): small
        # enough that the W/U double buffers and the unrolled stage
        # temporaries fit in VMEM, large enough that per-grid-step overhead
        # doesn't dominate at big batch sizes.
        target = max(64, 65536 // max(D, 1))
        tile_b = next(t for t in (16384, 8192, 4096, 2048, 1024, 512, 256,
                                  128, 64, 32, 16, 8, 4, 2, 1)
                      if t <= target and B % t == 0)
        tile_b = min(tile_b, B)
    assert B % tile_b == 0
    kernel = functools.partial(_kernel, f=f, g=g, t0=float(t0), dt=float(dt),
                               dtype=dtype, n_params=len(params))
    grid = (B // tile_b, int(n_steps))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, D), lambda b, n: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_b, D), lambda b, n: (n, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_b, D), lambda b, n: (n, b, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec((1, D), lambda b, n: (0, 0),
                          memory_space=pltpu.VMEM)] * len(params),
        out_specs=pl.BlockSpec((tile_b, D), lambda b, n: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D), dtype),
        interpret=interpret,
    )(y0, W, U, *params)
    return out.reshape(orig_shape)


def srk_solve_xla(f, g, y0, t0, dt, n_steps, W, U, params=()):
    """The XLA baseline: identical srid2 math under ``lax.scan`` (what the
    framework's integrate_fixed runs for method='srk')."""
    dtype = y0.dtype
    params = tuple(jnp.asarray(p, dtype) for p in params)
    fp = lambda t, y: f(t, y, *params)  # noqa: E731
    gp = lambda t, y: g(t, y, *params)  # noqa: E731

    def body(y, x):
        n, Wk, Uk = x
        # Same index-precision guard as the fused kernel: bf16 cannot
        # represent step indices past 256.
        tdtype = jnp.promote_types(dtype, jnp.float32)
        t = (t0 + n.astype(tdtype) * dt).astype(dtype)
        y1 = _srid2_step(fp, gp, t, float(dt), y, Wk, Uk, dtype)
        return y1, None

    ns = jnp.arange(n_steps, dtype=jnp.int32)
    y_final, _ = jax.lax.scan(body, y0, (ns, W, U))
    return y_final
