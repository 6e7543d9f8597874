"""Fused whole-solve kernels for the SDE-GAN workload.

Two solve types dominate the GAN step (models/sde_gan.py; reference
examples/sde_gan.py:129-130, 183-185), both reversible-Heun at dt=1 with
tiny per-step matmuls ((B,17)@(17,16)) — pure sequential latency for XLA.
Each runs here as ONE `pallas_call` forward and ONE hand-derived-backward
`pallas_call`, with state and all tower weights VMEM-resident across all
steps:

* **generator**: Stratonovich general-noise SDE, fused ``f_and_g`` towers
  (drift ``(1+S, M, S)`` lipswish/tanh, diffusion ``(1+S, M, S*m)``);
* **critic CDE**: drift-only ``dh = F(t,h) X'(t) dt`` with per-eval control
  slopes streamed in.

Reversible Heun (core/solvers.py:ReversibleHeun; reference
reversible_heun.py:48-73), carry ``(y, f, g, z)``:

    z1 = 2 y0 - z0 + dt f0 + g0·dW
    (f1, g1) = towers(t1, z1)
    y1 = y0 + dt/2 (f0 + f1) + (g0 + g1)·(dW/2)

The hand-derived reverse recurrence carries cotangents ``(ay, az, af, ag)``
for the four carry variables; per reverse step the towers are recomputed at
the streamed ``z_{n+1}`` (activations never stored) and their VJP feeds
``Az = az + dz``, after which::

    ay ← ay + 2 Az (+ injected output cotangent)
    az ← -Az
    af ← dt/2 ay + dt Az
    ag ← outer(ay, dW/2) + outer(Az, dW)

The custom-VJP boundary takes the *initial tower evaluations* ``(f0, g0)``
as explicit inputs, so the step-0 tower eval runs (and differentiates) as
ordinary XLA outside the kernel; the kernel returns ``(dx0, df0, dg0)``.
All (B,S,m)-shaped contractions are spelled as matmuls with constant 0/1
tile/sum matrices so Mosaic sees only dots and elementwise ops.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ._pallas_common import (LANE as _LANE, cparams as _cparams,
                             pad1 as _pad1, pad2 as _pad2, pl, pltpu)

# Tests flip this to run the kernels through the Pallas interpreter on CPU.
_INTERPRET = False


def _tile_mats(s, m):
    """Constant 0/1 matrices turning (B,s,m) contractions into matmuls, for
    row-major flattening g[b, i*m+j] == g3[b, i, j]:

    * ``T`` (m, s*m): ``v @ T`` tiles an (B,m) vector across i.
    * ``S`` (s*m, s): ``x @ S`` sums over j for each i.
    * ``E`` (s, s*m): ``v @ E`` expands an (B,s) vector across j.
    ``Tt = T.T`` sums over i for each j.
    """
    T = np.zeros((m, s * m), np.float32)
    S = np.zeros((s * m, s), np.float32)
    E = np.zeros((s, s * m), np.float32)
    for i in range(s):
        for j in range(m):
            T[j, i * m + j] = 1.0
            S[i * m + j, i] = 1.0
            E[i, i * m + j] = 1.0
    return (jnp.asarray(T), jnp.asarray(S), jnp.asarray(E),
            jnp.asarray(T.T.copy()))


def _pack_mlp2(mlp):
    """Pack a 2-Linear LipMLP (lipswish hidden, tanh output) into padded
    (128,128)/(1,128) buffers. Differentiable (jnp.pad)."""
    if len(mlp.layers) != 2:
        raise ValueError("fused GAN kernels support num_layers=1 "
                         f"(2 Linear layers per tower), got {len(mlp.layers)}")
    if not mlp.tanh:
        raise ValueError("fused GAN kernels expect tanh towers")
    l0, l1 = mlp.layers
    if max(l0.w.shape + l1.w.shape) > _LANE:
        raise ValueError(f"tower dims must be <= {_LANE}")
    return (_pad2(l0.w), _pad1(l0.b), _pad2(l1.w), _pad1(l1.b))


def _tower_fwd(x_pad, W1, b1, W2, b2):
    """x_pad: (B,128) zero-padded input. Returns (out, pre1, a1): padded
    columns stay exactly zero (zero-padded weights, lipswish(0)=0,
    tanh(0)=0).

    Mixed precision (same scheme as latent_fused._forward_core): matmul
    INPUTS are cast to the weights' dtype (bf16 weights drive the MXU's bf16
    path), accumulation and all pointwise math stay float32
    (``preferred_element_type``). With f32 weights every cast is a no-op."""
    cdt = W1.dtype
    pre1 = jnp.dot(x_pad.astype(cdt), W1,
                   preferred_element_type=jnp.float32) \
        + b1.astype(jnp.float32)
    a1 = 0.909 * pre1 * jax.nn.sigmoid(pre1)
    out = jnp.tanh(
        jnp.dot(a1.astype(cdt), W2, preferred_element_type=jnp.float32)
        + b2.astype(jnp.float32))
    return out, pre1, a1


def _tower_bwd(dout, out, pre1, a1, x_pad, W1, W2, acc):
    """VJP of _tower_fwd. ``acc`` = (dW1, db1, dW2, db2) refs to accumulate
    into (always float32 — step-count += in bf16 would truncate badly; the
    wrapper casts back to the weights' dtype at the custom_vjp boundary).
    Returns the input cotangent (B,128) in float32."""
    cdt = W1.dtype
    dpre2 = dout * (1.0 - out * out)
    acc[2][...] += jnp.dot(a1.astype(cdt).T, dpre2.astype(cdt),
                           preferred_element_type=jnp.float32)
    acc[3][...] += jnp.sum(dpre2, axis=0, keepdims=True)
    da1 = jnp.dot(dpre2.astype(cdt), W2.T,
                  preferred_element_type=jnp.float32)
    sig = jax.nn.sigmoid(pre1)
    dpre1 = da1 * (0.909 * (sig + pre1 * sig * (1.0 - sig)))
    acc[0][...] += jnp.dot(x_pad.astype(cdt).T, dpre1.astype(cdt),
                           preferred_element_type=jnp.float32)
    acc[1][...] += jnp.sum(dpre1, axis=0, keepdims=True)
    return jnp.dot(dpre1.astype(cdt), W1.T,
                   preferred_element_type=jnp.float32)


def _tpad(t, B, dtype):
    return jnp.full((B, 1), t, dtype)


def _zcols(B, n, dtype):
    return jnp.zeros((B, n), dtype)


# =========================================================================== #
#  Generator: reversible Heun, general noise                                  #
# =========================================================================== #

_GEN_WNAMES = ("W1f", "b1f", "W2f", "b2f", "W1g", "b1g", "W2g", "b2g")


def pack_gen_weights(func):
    """Pack a GeneratorFunc's drift/diffusion LipMLPs (models/sde_gan.py)."""
    W1f, b1f, W2f, b2f = _pack_mlp2(func.drift)
    W1g, b1g, W2g, b2g = _pack_mlp2(func.diffusion)
    return dict(W1f=W1f, b1f=b1f, W2f=W2f, b2f=b2f,
                W1g=W1g, b1g=b1g, W2g=W2g, b2g=b2g)


def _gen_fwd_kernel(x0_ref, f0_ref, g0_ref, noise_ref, t1s_ref, dts_ref,
                    *rest, S, M_noise):
    w = {k: r[...] for k, r in zip(_GEN_WNAMES, rest[:8])}
    Tm_ref, Sm_ref = rest[8], rest[9]
    ys_ref, zs_ref, gs_ref, x_s, z_s, f_s, g_s = rest[10:]
    n = pl.program_id(0)

    @pl.when(n == 0)
    def _():
        x_s[...] = x0_ref[...]
        z_s[...] = x0_ref[...]
        f_s[...] = f0_ref[...]
        g_s[...] = g0_ref[...]

    B = x_s.shape[0]
    dt = dts_ref[n, 0]
    t1 = t1s_ref[n, 0]
    # Noise streams in the weights' dtype (halved HBM traffic in bf16 mixed
    # mode, same stream a fully-bf16 XLA solve would draw); state math is
    # the f32 carry dtype.
    dW = noise_ref[0].astype(x_s.dtype)                  # (B, m)
    dWt = jnp.dot(dW, Tm_ref[...],
                  preferred_element_type=jnp.float32)    # (B, S*m)
    Sm = Sm_ref[...]

    x, z, f0, g0 = x_s[...], z_s[...], f_s[...], g_s[...]
    g0dW = jnp.dot(g0 * dWt, Sm, preferred_element_type=jnp.float32)
    z1 = 2.0 * x - z + dt * f0 + g0dW

    zin = jnp.concatenate([_tpad(t1, B, x.dtype), z1,
                           _zcols(B, _LANE - 1 - S, x.dtype)], axis=1)
    f1p, _, _ = _tower_fwd(zin, w["W1f"], w["b1f"], w["W2f"], w["b2f"])
    g1p, _, _ = _tower_fwd(zin, w["W1g"], w["b1g"], w["W2g"], w["b2g"])
    f1 = f1p[:, :S]
    g1 = g1p[:, :S * M_noise]

    gsum_dW = jnp.dot((g0 + g1) * dWt, Sm,
                      preferred_element_type=jnp.float32)
    x1 = x + 0.5 * dt * (f0 + f1) + 0.5 * gsum_dW

    x_s[...] = x1
    z_s[...] = z1
    f_s[...] = f1
    g_s[...] = g1
    ys_ref[0] = x1
    zs_ref[0] = z1
    gs_ref[0] = g1


def _gen_bwd_kernel(zs_ref, noise_ref, ydot_ref, gnext_ref, gcur_ref,
                    t1s_ref, dts_ref, *rest, S, M_noise):
    w = {k: r[...] for k, r in zip(_GEN_WNAMES, rest[:8])}
    Tm_ref, Em_ref, Tt_ref = rest[8], rest[9], rest[10]
    outs = rest[11:]
    dx0_ref, df0_ref, dg0_ref, dnoise_ref = outs[:4]
    dw = list(outs[4:12])
    ay_s, az_s, af_s, ag_s = outs[12:]
    r = pl.program_id(0)
    n_total = pl.num_programs(0)

    @pl.when(r == 0)
    def _():
        ay_s[...] = jnp.zeros_like(ay_s)
        az_s[...] = jnp.zeros_like(az_s)
        af_s[...] = jnp.zeros_like(af_s)
        ag_s[...] = jnp.zeros_like(ag_s)
        for ref in dw:
            ref[...] = jnp.zeros_like(ref)

    B = ay_s.shape[0]
    dt = dts_ref[r, 0]
    t1 = t1s_ref[r, 0]
    dW = noise_ref[0].astype(ay_s.dtype)
    z1 = zs_ref[0]
    g1 = gnext_ref[0]                       # g_{n+1}, from the fwd stream
    g0 = gcur_ref[0]                        # g_n   (g0 input at the last iter)
    dWt = jnp.dot(dW, Tm_ref[...], preferred_element_type=jnp.float32)
    Em, Tt = Em_ref[...], Tt_ref[...]

    ay = ay_s[...] + ydot_ref[0]
    Af = af_s[...] + 0.5 * dt * ay
    ayE = jnp.dot(ay, Em, preferred_element_type=jnp.float32)
    Ag = ag_s[...] + 0.5 * ayE * dWt

    dtype = ay.dtype
    zin = jnp.concatenate([_tpad(t1, B, dtype), z1,
                           _zcols(B, _LANE - 1 - S, dtype)], axis=1)
    fout, fpre1, fa1 = _tower_fwd(zin, w["W1f"], w["b1f"], w["W2f"], w["b2f"])
    gout, gpre1, ga1 = _tower_fwd(zin, w["W1g"], w["b1g"], w["W2g"], w["b2g"])

    dAf = jnp.concatenate([Af, _zcols(B, _LANE - S, dtype)], axis=1)
    dAg = jnp.concatenate([Ag, _zcols(B, _LANE - S * M_noise, dtype)], axis=1)
    din = _tower_bwd(dAf, fout, fpre1, fa1, zin, w["W1f"], w["W2f"], dw[0:4])
    din += _tower_bwd(dAg, gout, gpre1, ga1, zin, w["W1g"], w["W2g"], dw[4:8])
    dz_from = din[:, 1:1 + S]

    Az = az_s[...] + dz_from
    AzE = jnp.dot(Az, Em, preferred_element_type=jnp.float32)
    dnoise_ref[0] = jnp.dot(
        AzE * g0 + 0.5 * ayE * (g0 + g1), Tt,
        preferred_element_type=jnp.float32)[:, :M_noise].astype(
            dnoise_ref.dtype)

    ay_s[...] = ay + 2.0 * Az
    az_s[...] = -Az
    af_s[...] = 0.5 * dt * ay + dt * Az
    ag_s[...] = (0.5 * ayE + AzE) * dWt

    @pl.when(r == n_total - 1)
    def _():
        dx0_ref[...] = ay_s[...] + az_s[...]
        df0_ref[...] = af_s[...]
        dg0_ref[...] = ag_s[...]


def _gen_solve_fwd_impl(weights, x0, f0, g0, noise, t1s, dts, interpret=None):
    interpret = _INTERPRET if interpret is None else interpret
    N, B, m = noise.shape
    S = x0.shape[1]
    Tm, Sm, _, _ = _tile_mats(S, m)
    kernel = functools.partial(_gen_fwd_kernel, S=S, M_noise=m)

    full = lambda d: pl.BlockSpec((B, d), lambda i: (0, 0),       # noqa: E731
                                  memory_space=pltpu.VMEM)
    step = lambda d: pl.BlockSpec((1, B, d), lambda i: (i, 0, 0),  # noqa: E731
                                  memory_space=pltpu.VMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    ys, zs, gs = pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=[full(S), full(S), full(S * m), step(m),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [vmem] * 8 + [vmem, vmem],
        out_specs=[step(S), step(S), step(S * m)],
        out_shape=[jax.ShapeDtypeStruct((N, B, S), x0.dtype),
                   jax.ShapeDtypeStruct((N, B, S), x0.dtype),
                   jax.ShapeDtypeStruct((N, B, S * m), x0.dtype)],
        scratch_shapes=[pltpu.VMEM((B, S), x0.dtype),
                        pltpu.VMEM((B, S), x0.dtype),
                        pltpu.VMEM((B, S), x0.dtype),
                        pltpu.VMEM((B, S * m), x0.dtype)],
        compiler_params=_cparams(),
        interpret=interpret,
    )(x0, f0, g0, noise, t1s.reshape(-1, 1), dts.reshape(-1, 1),
      *[weights[k] for k in _GEN_WNAMES], Tm, Sm)
    return ys, zs, gs


def _gen_solve_bwd_impl(weights, x0, f0, g0, noise, t1s, dts, zs, gs, gy,
                        interpret=None):
    interpret = _INTERPRET if interpret is None else interpret
    N, B, m = noise.shape
    S = x0.shape[1]
    gy = jnp.asarray(gy, x0.dtype)
    Tm, _, Em, Tt = _tile_mats(S, m)
    # gs_all[k] = g_k (flattened); flipped so iteration r sees
    # g_{n+1} = fa[r] and g_n = fa[r+1] for n = N-1-r.
    gs_all = jnp.concatenate([g0[None], gs], axis=0)
    fa = gs_all[::-1]
    flip = lambda a: a[::-1]                              # noqa: E731

    kernel = functools.partial(_gen_bwd_kernel, S=S, M_noise=m)
    full = lambda d: pl.BlockSpec((B, d), lambda i: (0, 0),       # noqa: E731
                                  memory_space=pltpu.VMEM)
    step = lambda d: pl.BlockSpec((1, B, d), lambda i: (i, 0, 0),  # noqa: E731
                                  memory_space=pltpu.VMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    # Weight-gradient accumulators are float32 regardless of the weights'
    # dtype (N steps of += in bf16 would truncate badly); cast back to the
    # primal dtype after the kernel (custom_vjp cotangent-dtype contract).
    wshapes = [jax.ShapeDtypeStruct(weights[k].shape, jnp.float32)
               for k in _GEN_WNAMES]
    out = pl.pallas_call(
        kernel,
        grid=(N,),
        # fa[:-1] block r = fa[r] = g_{n+1}; fa[1:] block r = fa[r+1] = g_n.
        in_specs=[step(S), step(m), step(S), step(S * m), step(S * m),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [vmem] * 8 + [vmem, vmem, vmem],
        out_specs=[full(S), full(S), full(S * m), step(m)]
        + [vmem] * 8,
        out_shape=[jax.ShapeDtypeStruct((B, S), x0.dtype),
                   jax.ShapeDtypeStruct((B, S), x0.dtype),
                   jax.ShapeDtypeStruct((B, S * m), x0.dtype),
                   jax.ShapeDtypeStruct((N, B, m), noise.dtype)] + wshapes,
        scratch_shapes=[pltpu.VMEM((B, S), x0.dtype),
                        pltpu.VMEM((B, S), x0.dtype),
                        pltpu.VMEM((B, S), x0.dtype),
                        pltpu.VMEM((B, S * m), x0.dtype)],
        compiler_params=_cparams(),
        interpret=interpret,
    )(flip(zs), flip(noise), flip(gy), fa[:-1], fa[1:],
      flip(t1s).reshape(-1, 1), flip(dts).reshape(-1, 1),
      *[weights[k] for k in _GEN_WNAMES], Tm, Em, Tt)
    dx0, df0, dg0, dnoise_f = out[0], out[1], out[2], out[3]
    dweights = {k: jnp.asarray(dw, weights[k].dtype)
                for k, dw in zip(_GEN_WNAMES, out[4:12])}
    return dweights, dx0, df0, dg0, flip(dnoise_f)


@jax.custom_vjp
def _gen_solve(weights, x0, f0, g0, noise, t1s, dts):
    ys, _, _ = _gen_solve_fwd_impl(weights, x0, f0, g0, noise, t1s, dts)
    return ys


def _gen_solve_fwd(weights, x0, f0, g0, noise, t1s, dts):
    ys, zs, gs = _gen_solve_fwd_impl(weights, x0, f0, g0, noise, t1s, dts)
    return ys, (weights, x0, f0, g0, noise, t1s, dts, zs, gs)


def _gen_solve_bwd(res, gy):
    weights, x0, f0, g0, noise, t1s, dts, zs, gs = res
    dweights, dx0, df0, dg0, dnoise = _gen_solve_bwd_impl(
        weights, x0, f0, g0, noise, t1s, dts, zs, gs, gy)
    return (dweights, dx0, df0, dg0, dnoise,
            jnp.zeros_like(t1s), jnp.zeros_like(dts))


_gen_solve.defvjp(_gen_solve_fwd, _gen_solve_bwd)


def generator_solve_fused(func, x0, ts, key, dt):
    """Drop-in fused replacement for the Generator's
    ``sdeint(func, x0, ts, method='reversible_heun', dt=dt, key=key)``:
    same noise stream (BrownianInterval-keyed grid sampling,
    core/sdeint.py:155-162), same reversible-Heun algebra, ys on ``ts``.
    Requires the step grid to coincide with ``ts`` (the SDE-GAN setting:
    dt=1.0 on integer knots, reference sde_gan.py:129-130)."""
    from ..core import integrate

    S = x0.shape[1]
    m = func.noise_size
    B = x0.shape[0]
    wdtype = func.drift.layers[0].w.dtype
    # Mixed precision (same scheme as latent_fused): bf16 weights drive the
    # MXU's bf16 path and halve weight/stream HBM traffic, while the solver
    # state carry and every accumulator stay float32.
    sdtype = jnp.float32 if wdtype == jnp.bfloat16 else wdtype
    x0 = jnp.asarray(x0, sdtype)
    ts_np = np.asarray(ts, np.float64)
    grid = integrate.build_step_grid(ts_np[0], ts_np[-1], dt)
    if len(grid) != len(ts_np) or not np.allclose(grid, ts_np, atol=1e-9):
        raise ValueError("fused generator solve requires the dt-grid to "
                         "coincide with ts (dt=1.0 on integer knots)")
    # sdeint's default-bm path samples with the BrownianInterval's _key,
    # which is the key verbatim (brownian/interval.py:128). In bf16 mixed
    # mode the stream is sampled in bf16 — the same stream a fully-bf16 XLA
    # solve would draw (bm dtype follows y0) — and cast up inside the kernel.
    W, _, _ = integrate.sample_grid_noise(key, grid, (B, m), wdtype)

    f0, g0 = func.f_and_g(jnp.asarray(ts_np[0], sdtype), x0)
    f0 = jnp.asarray(f0, sdtype)
    g0flat = jnp.asarray(g0.reshape(B, S * m), sdtype)
    weights = pack_gen_weights(func)
    grid_dev = jnp.asarray(grid, sdtype)
    t1s = grid_dev[1:]
    dts = grid_dev[1:] - grid_dev[:-1]  # f32 subtraction, = integrate_fixed
    ys = _gen_solve(weights, x0, f0, g0flat, W, t1s, dts)
    return jnp.concatenate([x0[None], ys], axis=0)


# =========================================================================== #
#  Critic: drift-only CDE, reversible Heun                                    #
# =========================================================================== #

_CDE_WNAMES = ("W1", "b1", "W2", "b2")


def _cde_fwd_kernel(h0_ref, f0_ref, slopes_ref, t1s_ref, dts_ref,
                    *rest, S, C):
    w = {k: r[...] for k, r in zip(_CDE_WNAMES, rest[:4])}
    Tc_ref, Sc_ref = rest[4], rest[5]
    hs_ref, zs_ref, h_s, z_s, f_s = rest[6:]
    n = pl.program_id(0)

    @pl.when(n == 0)
    def _():
        h_s[...] = h0_ref[...]
        z_s[...] = h0_ref[...]
        f_s[...] = f0_ref[...]

    B = h_s.shape[0]
    dt = dts_ref[n, 0]
    t1 = t1s_ref[n, 0]
    xd = slopes_ref[0].astype(h_s.dtype)                 # (B, C)
    xdt = jnp.dot(xd, Tc_ref[...], preferred_element_type=jnp.float32)

    h, z, f0 = h_s[...], z_s[...], f_s[...]
    z1 = 2.0 * h - z + dt * f0

    zin = jnp.concatenate([_tpad(t1, B, h.dtype), z1,
                           _zcols(B, _LANE - 1 - S, h.dtype)], axis=1)
    Fp, _, _ = _tower_fwd(zin, w["W1"], w["b1"], w["W2"], w["b2"])
    F = Fp[:, :S * C]
    f1 = jnp.dot(F * xdt, Sc_ref[...], preferred_element_type=jnp.float32)

    h1 = h + 0.5 * dt * (f0 + f1)
    h_s[...] = h1
    z_s[...] = z1
    f_s[...] = f1
    hs_ref[0] = h1
    zs_ref[0] = z1


def _cde_bwd_kernel(zs_ref, slopes_ref, hdot_ref, t1s_ref, dts_ref,
                    *rest, S, C):
    w = {k: r[...] for k, r in zip(_CDE_WNAMES, rest[:4])}
    Tc_ref, Ec_ref, Tct_ref = rest[4], rest[5], rest[6]
    outs = rest[7:]
    dh0_ref, df0_ref, dslopes_ref = outs[:3]
    dw = list(outs[3:7])
    ay_s, az_s, af_s = outs[7:]
    r = pl.program_id(0)
    n_total = pl.num_programs(0)

    @pl.when(r == 0)
    def _():
        ay_s[...] = jnp.zeros_like(ay_s)
        az_s[...] = jnp.zeros_like(az_s)
        af_s[...] = jnp.zeros_like(af_s)
        for ref in dw:
            ref[...] = jnp.zeros_like(ref)

    B = ay_s.shape[0]
    dt = dts_ref[r, 0]
    t1 = t1s_ref[r, 0]
    z1 = zs_ref[0]
    xd = slopes_ref[0].astype(ay_s.dtype)
    xdt = jnp.dot(xd, Tc_ref[...], preferred_element_type=jnp.float32)

    ay = ay_s[...] + hdot_ref[0]
    Af = af_s[...] + 0.5 * dt * ay

    dtype = ay.dtype
    zin = jnp.concatenate([_tpad(t1, B, dtype), z1,
                           _zcols(B, _LANE - 1 - S, dtype)], axis=1)
    Fout, pre1, a1 = _tower_fwd(zin, w["W1"], w["b1"], w["W2"], w["b2"])
    F = Fout[:, :S * C]

    # f1 = (F * xdt) @ Sc  =>  dF = (Af @ Ec) * xdt ; dxd = ((Af@Ec)*F) @ Tct
    AfE = jnp.dot(Af, Ec_ref[...], preferred_element_type=jnp.float32)
    dF = AfE * xdt
    dslopes_ref[0] = jnp.dot(
        AfE * F, Tct_ref[...],
        preferred_element_type=jnp.float32)[:, :C].astype(dslopes_ref.dtype)

    dFp = jnp.concatenate([dF, _zcols(B, _LANE - S * C, dtype)], axis=1)
    din = _tower_bwd(dFp, Fout, pre1, a1, zin, w["W1"], w["W2"], dw)
    dz_from = din[:, 1:1 + S]

    Az = az_s[...] + dz_from
    ay_s[...] = ay + 2.0 * Az
    az_s[...] = -Az
    af_s[...] = 0.5 * dt * ay + dt * Az

    @pl.when(r == n_total - 1)
    def _():
        dh0_ref[...] = ay_s[...] + az_s[...]
        df0_ref[...] = af_s[...]


def _cde_solve_fwd_impl(weights, h0, f0, slopes, t1s, dts, interpret=None):
    interpret = _INTERPRET if interpret is None else interpret
    N, B, C = slopes.shape
    S = h0.shape[1]
    Tc, Sc, _, _ = _tile_mats(S, C)
    kernel = functools.partial(_cde_fwd_kernel, S=S, C=C)
    full = lambda d: pl.BlockSpec((B, d), lambda i: (0, 0),       # noqa: E731
                                  memory_space=pltpu.VMEM)
    step = lambda d: pl.BlockSpec((1, B, d), lambda i: (i, 0, 0),  # noqa: E731
                                  memory_space=pltpu.VMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    hs, zs = pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=[full(S), full(S), step(C),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [vmem] * 4 + [vmem, vmem],
        out_specs=[step(S), step(S)],
        out_shape=[jax.ShapeDtypeStruct((N, B, S), h0.dtype),
                   jax.ShapeDtypeStruct((N, B, S), h0.dtype)],
        scratch_shapes=[pltpu.VMEM((B, S), h0.dtype),
                        pltpu.VMEM((B, S), h0.dtype),
                        pltpu.VMEM((B, S), h0.dtype)],
        compiler_params=_cparams(),
        interpret=interpret,
    )(h0, f0, slopes, t1s.reshape(-1, 1), dts.reshape(-1, 1),
      *[weights[k] for k in _CDE_WNAMES], Tc, Sc)
    return hs, zs


def _cde_solve_bwd_impl(weights, h0, f0, slopes, t1s, dts, zs, ghs,
                        interpret=None):
    interpret = _INTERPRET if interpret is None else interpret
    N, B, C = slopes.shape
    S = h0.shape[1]
    ghs = jnp.asarray(ghs, h0.dtype)
    Tc, _, Ec, Tct = _tile_mats(S, C)
    flip = lambda a: a[::-1]                              # noqa: E731
    kernel = functools.partial(_cde_bwd_kernel, S=S, C=C)
    full = lambda d: pl.BlockSpec((B, d), lambda i: (0, 0),       # noqa: E731
                                  memory_space=pltpu.VMEM)
    step = lambda d: pl.BlockSpec((1, B, d), lambda i: (i, 0, 0),  # noqa: E731
                                  memory_space=pltpu.VMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    # f32 weight-gradient accumulators; cast back to the primal dtype after
    # the kernel (custom_vjp cotangent-dtype contract).
    wshapes = [jax.ShapeDtypeStruct(weights[k].shape, jnp.float32)
               for k in _CDE_WNAMES]
    out = pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=[step(S), step(C), step(S),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [vmem] * 4 + [vmem, vmem, vmem],
        out_specs=[full(S), full(S), step(C)] + [vmem] * 4,
        out_shape=[jax.ShapeDtypeStruct((B, S), h0.dtype),
                   jax.ShapeDtypeStruct((B, S), h0.dtype),
                   jax.ShapeDtypeStruct((N, B, C), slopes.dtype)] + wshapes,
        scratch_shapes=[pltpu.VMEM((B, S), h0.dtype),
                        pltpu.VMEM((B, S), h0.dtype),
                        pltpu.VMEM((B, S), h0.dtype)],
        compiler_params=_cparams(),
        interpret=interpret,
    )(flip(zs), flip(slopes), flip(ghs),
      flip(t1s).reshape(-1, 1), flip(dts).reshape(-1, 1),
      *[weights[k] for k in _CDE_WNAMES], Tc, Ec, Tct)
    dh0, df0, dslopes_f = out[0], out[1], out[2]
    dweights = {k: jnp.asarray(dw, weights[k].dtype)
                for k, dw in zip(_CDE_WNAMES, out[3:7])}
    return dweights, dh0, df0, flip(dslopes_f)


@jax.custom_vjp
def _cde_solve(weights, h0, f0, slopes, t1s, dts):
    hs, _ = _cde_solve_fwd_impl(weights, h0, f0, slopes, t1s, dts)
    return hs


def _cde_solve_fwd(weights, h0, f0, slopes, t1s, dts):
    hs, zs = _cde_solve_fwd_impl(weights, h0, f0, slopes, t1s, dts)
    return hs, (weights, h0, f0, slopes, t1s, dts, zs)


def _cde_solve_bwd(res, ghs):
    weights, h0, f0, slopes, t1s, dts, zs = res
    dweights, dh0, df0, dslopes = _cde_solve_bwd_impl(
        weights, h0, f0, slopes, t1s, dts, zs, ghs)
    return (dweights, dh0, df0, dslopes,
            jnp.zeros_like(t1s), jnp.zeros_like(dts))


_cde_solve.defvjp(_cde_solve_fwd, _cde_solve_bwd)


def cde_final_state_fused(func, h0, ts, dt):
    """Fused replacement for the Discriminator's
    ``sdeint(func, h0, ts, method='reversible_heun', dt=dt)[-1]`` where
    ``func`` is a CDEFunc with the control path attached. Drift-only, so the
    (zero-diffusion) noise stream is irrelevant. Returns the final state.

    Requires the control-path knot times to coincide with ``ts`` (the
    Discriminator.scores setting). The knot times are treated as constants:
    gradients flow to the knot *values* (``_path_ys``) but not to
    ``_path_ts`` (whose XLA-path "gradient" through the slope denominators
    is not meaningful training signal anyway — knot times are data
    timestamps/solver configuration)."""
    from ..core import integrate

    S = h0.shape[1]
    wdtype = func.func.layers[0].w.dtype
    # Mixed precision: bf16 weights, f32 state carry (see generator above).
    sdtype = jnp.float32 if wdtype == jnp.bfloat16 else wdtype
    h0 = jnp.asarray(h0, sdtype)
    ts_np = np.asarray(ts, np.float64)
    grid = integrate.build_step_grid(ts_np[0], ts_np[-1], dt)
    if len(grid) != len(ts_np) or not np.allclose(grid, ts_np, atol=1e-9):
        raise ValueError("fused CDE solve requires the dt-grid to coincide "
                         "with ts")
    if (not isinstance(func._path_ts, jax.core.Tracer)
            and (func._path_ts.shape[0] != len(ts_np)
                 or not np.allclose(np.asarray(func._path_ts, np.float64),
                                    ts_np, atol=1e-6))):
        raise ValueError("fused CDE solve requires the control-path knot "
                         "times to coincide with ts")
    N = len(ts_np) - 1
    T = len(ts_np)

    # Per-eval control slopes: the CDE's _x_dot at eval time t_k uses the
    # knot interval searchsorted(ts, t_k, 'right')-1 clipped to T-2
    # (models/sde_gan.py:121-127). Built with differentiable jnp ops so the
    # gather's transpose scatters dslopes back onto the path knots.
    path = jnp.asarray(func._path_ys, sdtype)            # (B, T, C)
    knot_dts = jnp.asarray(np.diff(ts_np), sdtype)       # (T-1,)
    slopes = ((path[:, 1:] - path[:, :-1])
              / knot_dts[None, :, None])                 # (B, T-1, C)
    idx = np.minimum(np.arange(1, N + 1), T - 2)         # evals 1..N
    slopes_eval = jnp.transpose(slopes, (1, 0, 2))[idx]  # (N, B, C)

    f0 = jnp.asarray(func.f(jnp.asarray(ts_np[0], sdtype), h0),
                     sdtype)                             # XLA, differentiable
    weights = dict(zip(_CDE_WNAMES, _pack_mlp2(func.func)))
    grid_dev = jnp.asarray(grid, sdtype)
    t1s = grid_dev[1:]
    dts = grid_dev[1:] - grid_dev[:-1]  # f32 subtraction, = integrate_fixed
    hs = _cde_solve(weights, h0, f0, slopes_eval, t1s, dts)
    return hs[-1]
