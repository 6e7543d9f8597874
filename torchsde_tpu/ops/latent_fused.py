"""Fused whole-solve kernel for the flagship latent-SDE logqp Euler solve.

The XLA scan path runs ~10 small kernels per solver step (two 3-layer drift
towers, per-dimension diffusion nets, logqp channel, state update), each
round-tripping (B, ·) activations through HBM; at the flagship config the
128-step solve is latency-bound at ~23 us/step (BENCH_NOTES §1a). This module
runs the ENTIRE solve — and, separately, its hand-derived backward — as ONE
`pallas_call` each: state and weights stay VMEM-resident across all steps,
per-step context/noise blocks stream HBM→VMEM behind the MXU work, and the
backward accumulates weight gradients in VMEM across all steps.

Specialisation (the flagship architecture, models/latent_sde.py):

* Euler–Maruyama, diagonal noise, logqp channel (SDELogqp semantics:
  ``u = stable_division(f - h, g)``, KL integrand ``0.5|u|^2`` —
  core/base_sde.py:223-249, reference base_sde.py:240-307);
* posterior drift ``f = MLP(concat(z, ctx))`` and prior drift ``h = MLP(z)``,
  both ``(in, H, H, L)`` with softplus; per-dimension diffusion nets
  ``g_l = sigmoid(w2_l^T softplus(z_l w1_l + b1_l) + b2_l)`` evaluated as two
  block-diagonal matmuls;
* requires ``L + C <= 128`` and hidden sizes ``<= 128`` (lane-padded).

All indexing lives in XLA-land: the wrapper pre-gathers per-step context
rows, samples the grid noise exactly like `core/sdeint.py:155-162`, and the
custom-VJP boundary is the raw solve (per-step states out / per-step
cotangents in), so output interpolation and the loss remain ordinary
differentiable XLA ops.
"""

import functools

import jax
import jax.numpy as jnp

from ._pallas_common import (LANE as _LANE, cparams as _cparams,
                             pad1 as _pad1, pad2 as _pad2, pl, pltpu)

_EPS = 1e-7   # stable_division clamp (utils/misc.py:28-36)


def pack_weights(model):
    """Pad/stack the LatentSDE drift and diffusion weights into the kernel's
    merged lane-aligned layout. Differentiable (XLA concat/pad/at-set), so
    gradients w.r.t. the packed weights map straight back onto the model
    pytree (structural-zero positions receive garbage gradient entries that
    the unpack slicing simply never reads).

    Merged layout (one matmul per layer "row" instead of one per tower —
    the kernels are MXU-issue-bound, not FLOP-bound):

    * ``W1all`` (LANE, 2*LANE + L*LANE): layer-1 of the f tower, h tower and
      the block-diagonal per-dimension g nets side by side (all share the
      same input row ``x``);
    * ``W2fh``/``W3fh`` (2*LANE, 2*LANE): block-diagonal f/h layer 2 and 3;
    * ``W2g`` (L*LANE, LANE): the g-net contraction, separate (different
      input slice and a sigmoid, not softplus).
    """
    L = model.latent_size
    # Validate the specialization the kernels hardcode (3-layer softplus
    # towers, sigmoid per-dim g nets): a variant architecture must fail
    # loudly here, not return silently wrong values from the fused path.
    for name, net in (("f_net", model.f_net), ("h_net", model.h_net)):
        if (len(net.layers) != 3 or net.activation != "softplus"
                or net.final_activation is not None):
            raise ValueError(
                f"fused latent solve requires {name} to be a 3-layer "
                f"softplus MLP with no final activation (got "
                f"{len(net.layers)} layers, activation={net.activation!r}, "
                f"final={net.final_activation!r}); use the XLA path")
    fl, hl = model.f_net.layers, model.h_net.layers
    H = fl[0].w.shape[1]
    w1g, b1g, w2g, b2g = model.g_nets      # (L,1,Hg), (L,Hg), (L,Hg,1), (L,1)
    Hg = w1g.shape[2]
    if H > _LANE or Hg > _LANE:
        raise ValueError(f"hidden sizes must be <= {_LANE} (got {H}, {Hg})")

    # Block-diagonal spellings of the per-dimension g nets: z @ W1g is the
    # stack of per-dim outer products; a1g @ W2g is the per-dim contraction.
    W1g = jnp.zeros((_LANE, L * _LANE), w1g.dtype)
    b1gf = jnp.zeros((L * _LANE,), w1g.dtype)
    W2g = jnp.zeros((L * _LANE, _LANE), w1g.dtype)
    for l in range(L):
        W1g = W1g.at[l, l * _LANE:l * _LANE + Hg].set(w1g[l, 0])
        b1gf = b1gf.at[l * _LANE:l * _LANE + Hg].set(b1g[l])
        W2g = W2g.at[l * _LANE:l * _LANE + Hg, l].set(w2g[l, :, 0])
    b2gf = jnp.zeros((_LANE,), w1g.dtype).at[:L].set(b2g[:, 0])

    def blockdiag2(wa, wb):
        out = jnp.zeros((2 * _LANE, 2 * _LANE), wa.dtype)
        out = out.at[:_LANE, :_LANE].set(_pad2(wa, _LANE, _LANE))
        return out.at[_LANE:, _LANE:].set(_pad2(wb, _LANE, _LANE))

    def bias2(ba, bb):
        return jnp.concatenate([_pad1(ba, _LANE), _pad1(bb, _LANE)], axis=1)

    return dict(
        W1all=jnp.concatenate([_pad2(fl[0].w, _LANE, _LANE),
                               _pad2(hl[0].w, _LANE, _LANE), W1g], axis=1),
        b1all=jnp.concatenate([_pad1(fl[0].b, _LANE), _pad1(hl[0].b, _LANE),
                               b1gf.reshape(1, -1)], axis=1),
        W2fh=blockdiag2(fl[1].w, hl[1].w), b2fh=bias2(fl[1].b, hl[1].b),
        W3fh=blockdiag2(fl[2].w, hl[2].w), b3fh=bias2(fl[2].b, hl[2].b),
        W2g=W2g, b2g=b2gf.reshape(1, -1),
    )


_WNAMES = ("W1all", "b1all", "W2fh", "b2fh", "W3fh", "b3fh", "W2g", "b2g")
_FH = 2 * _LANE    # width of the merged f/h lane block


def _forward_core(z, ctx, w, L, C):
    """Shared forward math on VMEM values: returns (f, h, g, u) plus the
    activations the backward needs. 4 matmuls per step (was 8): layer 1 of
    all towers is ONE (B, in) @ (in, 2*LANE + L*LANE) product, f/h layers
    2-3 are block-diagonal pairs.

    Mixed precision: matmul INPUTS are cast to the weights' dtype (bf16
    weights drive the MXU's bf16 path), accumulation and all pointwise math
    stay float32 (``preferred_element_type``); the state carry outside is
    float32 regardless. With f32 weights every cast is a no-op."""
    B = z.shape[0]
    cdt = w["W1all"].dtype
    x = jnp.concatenate(
        [z, ctx.astype(z.dtype),
         jnp.zeros((B, _LANE - L - C), z.dtype)], axis=1)
    # Backward derives softplus'(pre) = sigmoid(pre) = 1 - exp(-softplus(pre))
    # from the ACTIVATIONS alone, so pre-activations are never materialised.
    a1all = jax.nn.softplus(
        jnp.dot(x.astype(cdt), w["W1all"], preferred_element_type=jnp.float32)
        + w["b1all"].astype(jnp.float32))
    a1fh = a1all[:, :_FH]
    a1g = a1all[:, _FH:]
    a2fh = jax.nn.softplus(
        jnp.dot(a1fh.astype(cdt), w["W2fh"],
                preferred_element_type=jnp.float32)
        + w["b2fh"].astype(jnp.float32))
    l3 = jnp.dot(a2fh.astype(cdt), w["W3fh"],
                 preferred_element_type=jnp.float32) \
        + w["b3fh"].astype(jnp.float32)
    f = l3[:, :L]
    h = l3[:, _LANE:_LANE + L]

    gfull = jax.nn.sigmoid(
        jnp.dot(a1g.astype(cdt), w["W2g"],
                preferred_element_type=jnp.float32)
        + w["b2g"].astype(jnp.float32))
    g = gfull[:, :L]

    big = g > _EPS
    gs = jnp.where(big, g, _EPS)
    u = (f - h) / gs
    acts = dict(x=x, a1all=a1all, a2fh=a2fh, gfull=gfull, big=big, gs=gs)
    return f, h, g, u, acts


def _fwd_kernel(z0_ref, ctx_ref, noise_ref, dts_ref, *wrefs, zs_ref, qs_ref,
                z_s, q_s, L, C, S):
    """S solver steps per grid step: amortises the per-grid-step block
    bookkeeping/DMA sync over S steps (the chain is latency-bound, so fixed
    per-iteration overhead is a real slice of the step time)."""
    w = {name: r[...] for name, r in zip(_WNAMES, wrefs)}
    n = pl.program_id(0)

    @pl.when(n == 0)
    def _():
        z_s[...] = z0_ref[...]
        q_s[...] = jnp.zeros_like(q_s)

    for s in range(S):
        z = z_s[...]
        dt = dts_ref[n * S + s, 0]
        f, h, g, u, _ = _forward_core(z, ctx_ref[s], w, L, C)
        q_s[...] = q_s[...] + 0.5 * jnp.sum(u * u, axis=1, keepdims=True) * dt
        z_s[...] = z + f * dt + g * noise_ref[s].astype(z.dtype)
        zs_ref[s] = z_s[...].astype(zs_ref.dtype)
        qs_ref[s] = q_s[...].astype(qs_ref.dtype)


def _backward_core(z, ctx, dW, dt, gz, gq, dz_carry, w, L, C):
    """One reverse solver step on VMEM values, shared by the single- and
    multi-replica backward kernels. Inputs are already in the f32 state
    dtype; returns ``(dz_next, dctx, dnoise, dw)`` where ``dw`` is the dict
    of per-step weight-gradient increments the caller accumulates."""
    f, h, g, u, a = _forward_core(z, ctx, w, L, C)
    gs, big, gfull = a["gs"], a["big"], a["gfull"]
    a1all, a2fh, x = a["a1all"], a["a2fh"], a["x"]
    a1g = a1all[:, _FH:]
    cdt = w["W1all"].dtype           # matmul-input dtype (bf16 in mixed mode)

    # Incoming cotangents: gz for the post-step state, gq for this step's
    # logqp increment (already reverse-accumulated by the wrapper).
    dz = dz_carry + gz
    dnoise = dz * g
    du = gq * u * dt
    df = dz * dt + du / gs
    dh = -du / gs
    # Only the u-path is clamped by stable_division (du/dg = 0 where
    # g <= eps); the state-update term dz*dW is NEVER masked.
    dg = dz * dW - (du * u / gs) * big.astype(z.dtype)

    B = z.shape[0]
    zcols = jnp.zeros((B, _LANE - L), z.dtype)

    def dsoftplus(act):
        # softplus'(pre) = sigmoid(pre) = 1 - exp(-softplus(pre))
        return 1.0 - jnp.exp(-act)

    # f/h towers, merged: dl3 carries [dffull | dhfull] through the two
    # block-diagonal layers in one matmul each. Matmul inputs are cast to the
    # weights' dtype (MXU bf16 path in mixed mode); the dw accumulators
    # are float32 regardless.
    dw = {}
    dl3 = jnp.concatenate([df, zcols, dh, zcols], axis=1)       # (B, 2*LANE)
    dw["W3fh"] = jnp.dot(a2fh.astype(cdt).T, dl3.astype(cdt),
                         preferred_element_type=jnp.float32)
    dw["b3fh"] = jnp.sum(dl3, axis=0, keepdims=True)
    da2fh = jnp.dot(dl3.astype(cdt), w["W3fh"].T,
                    preferred_element_type=jnp.float32)
    dpre2fh = da2fh * dsoftplus(a2fh)
    dw["W2fh"] = jnp.dot(a1all[:, :_FH].astype(cdt).T,
                         dpre2fh.astype(cdt),
                         preferred_element_type=jnp.float32)
    dw["b2fh"] = jnp.sum(dpre2fh, axis=0, keepdims=True)
    da1fh = jnp.dot(dpre2fh.astype(cdt), w["W2fh"].T,
                    preferred_element_type=jnp.float32)

    # g net (sigmoid output)
    dgfull = jnp.concatenate([dg, zcols], axis=1)
    dpre2g = dgfull * gfull * (1.0 - gfull)
    dw["W2g"] = jnp.dot(a1g.astype(cdt).T, dpre2g.astype(cdt),
                        preferred_element_type=jnp.float32)
    dw["b2g"] = jnp.sum(dpre2g, axis=0, keepdims=True)
    da1g = jnp.dot(dpre2g.astype(cdt), w["W2g"].T,
                   preferred_element_type=jnp.float32)

    # merged layer 1
    da1all = jnp.concatenate([da1fh, da1g], axis=1)
    dpre1all = da1all * dsoftplus(a1all)
    dw["W1all"] = jnp.dot(x.astype(cdt).T, dpre1all.astype(cdt),
                          preferred_element_type=jnp.float32)
    dw["b1all"] = jnp.sum(dpre1all, axis=0, keepdims=True)
    dx = jnp.dot(dpre1all.astype(cdt), w["W1all"].T,
                 preferred_element_type=jnp.float32)

    return dz + dx[:, :L], dx[:, L:L + C], dnoise, dw


def _bwd_kernel(z_pre_ref, ctx_ref, noise_ref, dts_ref, gz_ref, gq_ref,
                *wrefs, dz0_ref, dctx_ref, dnoise_ref, dw_refs, dz_s, L, C,
                S):
    w = {name: r[...] for name, r in zip(_WNAMES, wrefs)}
    r_ = pl.program_id(0)
    n_total = pl.num_programs(0)

    @pl.when(r_ == 0)
    def _():
        dz_s[...] = jnp.zeros_like(dz_s)
        for dref in dw_refs.values():
            dref[...] = jnp.zeros_like(dref)

    # Inputs arrive flipped, so s walks reverse solver time within the block.
    for s in range(S):
        z = z_pre_ref[s].astype(dz_s.dtype)
        dz_next, dctx, dnoise, dw = _backward_core(
            z, ctx_ref[s], noise_ref[s].astype(z.dtype),
            dts_ref[r_ * S + s, 0], gz_ref[s].astype(z.dtype),
            gq_ref[s].astype(z.dtype), dz_s[...], w, L, C)
        dz_s[...] = dz_next
        dctx_ref[s] = dctx.astype(dctx_ref.dtype)
        dnoise_ref[s] = dnoise.astype(dnoise_ref.dtype)
        for name in _WNAMES:
            dw_refs[name][...] += dw[name]

    @pl.when(r_ == n_total - 1)
    def _():
        dz0_ref[...] = dz_s[...]


# Tests flip this to run the kernels through the Pallas interpreter on CPU.
_INTERPRET = False

# Solver steps per kernel grid step (None = 1). Measured on v5e at the
# flagship config: S makes no difference (S=1: 145.2, S=2: 146.1, S=4:
# 136.2, S=8: 142.8 train steps/s) — Mosaic already pipelines the
# per-grid-step block bookkeeping behind the compute, so the chain is bound
# by the dependent matmul/VPU work itself. Kept as a knob for A/B sweeps.
_STEPS_PER_BLOCK = None


def _pick_steps_per_block(n, override=None):
    s = _STEPS_PER_BLOCK if override is None else override
    if s is None:
        return 1
    if n % s:
        raise ValueError(f"steps_per_block {s} must divide n={n}")
    return s


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _fused_solve(weights, z0, ctx_steps, noise, dts):
    zs, qs = _fused_solve_fwd_impl(weights, z0, ctx_steps, noise, dts)
    return zs, qs


def _fused_solve_fwd_impl(weights, z0, ctx_steps, noise, dts, interpret=None,
                          steps_per_block=None):
    interpret = _INTERPRET if interpret is None else interpret
    n, B, C = ctx_steps.shape
    L = z0.shape[1]
    S = _pick_steps_per_block(n, steps_per_block)
    kernel = functools.partial(_fwd_kernel, L=L, C=C, S=S)

    def kern(z0_ref, ctx_ref, noise_ref, dts_ref, *rest):
        wrefs = rest[:len(_WNAMES)]
        zs_ref, qs_ref, z_s, q_s = rest[len(_WNAMES):]
        kernel(z0_ref, ctx_ref, noise_ref, dts_ref, *wrefs,
               zs_ref=zs_ref, qs_ref=qs_ref, z_s=z_s, q_s=q_s)

    zs, qs = pl.pallas_call(
        kern,
        grid=(n // S,),
        in_specs=[
            pl.BlockSpec((B, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, B, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, B, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(_WNAMES),
        out_specs=[
            pl.BlockSpec((S, B, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, B, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            # zs streams in the weights' dtype (halved HBM traffic in bf16
            # mixed mode); the running KL sum qs stays in the f32 state dtype.
            jax.ShapeDtypeStruct((n, B, L), weights["W1all"].dtype),
            jax.ShapeDtypeStruct((n, B, 1), z0.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, L), z0.dtype),
            pltpu.VMEM((B, 1), z0.dtype),
        ],
        compiler_params=_cparams(),
        interpret=interpret,
    )(z0, ctx_steps, noise, dts.reshape(-1, 1),
      *[weights[k] for k in _WNAMES])
    return zs, qs


def _fused_solve_fwd(weights, z0, ctx_steps, noise, dts):
    zs, qs = _fused_solve_fwd_impl(weights, z0, ctx_steps, noise, dts)
    return (zs, qs), (weights, z0, ctx_steps, noise, dts, zs)


def _fused_solve_bwd_impl(weights, z0, ctx_steps, noise, dts, zs, gz, gq,
                          interpret=None, steps_per_block=None):
    interpret = _INTERPRET if interpret is None else interpret
    n, B, C = ctx_steps.shape
    L = z0.shape[1]
    S = _pick_steps_per_block(n, steps_per_block)
    wdt = weights["W1all"].dtype
    # Cotangents may be weak/promoted dtypes (e.g. f64 under jax_enable_x64);
    # the kernel's refs are in the stream dtype (gz) / state dtype (gq).
    gz = jnp.asarray(gz, wdt)
    gq = jnp.asarray(gq, z0.dtype)
    # Pre-step states in the f32 state dtype, reverse-accumulated logqp
    # cotangents, flipped streams.
    z_pre = jnp.concatenate([z0[None], jnp.asarray(zs[:-1], z0.dtype)], axis=0)
    ginc = jnp.cumsum(gq[::-1], axis=0)[::-1]          # (n, B, 1)
    flip = lambda a: a[::-1]                           # noqa: E731

    kernel = functools.partial(_bwd_kernel, L=L, C=C, S=S)

    n_w = len(_WNAMES)

    def kern(*refs):
        (z_pre_ref, ctx_ref, noise_ref, dts_ref, gz_ref, gq_ref) = refs[:6]
        wrefs = refs[6:6 + n_w]
        outs = refs[6 + n_w:]
        dz0_ref, dctx_ref, dnoise_ref = outs[0], outs[1], outs[2]
        dw_refs = dict(zip(_WNAMES, outs[3:3 + n_w]))
        dz_s = outs[3 + n_w]
        kernel(z_pre_ref, ctx_ref, noise_ref, dts_ref, gz_ref, gq_ref,
               *wrefs, dz0_ref=dz0_ref, dctx_ref=dctx_ref,
               dnoise_ref=dnoise_ref, dw_refs=dw_refs, dz_s=dz_s)

    step_spec = lambda d: pl.BlockSpec((S, B, d), lambda i: (i, 0, 0),  # noqa: E731
                                       memory_space=pltpu.VMEM)
    # Weight-gradient accumulators are float32 regardless of the weights'
    # dtype: 128 steps of += in bf16 would truncate badly. Cast back to the
    # primal dtype after the kernel (custom_vjp cotangent-dtype contract).
    dw_shapes = [jax.ShapeDtypeStruct(weights[k].shape, jnp.float32)
                 for k in _WNAMES]
    out = pl.pallas_call(
        kern,
        grid=(n // S,),
        in_specs=[
            step_spec(L),                                   # z_pre (flipped)
            step_spec(C),                                   # ctx (flipped)
            step_spec(L),                                   # noise (flipped)
            pl.BlockSpec(memory_space=pltpu.SMEM),
            step_spec(L),                                   # gz (flipped)
            step_spec(1),                                   # ginc (flipped)
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_w,
        out_specs=[
            pl.BlockSpec((B, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            step_spec(C),                                   # dctx (flipped)
            step_spec(L),                                   # dnoise (flipped)
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_w,
        out_shape=[
            jax.ShapeDtypeStruct((B, L), z0.dtype),
            jax.ShapeDtypeStruct((n, B, C), ctx_steps.dtype),
            jax.ShapeDtypeStruct((n, B, L), noise.dtype),
        ] + dw_shapes,
        scratch_shapes=[pltpu.VMEM((B, L), z0.dtype)],
        compiler_params=_cparams(),
        interpret=interpret,
    )(flip(z_pre), flip(ctx_steps), flip(noise), flip(dts).reshape(-1, 1),
      flip(gz), flip(ginc), *[weights[k] for k in _WNAMES])

    dz0, dctx_flipped, dnoise_flipped = out[0], out[1], out[2]
    dweights = {k: jnp.asarray(dw, weights[k].dtype)
                for k, dw in zip(_WNAMES, out[3:3 + n_w])}
    return dweights, dz0, flip(dctx_flipped), flip(dnoise_flipped)


def _fused_solve_bwd(residuals, cotangents):
    weights, z0, ctx_steps, noise, dts, zs = residuals
    gz, gq = cotangents
    dweights, dz0, dctx, dnoise = _fused_solve_bwd_impl(
        weights, z0, ctx_steps, noise, dts, zs, gz, gq)
    return dweights, dz0, dctx, dnoise, jnp.zeros_like(dts)


_fused_solve.defvjp(_fused_solve_fwd, _fused_solve_bwd)


# --------------------------------------------------------------------------- #
#  Multi-replica variant: K independent solves in ONE kernel                  #
# --------------------------------------------------------------------------- #
#
# `jax.vmap` of a `pallas_call` adds a sequential leading grid dimension, so
# vmapping the single-replica kernel serialises the K solves — measured at
# only 1.15-1.29x aggregate scaling vs 2.35x for the XLA scan (BENCH_NOTES
# §8). These kernels instead UNROLL the K replicas inside each grid step:
# the K chains' matmuls are mutually independent, so the MXU pipelines them
# back-to-back while each chain's own next step still waits on its carry —
# in-kernel interleaving of independent work, the same trick the XLA path
# gets from vmap but without leaving the fused kernel.
#
# VMEM budget per replica (flagship shapes, bf16 weights): ~0.6 MB weights
# + ~1.2 MB f32 weight-gradient accumulators in the backward, so K is
# VMEM-bounded; the compiler rejects configurations that do not fit.


def _fwd_kernel_multi(z0_ref, ctx_ref, noise_ref, dts_ref, *wrefs,
                      zs_ref, qs_ref, z_s, q_s, L, C, K):
    n = pl.program_id(0)

    @pl.when(n == 0)
    def _():
        z_s[...] = z0_ref[...]
        q_s[...] = jnp.zeros_like(q_s)

    dt = dts_ref[n, 0]
    for k in range(K):
        w = {name: r[k] for name, r in zip(_WNAMES, wrefs)}
        z = z_s[k]
        f, _, g, u, _ = _forward_core(z, ctx_ref[k, 0], w, L, C)
        q_s[k] = q_s[k] + 0.5 * jnp.sum(u * u, axis=1, keepdims=True) * dt
        z_s[k] = z + f * dt + g * noise_ref[k, 0].astype(z.dtype)
        zs_ref[k, 0] = z_s[k].astype(zs_ref.dtype)
        qs_ref[k, 0] = q_s[k].astype(qs_ref.dtype)


def _bwd_kernel_multi(z_pre_ref, ctx_ref, noise_ref, dts_ref, gz_ref, gq_ref,
                      *wrefs, dz0_ref, dctx_ref, dnoise_ref, dw_refs, dz_s,
                      L, C, K):
    r_ = pl.program_id(0)
    n_total = pl.num_programs(0)

    @pl.when(r_ == 0)
    def _():
        dz_s[...] = jnp.zeros_like(dz_s)
        for dref in dw_refs.values():
            dref[...] = jnp.zeros_like(dref)

    dt = dts_ref[r_, 0]
    for k in range(K):
        w = {name: r[k] for name, r in zip(_WNAMES, wrefs)}
        z = z_pre_ref[k, 0].astype(dz_s.dtype)
        dz_next, dctx, dnoise, dw = _backward_core(
            z, ctx_ref[k, 0], noise_ref[k, 0].astype(z.dtype), dt,
            gz_ref[k, 0].astype(z.dtype), gq_ref[k, 0].astype(z.dtype),
            dz_s[k], w, L, C)
        dz_s[k] = dz_next
        dctx_ref[k, 0] = dctx.astype(dctx_ref.dtype)
        dnoise_ref[k, 0] = dnoise.astype(dnoise_ref.dtype)
        for name in _WNAMES:
            dw_refs[name][k] = dw_refs[name][k] + dw[name]

    @pl.when(r_ == n_total - 1)
    def _():
        dz0_ref[...] = dz_s[...]


@jax.custom_vjp
def _fused_solve_multi(weights, z0, ctx_steps, noise, dts):
    zs, qs = _fused_solve_multi_fwd_impl(weights, z0, ctx_steps, noise, dts)
    return zs, qs


def _fused_solve_multi_fwd_impl(weights, z0, ctx_steps, noise, dts,
                                interpret=None):
    interpret = _INTERPRET if interpret is None else interpret
    K, n, B, C = ctx_steps.shape
    L = z0.shape[2]
    kernel = functools.partial(_fwd_kernel_multi, L=L, C=C, K=K)

    def kern(z0_ref, ctx_ref, noise_ref, dts_ref, *rest):
        wrefs = rest[:len(_WNAMES)]
        zs_ref, qs_ref, z_s, q_s = rest[len(_WNAMES):]
        kernel(z0_ref, ctx_ref, noise_ref, dts_ref, *wrefs,
               zs_ref=zs_ref, qs_ref=qs_ref, z_s=z_s, q_s=q_s)

    kstep = lambda d: pl.BlockSpec((K, 1, B, d), lambda i: (0, i, 0, 0),  # noqa: E731
                                   memory_space=pltpu.VMEM)
    zs, qs = pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((K, B, L), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            kstep(C),                                       # ctx (K,n,B,C)
            kstep(L),                                       # noise
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(_WNAMES),
        out_specs=[kstep(L), kstep(1)],
        out_shape=[
            jax.ShapeDtypeStruct((K, n, B, L), weights["W1all"].dtype),
            jax.ShapeDtypeStruct((K, n, B, 1), z0.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((K, B, L), z0.dtype),
            pltpu.VMEM((K, B, 1), z0.dtype),
        ],
        compiler_params=_cparams(),
        interpret=interpret,
    )(z0, ctx_steps, noise, dts.reshape(-1, 1),
      *[weights[k] for k in _WNAMES])
    return zs, qs


def _fused_solve_multi_fwd(weights, z0, ctx_steps, noise, dts):
    zs, qs = _fused_solve_multi_fwd_impl(weights, z0, ctx_steps, noise, dts)
    return (zs, qs), (weights, z0, ctx_steps, noise, dts, zs)


def _fused_solve_multi_bwd_impl(weights, z0, ctx_steps, noise, dts, zs,
                                gz, gq, interpret=None):
    interpret = _INTERPRET if interpret is None else interpret
    K, n, B, C = ctx_steps.shape
    L = z0.shape[2]
    wdt = weights["W1all"].dtype
    gz = jnp.asarray(gz, wdt)
    gq = jnp.asarray(gq, z0.dtype)
    z_pre = jnp.concatenate(
        [z0[:, None], jnp.asarray(zs[:, :-1], z0.dtype)], axis=1)
    ginc = jnp.cumsum(gq[:, ::-1], axis=1)[:, ::-1]    # (K, n, B, 1)
    flip = lambda a: a[:, ::-1]                        # noqa: E731

    kernel = functools.partial(_bwd_kernel_multi, L=L, C=C, K=K)
    n_w = len(_WNAMES)

    def kern(*refs):
        (z_pre_ref, ctx_ref, noise_ref, dts_ref, gz_ref, gq_ref) = refs[:6]
        wrefs = refs[6:6 + n_w]
        outs = refs[6 + n_w:]
        dz0_ref, dctx_ref, dnoise_ref = outs[0], outs[1], outs[2]
        dw_refs = dict(zip(_WNAMES, outs[3:3 + n_w]))
        dz_s = outs[3 + n_w]
        kernel(z_pre_ref, ctx_ref, noise_ref, dts_ref, gz_ref, gq_ref,
               *wrefs, dz0_ref=dz0_ref, dctx_ref=dctx_ref,
               dnoise_ref=dnoise_ref, dw_refs=dw_refs, dz_s=dz_s)

    kstep = lambda d: pl.BlockSpec((K, 1, B, d), lambda i: (0, i, 0, 0),  # noqa: E731
                                   memory_space=pltpu.VMEM)
    dw_shapes = [jax.ShapeDtypeStruct(weights[k].shape, jnp.float32)
                 for k in _WNAMES]
    out = pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            kstep(L),                                   # z_pre (flipped)
            kstep(C),                                   # ctx (flipped)
            kstep(L),                                   # noise (flipped)
            pl.BlockSpec(memory_space=pltpu.SMEM),
            kstep(L),                                   # gz (flipped)
            kstep(1),                                   # ginc (flipped)
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_w,
        out_specs=[
            pl.BlockSpec((K, B, L), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            kstep(C),                                   # dctx (flipped)
            kstep(L),                                   # dnoise (flipped)
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_w,
        out_shape=[
            jax.ShapeDtypeStruct((K, B, L), z0.dtype),
            jax.ShapeDtypeStruct((K, n, B, C), ctx_steps.dtype),
            jax.ShapeDtypeStruct((K, n, B, L), noise.dtype),
        ] + dw_shapes,
        scratch_shapes=[pltpu.VMEM((K, B, L), z0.dtype)],
        compiler_params=_cparams(),
        interpret=interpret,
    )(flip(z_pre), flip(ctx_steps), flip(noise),
      dts[::-1].reshape(-1, 1), flip(gz), flip(ginc),
      *[weights[k] for k in _WNAMES])

    dz0, dctx_flipped, dnoise_flipped = out[0], out[1], out[2]
    dweights = {k: jnp.asarray(dw, weights[k].dtype)
                for k, dw in zip(_WNAMES, out[3:3 + n_w])}
    return dweights, dz0, flip(dctx_flipped), flip(dnoise_flipped)


def _fused_solve_multi_bwd(residuals, cotangents):
    weights, z0, ctx_steps, noise, dts, zs = residuals
    gz, gq = cotangents
    dweights, dz0, dctx, dnoise = _fused_solve_multi_bwd_impl(
        weights, z0, ctx_steps, noise, dts, zs, gz, gq)
    return dweights, dz0, dctx, dnoise, jnp.zeros_like(dts)


_fused_solve_multi.defvjp(_fused_solve_multi_fwd, _fused_solve_multi_bwd)


def latent_logqp_solve_fused(model, z0, ts, key, dt):
    """Drop-in fused replacement for the flagship
    ``sdeint(model, z0, ts, logqp=True, method='euler')`` solve.

    Returns ``(zs, log_ratio)`` with the exact shapes/semantics of the XLA
    path (zs: ``(T, B, L)`` on ``ts`` via linear interpolation on the step
    grid, log_ratio: per-interval KL increments, reference
    sdeint.py:284-300). The noise stream matches the XLA path bitwise (same
    ``BrownianInterval``-keyed grid sampling, core/sdeint.py:155-162), so
    ``fused`` and XLA solves of the same ``key`` are directly comparable.
    """
    z0, ctx_steps, noise, dts, grid = _prep_solve(model, z0, ts, key, dt)
    weights = pack_weights(model)
    zs_steps, qs_steps = _fused_solve(weights, z0, ctx_steps, noise, dts)
    return _interp_tail(ts, grid, z0, zs_steps, qs_steps, model.latent_size)


def _prep_solve(model, z0, ts, key, dt):
    """Shared per-replica solve prep (single wrapper uses it directly, the
    multi wrapper vmaps the key-/model-dependent pieces): returns
    ``(z0, ctx_steps, noise, dts, grid)``."""
    import numpy as np

    from ..core import integrate
    from ..core.sdeint import _time_dtype

    L = model.latent_size
    B = z0.shape[-2]
    C = model.context_size
    if L + C + 1 > _LANE:
        raise ValueError(f"latent+context must fit one lane tile: "
                         f"L + C <= {_LANE - 1} (got {L} + {C})")
    # Matmuls run in the weights' dtype (bf16 weights drive the MXU's bf16
    # path and halve the per-step HBM streams); the state carry, KL channel
    # and weight-gradient accumulators stay float32 — standard mixed
    # precision. Casting here — outside the custom_vjp boundary — keeps
    # mixed-precision callers working: autodiff maps the cotangents back
    # through the casts.
    wdtype = model.f_net.layers[0].w.dtype
    sdtype = jnp.float32 if wdtype == jnp.bfloat16 else wdtype
    z0 = jnp.asarray(z0, sdtype)
    ts_np = np.asarray(ts, np.float64)
    grid = integrate.build_step_grid(ts_np[0], ts_np[-1], dt)

    # Same default-noise derivation as sdeint's _BMWrapper path (which
    # samples with the BrownianInterval's _key — the key verbatim,
    # brownian/interval.py:128): the logqp wrapper augments the diagonal
    # state with one channel, so the default bm has size (B, L+1); the
    # kernel consumes the first L channels (the logqp channel's diffusion
    # is zero). In bf16 mixed mode the stream is sampled in bf16 — the same
    # stream a fully-bf16 XLA solve would draw (bm dtype follows y0).
    def replica_noise(key):
        W, _, _ = integrate.sample_grid_noise(key, grid, (B, L + 1), wdtype)
        return W[..., :L]

    # Per-step context rows: the model looks ctx up by time with
    # searchsorted(ctx_ts, t, 'left') at the step's left endpoint
    # (models/latent_sde.py:_ctx_at). jnp ops so this stays differentiable —
    # the gather's transpose IS the dctx scatter back into (T, B, C).
    t0s = jnp.asarray(grid[:-1], _time_dtype(z0))

    def replica_ctx(ctx_ts, ctx):
        idx = jnp.clip(jnp.searchsorted(ctx_ts, t0s, side="left"), 0,
                       ctx.shape[0] - 1)
        return jnp.asarray(ctx, wdtype)[idx]      # (n, B, C)

    multi = z0.ndim == 3                           # (K, B, L) stacked
    if multi:
        noise = jax.vmap(replica_noise)(key)
        ctx_steps = jax.vmap(replica_ctx)(model._ctx_ts, model._ctx)
    else:
        noise = replica_noise(key)
        ctx_steps = replica_ctx(model._ctx_ts, model._ctx)

    # dt by f32 grid subtraction — BITWISE what integrate_fixed's scan uses
    # (t1 - t0 of the f32-cast grid), not f32(np.diff(float64 grid)).
    grid_dev = jnp.asarray(grid, z0.dtype)
    dts = grid_dev[1:] - grid_dev[:-1]
    return z0, ctx_steps, noise, dts, grid


def _interp_tail(ts, grid, z0, zs_steps, qs_steps, L):
    """States on the full grid (z0/q0 prepended), interpolated onto ts and
    parsed exactly like the XLA path (logqp -> per-interval differences).
    Leading replica axes vmap through."""
    from ..core import integrate

    if z0.ndim == 3:
        return jax.vmap(
            lambda z0_k, zs_k, qs_k: _interp_tail(ts, grid, z0_k, zs_k,
                                                  qs_k, L)
        )(z0, zs_steps, qs_steps)
    B = z0.shape[0]
    zq_grid = jnp.concatenate([zs_steps, qs_steps], axis=-1)
    zq0 = jnp.concatenate([z0, jnp.zeros((B, 1), z0.dtype)], axis=-1)
    zq_full = jnp.concatenate([zq0[None], zq_grid], axis=0)
    ys = integrate.linear_interp_on_grid(jnp.asarray(ts, z0.dtype),
                                         jnp.asarray(grid, z0.dtype), zq_full)
    zs = ys[:, :, :L]
    log_ratio = ys[1:, :, L] - ys[:-1, :, L]
    return zs, log_ratio


def latent_logqp_solve_fused_multi(models, z0, ts, keys, dt):
    """K independent flagship solves in ONE pair of kernels.

    ``models`` is a stacked ``LatentSDE`` pytree (leading replica axis on
    every leaf, e.g. from ``jax.vmap(LatentSDE)(keys)``), already
    contextualized; ``z0`` is ``(K, B, L)``; ``keys`` is ``(K,)`` solve keys.
    Semantically identical to ``vmap``-ing :func:`latent_logqp_solve_fused`
    over the replica axis — per-replica noise streams, values and gradients
    match the single-replica kernel exactly — but the K solver chains are
    unrolled INSIDE each kernel grid step so their independent matmuls
    pipeline on the MXU instead of serialising (vmap of a ``pallas_call``
    runs replicas sequentially; BENCH_NOTES §8 reading 2).

    Returns ``(zs, log_ratio)`` with leading replica axes:
    ``(K, T, B, L)`` and ``(K, T-1, B)``.
    """
    z0, ctx_steps, noise, dts, grid = _prep_solve(models, z0, ts, keys, dt)
    weights = jax.vmap(pack_weights)(models)
    zs_steps, qs_steps = _fused_solve_multi(weights, z0, ctx_steps, noise,
                                            dts)
    return _interp_tail(ts, grid, z0, zs_steps, qs_steps,
                        models.latent_size)
