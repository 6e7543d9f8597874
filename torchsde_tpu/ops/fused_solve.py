"""Generic whole-solve fused kernels for MLP-tower SDEs.

`latent_fused.py` and `gan_fused.py` hand-fuse the two flagship workloads.
This module generalizes the pattern into a *framework capability*: describe
your drift/diffusion as MLP towers (a `TowerSpec` — any depth, activations
from {softplus, tanh, sigmoid, lipswish, linear}) and `fused_sdeint` runs
the ENTIRE fixed-step solve as ONE `pallas_call` forward plus ONE
hand-derived-backward `pallas_call`: state and all tower weights stay
VMEM-resident across every solver step, per-step noise blocks stream
HBM→VMEM, and weight gradients accumulate in VMEM.

Supported step templates (reference step algebra cited per solver in
core/solvers.py):

* ``method='euler'`` with ``noise_type in {'diagonal', 'general'}``:
  ``y1 = y0 + f(t0,y0) dt + g(t0,y0)·dW`` (reference euler.py:19-37);
* ``method='reversible_heun'`` with ``noise_type in {'diagonal','general'}``
  (reference reversible_heun.py:48-73), carrying ``(y, f, g, z)`` and the
  reverse cotangent recurrence ``(ay, az, af, ag)`` derived in
  gan_fused.py's module docstring.

The noise stream matches `sdeint(..., bm=None, key=key)` bitwise (same
BrownianInterval-keyed grid sampling, core/sdeint.py:155-162), so fused and
XLA solves of the same key are directly comparable. Towers are recomputed
at the streamed per-step states in the backward (no activation storage).
The custom-VJP boundary takes the initial tower evaluations as explicit
inputs for reversible Heun, so step-0 differentiates as ordinary XLA.

Sizing: every tower in/out width and the state/noise widths must be
<= 128 (lane-padded); towers see the zero-padded input row
``[t? | y | 0...]`` when ``with_time=True`` (t in column 0).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ._pallas_common import LANE as _LANE
from ._pallas_common import cparams as _cparams
from ._pallas_common import pad1 as _pad1
from ._pallas_common import pad2 as _pad2
from ._pallas_common import pl, pltpu

# Tests flip this to run the kernels through the Pallas interpreter on CPU.
_INTERPRET = False

_ACTS = ("softplus", "tanh", "sigmoid", "lipswish", "linear")


class TowerSpec:
    """Declarative MLP tower: ``[(W, b, act), ...]`` with act in
    {softplus, tanh, sigmoid, lipswish, linear}. ``W``: (in, out) arrays.

    Build from the library layers with :meth:`from_mlp` /
    :meth:`from_lipmlp`.
    """

    def __init__(self, layers):
        for i, (w, b, act) in enumerate(layers):
            if act not in _ACTS:
                raise ValueError(f"unknown activation {act!r} (use {_ACTS})")
            if max(w.shape) > _LANE or b.shape[0] > _LANE:
                raise ValueError(f"tower dims must be <= {_LANE}")
            if b.shape[0] != w.shape[1]:
                raise ValueError(
                    f"layer {i}: bias width {b.shape[0]} != weight output "
                    f"width {w.shape[1]}")
            if i > 0 and w.shape[0] != layers[i - 1][0].shape[1]:
                raise ValueError(
                    f"layer {i}: input width {w.shape[0]} does not chain from "
                    f"layer {i - 1} output width {layers[i - 1][0].shape[1]}")
        self.layers = list(layers)
        self.in_size = layers[0][0].shape[0]
        self.out_size = layers[-1][0].shape[1]

    @classmethod
    def from_mlp(cls, mlp, hidden_act="softplus", final_act="linear"):
        """From models.layers.MLP (hidden activations between Linears)."""
        ls = mlp.layers
        return cls([(l.w, l.b, hidden_act if i < len(ls) - 1 else final_act)
                    for i, l in enumerate(ls)])

    @classmethod
    def from_lipmlp(cls, mlp):
        """From models.sde_gan.LipMLP (lipswish hidden, optional tanh)."""
        ls = mlp.layers
        final = "tanh" if mlp.tanh else "linear"
        return cls([(l.w, l.b, "lipswish" if i < len(ls) - 1 else final)
                    for i, l in enumerate(ls)])

    def pack(self):
        """Padded (LANE, LANE)/(1, LANE) buffers. Differentiable (jnp.pad)."""
        out = []
        for (w, b, _) in self.layers:
            out.append(_pad2(w))
            out.append(_pad1(b))
        return out

    @property
    def acts(self):
        return tuple(act for (_, _, act) in self.layers)


def _apply_act(pre, act):
    if act == "softplus":
        return jax.nn.softplus(pre)
    if act == "tanh":
        return jnp.tanh(pre)
    if act == "sigmoid":
        return jax.nn.sigmoid(pre)
    if act == "lipswish":
        return 0.909 * pre * jax.nn.sigmoid(pre)
    return pre


def _act_bwd(dout, pre, out, act):
    """d pre given d out; uses pre or out, whichever is cheaper."""
    if act == "softplus":
        return dout * (1.0 - jnp.exp(-out))
    if act == "tanh":
        return dout * (1.0 - out * out)
    if act == "sigmoid":
        return dout * out * (1.0 - out)
    if act == "lipswish":
        sig = jax.nn.sigmoid(pre)
        return dout * (0.909 * (sig + pre * sig * (1.0 - sig)))
    return dout


def _tower_fwd(x_pad, wrefs, acts):
    """x_pad: (B, LANE) zero-padded input. Returns (out, cache) where cache
    holds per-layer (pre, out). Padded-column activations are NOT zero
    (softplus(0)=ln2, sigmoid(0)=0.5); correctness relies on the NEXT
    layer's zero-padded weight ROWS killing them and on every consumer
    slicing outputs to their true width — do not sum/reuse padded
    columns."""
    cache = []
    h = x_pad
    for i, act in enumerate(acts):
        W, b = wrefs[2 * i][...], wrefs[2 * i + 1][...]
        pre = jnp.dot(h, W, preferred_element_type=jnp.float32) + b
        h = _apply_act(pre, act)
        cache.append((pre, h))
    return h, cache


def _tower_bwd(dout, cache, x_pad, wrefs, acts, dwrefs):
    """VJP of _tower_fwd; accumulates into dwrefs, returns d x_pad."""
    d = dout
    for i in range(len(acts) - 1, -1, -1):
        pre, out = cache[i]
        d = _act_bwd(d, pre, out, acts[i])
        inp = cache[i - 1][1] if i > 0 else x_pad
        dwrefs[2 * i][...] += jnp.dot(inp.T, d,
                                      preferred_element_type=jnp.float32)
        dwrefs[2 * i + 1][...] += jnp.sum(d, axis=0, keepdims=True)
        d = jnp.dot(d, wrefs[2 * i][...].T,
                    preferred_element_type=jnp.float32)
    return d


@functools.lru_cache(maxsize=64)
def _tile_mats(s, m):
    """0/1 matrices for (B,s,m) contractions as matmuls (row-major flatten;
    see gan_fused._tile_mats). Returned as NUMPY arrays on purpose: the
    solver factories cache closures over these, and a `jnp.asarray` created
    while a jit trace is active would be a tracer — caching it leaks the
    trace (grad-of-jit then fails lowering). np arrays convert per call."""
    T = np.zeros((m, s * m), np.float32)
    S = np.zeros((s * m, s), np.float32)
    E = np.zeros((s, s * m), np.float32)
    for i in range(s):
        for j in range(m):
            T[j, i * m + j] = 1.0
            S[i * m + j, i] = 1.0
            E[i, i * m + j] = 1.0
    return T, S, E, np.ascontiguousarray(T.T)


def _pad_cols(arr, total=_LANE):
    """Zero-pad columns up to ``total`` lanes; no-op at exactly-full width
    (Mosaic rejects zero-size vectors)."""
    B, n = arr.shape
    if n >= total:
        return arr
    return jnp.concatenate([arr, jnp.zeros((B, total - n), arr.dtype)], axis=1)


def _build_x(t, y, S, with_time):
    B = y.shape[0]
    cols = [y]
    if with_time:
        cols = [jnp.full((B, 1), t, y.dtype)] + cols
    used = S + (1 if with_time else 0)
    if used < _LANE:  # Mosaic rejects zero-width vectors at exactly-full lanes
        cols.append(jnp.zeros((B, _LANE - used), y.dtype))
    return cols[0] if len(cols) == 1 else jnp.concatenate(cols, axis=1)


def _slice_dy(dx, S, with_time):
    off = 1 if with_time else 0
    return dx[:, off:off + S]


# =========================================================================== #
#  Euler                                                                      #
# =========================================================================== #

def _euler_fwd_kernel(y0_ref, noise_ref, t0s_ref, dts_ref, *rest,
                      nf, ng, facts, gacts, S, m, diag, with_time):
    fw = rest[:nf]
    gw = rest[nf:nf + ng]
    tm = rest[nf + ng]            # (Tm, Sm) consts ref pair or placeholder
    sm = rest[nf + ng + 1]
    ys_ref, y_s = rest[nf + ng + 2:]
    n = pl.program_id(0)

    @pl.when(n == 0)
    def _():
        y_s[...] = y0_ref[...]

    y = y_s[...]
    dt = dts_ref[n, 0]
    t0 = t0s_ref[n, 0]
    dW = noise_ref[0]
    x = _build_x(t0, y, S, with_time)
    fout, _ = _tower_fwd(x, fw, facts)
    gout, _ = _tower_fwd(x, gw, gacts)
    f = fout[:, :S]
    if diag:
        gdW = gout[:, :S] * dW
    else:
        dWt = jnp.dot(dW, tm[...], preferred_element_type=jnp.float32)
        gdW = jnp.dot(gout[:, :S * m] * dWt, sm[...],
                      preferred_element_type=jnp.float32)
    y_s[...] = y + f * dt + gdW
    ys_ref[0] = y_s[...]


def _euler_bwd_kernel(ypre_ref, noise_ref, t0s_ref, dts_ref, gy_ref, *rest,
                      nf, ng, facts, gacts, S, m, diag, with_time):
    fw = rest[:nf]
    gw = rest[nf:nf + ng]
    tm, em, tt = rest[nf + ng], rest[nf + ng + 1], rest[nf + ng + 2]
    outs = rest[nf + ng + 3:]
    dy0_ref, dnoise_ref = outs[0], outs[1]
    dfw = outs[2:2 + nf]
    dgw = outs[2 + nf:2 + nf + ng]
    dy_s = outs[2 + nf + ng]
    r = pl.program_id(0)
    n_total = pl.num_programs(0)

    @pl.when(r == 0)
    def _():
        dy_s[...] = jnp.zeros_like(dy_s)
        for ref in dfw + dgw:
            ref[...] = jnp.zeros_like(ref)

    y = ypre_ref[0]
    dW = noise_ref[0]
    dt = dts_ref[r, 0]
    t0 = t0s_ref[r, 0]
    dy = dy_s[...] + gy_ref[0]
    B = dy.shape[0]
    dtype = dy.dtype

    x = _build_x(t0, y, S, with_time)
    fout, fcache = _tower_fwd(x, fw, facts)
    gout, gcache = _tower_fwd(x, gw, gacts)

    df = dy * dt
    if diag:
        g = gout[:, :S]
        dnoise_ref[0] = dy * g
        dg = dy * dW
        dgp = _pad_cols(dg)
    else:
        gmat = gout[:, :S * m]
        dWt = jnp.dot(dW, tm[...], preferred_element_type=jnp.float32)
        dyE = jnp.dot(dy, em[...], preferred_element_type=jnp.float32)
        dnoise_ref[0] = jnp.dot(dyE * gmat, tt[...],
                                preferred_element_type=jnp.float32)[:, :m]
        dg = dyE * dWt
        dgp = _pad_cols(dg)

    dfp = _pad_cols(df)
    dx = _tower_bwd(dfp, fcache, x, fw, facts, dfw)
    dx += _tower_bwd(dgp, gcache, x, gw, gacts, dgw)
    dy_s[...] = dy + _slice_dy(dx, S, with_time)

    @pl.when(r == n_total - 1)
    def _():
        dy0_ref[...] = dy_s[...]


# =========================================================================== #
#  Reversible Heun                                                            #
# =========================================================================== #

def _rh_fwd_kernel(y0_ref, f0_ref, g0_ref, noise_ref, t1s_ref, dts_ref,
                   *rest, nf, ng, facts, gacts, S, m, diag, with_time):
    fw = rest[:nf]
    gw = rest[nf:nf + ng]
    tm, sm = rest[nf + ng], rest[nf + ng + 1]
    ys_ref, zs_ref, gs_ref, y_s, z_s, f_s, g_s = rest[nf + ng + 2:]
    n = pl.program_id(0)

    @pl.when(n == 0)
    def _():
        y_s[...] = y0_ref[...]
        z_s[...] = y0_ref[...]
        f_s[...] = f0_ref[...]
        g_s[...] = g0_ref[...]

    dt = dts_ref[n, 0]
    t1 = t1s_ref[n, 0]
    dW = noise_ref[0]
    y, z, f0, g0 = y_s[...], z_s[...], f_s[...], g_s[...]

    if diag:
        g0dW = g0 * dW
    else:
        dWt = jnp.dot(dW, tm[...], preferred_element_type=jnp.float32)
        g0dW = jnp.dot(g0 * dWt, sm[...],
                       preferred_element_type=jnp.float32)
    z1 = 2.0 * y - z + dt * f0 + g0dW

    x = _build_x(t1, z1, S, with_time)
    fout, _ = _tower_fwd(x, fw, facts)
    gout, _ = _tower_fwd(x, gw, gacts)
    f1 = fout[:, :S]
    g1 = gout[:, :S] if diag else gout[:, :S * m]

    if diag:
        gsum_dW = (g0 + g1) * (0.5 * dW)
    else:
        gsum_dW = jnp.dot((g0 + g1) * dWt, sm[...],
                          preferred_element_type=jnp.float32) * 0.5
    y1 = y + 0.5 * dt * (f0 + f1) + gsum_dW

    y_s[...] = y1
    z_s[...] = z1
    f_s[...] = f1
    g_s[...] = g1
    ys_ref[0] = y1
    zs_ref[0] = z1
    gs_ref[0] = g1


def _rh_bwd_kernel(zs_ref, noise_ref, gy_ref, gnext_ref, gcur_ref,
                   t1s_ref, dts_ref, *rest,
                   nf, ng, facts, gacts, S, m, diag, with_time):
    fw = rest[:nf]
    gw = rest[nf:nf + ng]
    tm, em, tt = rest[nf + ng], rest[nf + ng + 1], rest[nf + ng + 2]
    outs = rest[nf + ng + 3:]
    dy0_ref, df0_ref, dg0_ref, dnoise_ref = outs[:4]
    dfw = outs[4:4 + nf]
    dgw = outs[4 + nf:4 + nf + ng]
    ay_s, az_s, af_s, ag_s = outs[4 + nf + ng:]
    r = pl.program_id(0)
    n_total = pl.num_programs(0)

    @pl.when(r == 0)
    def _():
        ay_s[...] = jnp.zeros_like(ay_s)
        az_s[...] = jnp.zeros_like(az_s)
        af_s[...] = jnp.zeros_like(af_s)
        ag_s[...] = jnp.zeros_like(ag_s)
        for ref in dfw + dgw:
            ref[...] = jnp.zeros_like(ref)

    dt = dts_ref[r, 0]
    t1 = t1s_ref[r, 0]
    dW = noise_ref[0]
    z1 = zs_ref[0]
    g1 = gnext_ref[0]
    g0 = gcur_ref[0]
    gwidth = S if diag else S * m
    B = z1.shape[0]
    dtype = z1.dtype

    ay = ay_s[...] + gy_ref[0]
    Af = af_s[...] + 0.5 * dt * ay
    if diag:
        Ag = ag_s[...] + ay * (0.5 * dW)
    else:
        dWt = jnp.dot(dW, tm[...], preferred_element_type=jnp.float32)
        ayE = jnp.dot(ay, em[...], preferred_element_type=jnp.float32)
        Ag = ag_s[...] + 0.5 * ayE * dWt

    x = _build_x(t1, z1, S, with_time)
    fout, fcache = _tower_fwd(x, fw, facts)
    gout, gcache = _tower_fwd(x, gw, gacts)

    dAfp = _pad_cols(Af)
    dAgp = _pad_cols(Ag)
    dx = _tower_bwd(dAfp, fcache, x, fw, facts, dfw)
    dx += _tower_bwd(dAgp, gcache, x, gw, gacts, dgw)
    Az = az_s[...] + _slice_dy(dx, S, with_time)

    if diag:
        dnoise_ref[0] = Az * g0 + 0.5 * ay * (g0 + g1)
        ag_new = (0.5 * ay + Az) * dW
    else:
        AzE = jnp.dot(Az, em[...], preferred_element_type=jnp.float32)
        dnoise_ref[0] = jnp.dot(AzE * g0 + 0.5 * ayE * (g0 + g1), tt[...],
                                preferred_element_type=jnp.float32)[:, :m]
        ag_new = (0.5 * ayE + AzE) * dWt

    ay_s[...] = ay + 2.0 * Az
    az_s[...] = -Az
    af_s[...] = 0.5 * dt * ay + dt * Az
    ag_s[...] = ag_new

    @pl.when(r == n_total - 1)
    def _():
        dy0_ref[...] = ay_s[...] + az_s[...]
        df0_ref[...] = af_s[...]
        dg0_ref[...] = ag_s[...]


# =========================================================================== #
#  pallas_call plumbing                                                       #
# =========================================================================== #

def _specs(B):
    full = lambda d: pl.BlockSpec((B, d), lambda i: (0, 0),       # noqa: E731
                                  memory_space=pltpu.VMEM)
    step = lambda d: pl.BlockSpec((1, B, d), lambda i: (i, 0, 0),  # noqa: E731
                                  memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return full, step, smem, vmem


@functools.lru_cache(maxsize=64)
def _make_euler(facts, gacts, S, m, diag, with_time, dtype):
    nf, ng = 2 * len(facts), 2 * len(gacts)
    # diag kernels never read the tile matrices — pass 1x1 dummies instead
    # of up to 24 MB of VMEM-resident constants (code-review r4)
    if diag:
        Tm = Sm = Em = Tt = np.zeros((1, 1), np.float32)
    else:
        Tm, Sm, Em, Tt = _tile_mats(S, m)
    kw = dict(nf=nf, ng=ng, facts=facts, gacts=gacts, S=S, m=m, diag=diag,
              with_time=with_time)

    def fwd_impl(fw, gw, y0, noise, t0s, dts, interpret=None):
        interpret = _INTERPRET if interpret is None else interpret
        N, B, _ = noise.shape
        full, step, smem, vmem = _specs(B)
        out = pl.pallas_call(
            functools.partial(_euler_fwd_kernel, **kw),
            grid=(N,),
            in_specs=[full(S), step(m if not diag else S), smem, smem]
            + [vmem] * (nf + ng) + [vmem, vmem],
            out_specs=[step(S)],
            out_shape=[jax.ShapeDtypeStruct((N, B, S), dtype)],
            scratch_shapes=[pltpu.VMEM((B, S), dtype)],
            compiler_params=_cparams(), interpret=interpret,
        )(y0, noise, t0s.reshape(-1, 1), dts.reshape(-1, 1),
          *fw, *gw, Tm, Sm)
        return out[0]

    def bwd_impl(fw, gw, y0, noise, t0s, dts, ys, gy, interpret=None):
        interpret = _INTERPRET if interpret is None else interpret
        N, B, _ = noise.shape
        gy = jnp.asarray(gy, dtype)
        y_pre = jnp.concatenate([y0[None], ys[:-1]], axis=0)
        flip = lambda a: a[::-1]                          # noqa: E731
        full, step, smem, vmem = _specs(B)
        mwidth = m if not diag else S
        dw_shapes = ([jax.ShapeDtypeStruct(w.shape, dtype) for w in fw]
                     + [jax.ShapeDtypeStruct(w.shape, dtype) for w in gw])
        out = pl.pallas_call(
            functools.partial(_euler_bwd_kernel, **kw),
            grid=(N,),
            in_specs=[step(S), step(mwidth), smem, smem, step(S)]
            + [vmem] * (nf + ng) + [vmem] * 3,
            out_specs=[full(S), step(mwidth)] + [vmem] * (nf + ng),
            out_shape=[jax.ShapeDtypeStruct((B, S), dtype),
                       jax.ShapeDtypeStruct((N, B, mwidth), dtype)]
            + dw_shapes,
            scratch_shapes=[pltpu.VMEM((B, S), dtype)],
            compiler_params=_cparams(), interpret=interpret,
        )(flip(y_pre), flip(noise), flip(t0s).reshape(-1, 1),
          flip(dts).reshape(-1, 1), flip(gy), *fw, *gw, Tm, Em, Tt)
        dy0, dnoise_f = out[0], out[1]
        dfw = list(out[2:2 + nf])
        dgw = list(out[2 + nf:2 + nf + ng])
        return dfw, dgw, dy0, flip(dnoise_f)

    @jax.custom_vjp
    def solve(fw, gw, y0, noise, t0s, dts):
        return fwd_impl(fw, gw, y0, noise, t0s, dts)

    def solve_fwd(fw, gw, y0, noise, t0s, dts):
        ys = fwd_impl(fw, gw, y0, noise, t0s, dts)
        return ys, (fw, gw, y0, noise, t0s, dts, ys)

    def solve_bwd(res, gy):
        fw, gw, y0, noise, t0s, dts, ys = res
        dfw, dgw, dy0, dnoise = bwd_impl(fw, gw, y0, noise, t0s, dts, ys, gy)
        return (dfw, dgw, dy0, dnoise,
                jnp.zeros_like(t0s), jnp.zeros_like(dts))

    solve.defvjp(solve_fwd, solve_bwd)
    return solve


@functools.lru_cache(maxsize=64)
def _make_rh(facts, gacts, S, m, diag, with_time, dtype):
    nf, ng = 2 * len(facts), 2 * len(gacts)
    gwidth = S if diag else S * m
    if diag:  # tile matrices unused by the diag branch (see _make_euler)
        Tm = Sm = Em = Tt = np.zeros((1, 1), np.float32)
    else:
        Tm, Sm, Em, Tt = _tile_mats(S, m)
    kw = dict(nf=nf, ng=ng, facts=facts, gacts=gacts, S=S, m=m, diag=diag,
              with_time=with_time)

    def fwd_impl(fw, gw, y0, f0, g0, noise, t1s, dts, interpret=None):
        interpret = _INTERPRET if interpret is None else interpret
        N, B, _ = noise.shape
        full, step, smem, vmem = _specs(B)
        ys, zs, gs = pl.pallas_call(
            functools.partial(_rh_fwd_kernel, **kw),
            grid=(N,),
            in_specs=[full(S), full(S), full(gwidth),
                      step(m if not diag else S), smem, smem]
            + [vmem] * (nf + ng) + [vmem, vmem],
            out_specs=[step(S), step(S), step(gwidth)],
            out_shape=[jax.ShapeDtypeStruct((N, B, S), dtype),
                       jax.ShapeDtypeStruct((N, B, S), dtype),
                       jax.ShapeDtypeStruct((N, B, gwidth), dtype)],
            scratch_shapes=[pltpu.VMEM((B, S), dtype),
                            pltpu.VMEM((B, S), dtype),
                            pltpu.VMEM((B, S), dtype),
                            pltpu.VMEM((B, gwidth), dtype)],
            compiler_params=_cparams(), interpret=interpret,
        )(y0, f0, g0, noise, t1s.reshape(-1, 1), dts.reshape(-1, 1),
          *fw, *gw, Tm, Sm)
        return ys, zs, gs

    def bwd_impl(fw, gw, y0, f0, g0, noise, t1s, dts, zs, gs, gy,
                 interpret=None):
        interpret = _INTERPRET if interpret is None else interpret
        N, B, _ = noise.shape
        gy = jnp.asarray(gy, dtype)
        gs_all = jnp.concatenate([g0[None], gs], axis=0)
        fa = gs_all[::-1]
        flip = lambda a: a[::-1]                          # noqa: E731
        full, step, smem, vmem = _specs(B)
        mwidth = m if not diag else S
        dw_shapes = ([jax.ShapeDtypeStruct(w.shape, dtype) for w in fw]
                     + [jax.ShapeDtypeStruct(w.shape, dtype) for w in gw])
        out = pl.pallas_call(
            functools.partial(_rh_bwd_kernel, **kw),
            grid=(N,),
            # fa[:-1] block r = g_{n+1}; fa[1:] block r = g_n (n = N-1-r)
            in_specs=[step(S), step(mwidth), step(S), step(gwidth),
                      step(gwidth), smem, smem]
            + [vmem] * (nf + ng) + [vmem] * 3,
            out_specs=[full(S), full(S), full(gwidth), step(mwidth)]
            + [vmem] * (nf + ng),
            out_shape=[jax.ShapeDtypeStruct((B, S), dtype),
                       jax.ShapeDtypeStruct((B, S), dtype),
                       jax.ShapeDtypeStruct((B, gwidth), dtype),
                       jax.ShapeDtypeStruct((N, B, mwidth), dtype)]
            + dw_shapes,
            scratch_shapes=[pltpu.VMEM((B, S), dtype),
                            pltpu.VMEM((B, S), dtype),
                            pltpu.VMEM((B, S), dtype),
                            pltpu.VMEM((B, gwidth), dtype)],
            compiler_params=_cparams(), interpret=interpret,
        )(flip(zs), flip(noise), flip(gy), fa[:-1], fa[1:],
          flip(t1s).reshape(-1, 1), flip(dts).reshape(-1, 1),
          *fw, *gw, Tm, Em, Tt)
        dy0, df0, dg0, dnoise_f = out[0], out[1], out[2], out[3]
        dfw = list(out[4:4 + nf])
        dgw = list(out[4 + nf:4 + nf + ng])
        return dfw, dgw, dy0, df0, dg0, flip(dnoise_f)

    @jax.custom_vjp
    def solve(fw, gw, y0, f0, g0, noise, t1s, dts):
        ys, _, _ = fwd_impl(fw, gw, y0, f0, g0, noise, t1s, dts)
        return ys

    def solve_fwd(fw, gw, y0, f0, g0, noise, t1s, dts):
        ys, zs, gs = fwd_impl(fw, gw, y0, f0, g0, noise, t1s, dts)
        return ys, (fw, gw, y0, f0, g0, noise, t1s, dts, zs, gs)

    def solve_bwd(res, gy):
        fw, gw, y0, f0, g0, noise, t1s, dts, zs, gs = res
        dfw, dgw, dy0, df0, dg0, dnoise = bwd_impl(
            fw, gw, y0, f0, g0, noise, t1s, dts, zs, gs, gy)
        return (dfw, dgw, dy0, df0, dg0, dnoise,
                jnp.zeros_like(t1s), jnp.zeros_like(dts))

    solve.defvjp(solve_fwd, solve_bwd)
    return solve


# =========================================================================== #
#  Public API                                                                 #
# =========================================================================== #

def _grid_indices(grid, ts_np, caller):
    """Nearest-grid-point index for each output time, with a tolerance that
    survives float64 step accumulation (exact searchsorted falsely rejects
    e.g. ts=2.1 on a dt=0.7 grid whose point is 2.0999999999999996)."""
    idx = np.abs(np.asarray(grid)[None, :] - ts_np[:, None]).argmin(axis=1)
    span = float(ts_np[-1] - ts_np[0]) or 1.0
    if not np.allclose(np.asarray(grid)[idx], ts_np, atol=1e-9 * max(span, 1.0)):
        raise ValueError(f"{caller} requires every output time to lie on "
                         "the dt step grid")
    return idx


def _check_tower_io(spec, name, S, with_time, out_size=None):
    want_in = S + (1 if with_time else 0)
    if spec.in_size != want_in:
        raise ValueError(
            f"{name} tower expects input width {spec.in_size}, but the solve "
            f"feeds {want_in} ({'[t | y]' if with_time else '[y]'})")
    if out_size is not None and spec.out_size != out_size:
        raise ValueError(f"{name} tower must output width {out_size}, got "
                         f"{spec.out_size}")


def tower_sde(drift, diffusion, noise_type, sde_type, with_time=False,
              prior=None):
    """A plain Module SDE whose f/g (and optional h) evaluate exactly the
    given TowerSpecs — the XLA reference view of a fused solve, for
    cross-checking `fused_sdeint` against `sdeint` on identical dynamics."""
    from ..utils.module import Module

    class _TowerSDE(Module):
        def __init__(self):
            self.noise_type = noise_type
            self.sde_type = sde_type
            self.fw = [w for (w, _, _) in drift.layers]
            self.fb = [b for (_, b, _) in drift.layers]
            self.gw = [w for (w, _, _) in diffusion.layers]
            self.gb = [b for (_, b, _) in diffusion.layers]
            if prior is not None:
                self.hw = [w for (w, _, _) in prior.layers]
                self.hb = [b for (_, b, _) in prior.layers]

        def _x(self, t, y):
            if not with_time:
                return y
            return jnp.concatenate(
                [jnp.full((y.shape[0], 1), t, y.dtype), y], axis=1)

        @staticmethod
        def _run(ws, bs, acts, x):
            h = x
            for w, b, act in zip(ws, bs, acts):
                h = _apply_act(h @ w + b, act)
            return h

        def f(self, t, y):
            return self._run(self.fw, self.fb, drift.acts, self._x(t, y))

        def g(self, t, y):
            out = self._run(self.gw, self.gb, diffusion.acts, self._x(t, y))
            if noise_type == "diagonal":
                return out
            d = y.shape[1]
            return out.reshape(y.shape[0], d, out.shape[1] // d)

        if prior is not None:
            def h(self, t, y):
                return self._run(self.hw, self.hb, prior.acts,
                                 self._x(t, y))

    return _TowerSDE()


def _padding_flop_ratio(*specs):
    """Padded-vs-exact matmul FLOPs of the kernels' LANE-padded towers: the
    kernel computes a (LANE, LANE) matmul per layer regardless of the exact
    (in, out) widths."""
    exact = sum(w.shape[0] * w.shape[1]
                for spec in specs for (w, _, _) in spec.layers)
    padded = sum(_LANE * _LANE for spec in specs for _ in spec.layers)
    return padded / max(exact, 1)


def _auto_fuse(*specs):
    """Dispatch heuristic from the measured envelope (BENCH_NOTES.md §6):
    the whole-solve kernels win when the towers are near lane width (little
    padding waste); narrow SDEs lose up to 2x to the 128-lane padding while
    XLA's exact-shape scan body is only a handful of kernels. Threshold set
    from the v5e measurements: fuse when padding wastes < 2x the FLOPs."""
    return _padding_flop_ratio(*specs) <= 2.0


def fused_sdeint(drift, diffusion, y0, ts, key, dt, method="euler",
                 noise_type="diagonal", with_time=False, dispatch="auto"):
    """Whole-solve fused `sdeint` for MLP-tower SDEs.

    ``drift``/``diffusion``: :class:`TowerSpec`; the diffusion tower's
    output is ``(B, d)`` for diagonal noise or the row-major flattening of
    ``(B, d, m)`` for general noise. ``with_time=True`` feeds ``t`` as the
    towers' first input column (time-dependent vector fields).

    Matches ``sdeint(sde, y0, ts, method=method, dt=dt, key=key)`` bitwise
    in the noise stream and to float tolerance in values/gradients, for
    SDEs whose ``f``/``g`` evaluate exactly these towers on ``[t? | y]``.
    The solve computes in the towers' dtype: ``y0`` is cast on entry and
    the noise stream is the one ``sdeint`` would draw for a ``y0`` of that
    dtype, identically on every dispatch path. Fixed-step only, and the
    step grid must land on ``ts`` exactly (each output time a multiple of
    ``dt`` from ``t0``) — enforced on every dispatch path; output
    interpolation stays outside the kernels, as ordinary XLA.

    ``dispatch``: ``'auto'`` (default) uses the Pallas kernels only where the
    measured envelope says they win (near-lane-width towers) and otherwise
    runs the identical solve through the XLA scan — same key, bitwise-same
    noise stream, so the choice is purely a performance dispatch (VERDICT r1
    item 6). ``'fused'`` / ``'xla'`` force a path.
    """
    from ..core import integrate

    if method not in ("euler", "reversible_heun"):
        raise ValueError("fused_sdeint supports euler / reversible_heun")
    if noise_type not in ("diagonal", "general"):
        raise ValueError("fused_sdeint supports diagonal / general noise")
    if dispatch not in ("auto", "fused", "xla"):
        raise ValueError("dispatch must be 'auto', 'fused' or 'xla'")

    # ALL contract validation and the dtype contract come BEFORE the
    # dispatch decision, so 'auto' is purely a performance choice: both
    # paths accept/reject the same inputs, compute in the towers' dtype,
    # and draw the same noise stream (code-review r2).
    diag = noise_type == "diagonal"
    S = y0.shape[1]
    B = y0.shape[0]
    if diag:
        if diffusion.out_size != S:
            raise ValueError("diagonal diffusion tower must output d")
        m = S
    else:
        if diffusion.out_size % S:
            raise ValueError("general diffusion tower must output d*m")
        m = diffusion.out_size // S

    _check_tower_io(drift, "drift", S, with_time, out_size=S)
    _check_tower_io(diffusion, "diffusion", S, with_time)

    wdtype = drift.layers[0][0].dtype
    # The solve computes in the towers' dtype on both paths; y0 is cast on
    # entry, and the noise stream is the one sdeint would draw for a y0 of
    # that dtype (the stream is dtype-dependent).
    y0 = jnp.asarray(y0, wdtype)
    ts_np = np.asarray(ts, np.float64)
    grid = integrate.build_step_grid(ts_np[0], ts_np[-1], dt)
    # ts-on-grid validation applies to BOTH paths (the fused path also uses
    # idx for output gathering).
    idx = _grid_indices(grid, ts_np, "fused_sdeint")

    # The generic kernels compute in f32 (mixed-precision kernels exist only
    # for the specialised flagship modules, ops/latent_fused.py /
    # ops/gan_fused.py): 'auto' routes non-f32 towers to the XLA scan,
    # 'fused' rejects them loudly.
    if dispatch == "fused" and wdtype != jnp.float32:
        raise ValueError(
            f"fused_sdeint kernels are float32-only (towers are {wdtype}); "
            f"use dispatch='xla'/'auto' or float32 towers")
    if dispatch == "xla" or (dispatch == "auto"
                             and (wdtype != jnp.float32
                                  or not _auto_fuse(drift, diffusion))):
        from ..core.sdeint import sdeint
        sde_type = "ito" if method == "euler" else "stratonovich"
        sde = tower_sde(drift, diffusion, noise_type, sde_type,
                        with_time=with_time)
        return sdeint(sde, y0, ts, method=method, dt=dt, key=key)

    # sdeint's default-bm path samples with the BrownianInterval's _key,
    # which is the key verbatim (brownian/interval.py:128).
    W, _, _ = integrate.sample_grid_noise(key, grid, (B, m), wdtype)

    fw, gw = drift.pack(), diffusion.pack()
    grid_dev = jnp.asarray(grid, wdtype)
    t_lo = grid_dev[:-1]
    t_hi = grid_dev[1:]
    dts = grid_dev[1:] - grid_dev[:-1]  # f32 subtraction, = integrate_fixed

    if method == "euler":
        solve = _make_euler(drift.acts, diffusion.acts, S, m, diag,
                            with_time, wdtype)
        ys = solve(fw, gw, y0, W, t_lo, dts)
    else:
        x0 = _build_x(jnp.asarray(ts_np[0], wdtype), y0, S, with_time)
        f0 = _tower_fwd(x0, [jnp.asarray(a) for a in fw], drift.acts)[0][:, :S]
        gwidth = S if diag else S * m
        g0 = _tower_fwd(x0, [jnp.asarray(a) for a in gw],
                        diffusion.acts)[0][:, :gwidth]
        solve = _make_rh(drift.acts, diffusion.acts, S, m, diag,
                         with_time, wdtype)
        ys = solve(fw, gw, y0, f0, g0, W, t_hi, dts)

    ys_full = jnp.concatenate([y0[None], ys], axis=0)
    return ys_full[idx]


# =========================================================================== #
#  Euler + logqp (diagonal noise, prior drift tower)                          #
# =========================================================================== #

_EPS = 1e-7   # stable_division clamp (utils/misc.py)


def _euler_logqp_fwd_kernel(y0_ref, noise_ref, t0s_ref, dts_ref, *rest,
                            nf, nh, ng, facts, hacts, gacts, S, with_time):
    fw = rest[:nf]
    hw = rest[nf:nf + nh]
    gw = rest[nf + nh:nf + nh + ng]
    ys_ref, qs_ref, y_s, q_s = rest[nf + nh + ng:]
    n = pl.program_id(0)

    @pl.when(n == 0)
    def _():
        y_s[...] = y0_ref[...]
        q_s[...] = jnp.zeros_like(q_s)

    y = y_s[...]
    dt = dts_ref[n, 0]
    t0 = t0s_ref[n, 0]
    dW = noise_ref[0]
    x = _build_x(t0, y, S, with_time)
    f = _tower_fwd(x, fw, facts)[0][:, :S]
    h = _tower_fwd(x, hw, hacts)[0][:, :S]
    g = _tower_fwd(x, gw, gacts)[0][:, :S]
    # stable_division parity (utils/misc.py:28-37): clamp by |g| with the sign
    # preserved, so negative-capable diffusion towers (linear/tanh final
    # activations) divide by g, not by +eps.
    big = jnp.abs(g) > _EPS
    sign = jnp.where(g >= 0, 1.0, -1.0).astype(g.dtype)
    gs = jnp.where(big, g, _EPS * sign)
    u = (f - h) / gs
    q_s[...] = q_s[...] + 0.5 * jnp.sum(u * u, axis=1, keepdims=True) * dt
    y_s[...] = y + f * dt + g * dW
    ys_ref[0] = y_s[...]
    qs_ref[0] = q_s[...]


def _euler_logqp_bwd_kernel(ypre_ref, noise_ref, t0s_ref, dts_ref, gy_ref,
                            gq_ref, *rest,
                            nf, nh, ng, facts, hacts, gacts, S, with_time):
    fw = rest[:nf]
    hw = rest[nf:nf + nh]
    gw = rest[nf + nh:nf + nh + ng]
    outs = rest[nf + nh + ng:]
    dy0_ref, dnoise_ref = outs[0], outs[1]
    dfw = outs[2:2 + nf]
    dhw = outs[2 + nf:2 + nf + nh]
    dgw = outs[2 + nf + nh:2 + nf + nh + ng]
    dy_s = outs[2 + nf + nh + ng]
    r = pl.program_id(0)
    n_total = pl.num_programs(0)

    @pl.when(r == 0)
    def _():
        dy_s[...] = jnp.zeros_like(dy_s)
        for ref in dfw + dhw + dgw:
            ref[...] = jnp.zeros_like(ref)

    y = ypre_ref[0]
    dW = noise_ref[0]
    dt = dts_ref[r, 0]
    t0 = t0s_ref[r, 0]
    B = y.shape[0]
    dtype = y.dtype

    x = _build_x(t0, y, S, with_time)
    fout, fcache = _tower_fwd(x, fw, facts)
    hout, hcache = _tower_fwd(x, hw, hacts)
    gout, gcache = _tower_fwd(x, gw, gacts)
    f, h, g = fout[:, :S], hout[:, :S], gout[:, :S]
    # Same sign-preserving clamp as the forward kernel (stable_division).
    big = jnp.abs(g) > _EPS
    sign = jnp.where(g >= 0, 1.0, -1.0).astype(g.dtype)
    gs = jnp.where(big, g, _EPS * sign)
    u = (f - h) / gs

    dy = dy_s[...] + gy_ref[0]
    dnoise_ref[0] = dy * g
    du = gq_ref[0] * u * dt
    df = dy * dt + du / gs
    dh = -du / gs
    # stable_division clamps only the u-path gradient; the state term dy*dW
    # is never masked (latent_fused.py / code-review r4 finding)
    dg = dy * dW - (du * u / gs) * big.astype(dtype)

    dx = _tower_bwd(_pad_cols(df), fcache, x, fw, facts, dfw)
    dx += _tower_bwd(_pad_cols(dh), hcache, x, hw, hacts, dhw)
    dx += _tower_bwd(_pad_cols(dg), gcache, x, gw, gacts, dgw)
    dy_s[...] = dy + _slice_dy(dx, S, with_time)

    @pl.when(r == n_total - 1)
    def _():
        dy0_ref[...] = dy_s[...]


@functools.lru_cache(maxsize=64)
def _make_euler_logqp(facts, hacts, gacts, S, with_time, dtype):
    nf, nh, ng = 2 * len(facts), 2 * len(hacts), 2 * len(gacts)
    kw = dict(nf=nf, nh=nh, ng=ng, facts=facts, hacts=hacts, gacts=gacts,
              S=S, with_time=with_time)

    def fwd_impl(fw, hw, gw, y0, noise, t0s, dts, interpret=None):
        interpret = _INTERPRET if interpret is None else interpret
        N, B, _ = noise.shape
        full, step, smem, vmem = _specs(B)
        ys, qs = pl.pallas_call(
            functools.partial(_euler_logqp_fwd_kernel, **kw),
            grid=(N,),
            in_specs=[full(S), step(S), smem, smem]
            + [vmem] * (nf + nh + ng),
            out_specs=[step(S), step(1)],
            out_shape=[jax.ShapeDtypeStruct((N, B, S), dtype),
                       jax.ShapeDtypeStruct((N, B, 1), dtype)],
            scratch_shapes=[pltpu.VMEM((B, S), dtype),
                            pltpu.VMEM((B, 1), dtype)],
            compiler_params=_cparams(), interpret=interpret,
        )(y0, noise, t0s.reshape(-1, 1), dts.reshape(-1, 1), *fw, *hw, *gw)
        return ys, qs

    def bwd_impl(fw, hw, gw, y0, noise, t0s, dts, ys, gy, gq,
                 interpret=None):
        interpret = _INTERPRET if interpret is None else interpret
        N, B, _ = noise.shape
        gy = jnp.asarray(gy, dtype)
        # reverse-accumulated logqp cotangents (latent_fused methodology)
        ginc = jnp.cumsum(jnp.asarray(gq, dtype)[::-1], axis=0)[::-1]
        y_pre = jnp.concatenate([y0[None], ys[:-1]], axis=0)
        flip = lambda a: a[::-1]                          # noqa: E731
        full, step, smem, vmem = _specs(B)
        dw_shapes = ([jax.ShapeDtypeStruct(w.shape, dtype) for w in fw]
                     + [jax.ShapeDtypeStruct(w.shape, dtype) for w in hw]
                     + [jax.ShapeDtypeStruct(w.shape, dtype) for w in gw])
        out = pl.pallas_call(
            functools.partial(_euler_logqp_bwd_kernel, **kw),
            grid=(N,),
            in_specs=[step(S), step(S), smem, smem, step(S), step(1)]
            + [vmem] * (nf + nh + ng),
            out_specs=[full(S), step(S)] + [vmem] * (nf + nh + ng),
            out_shape=[jax.ShapeDtypeStruct((B, S), dtype),
                       jax.ShapeDtypeStruct((N, B, S), dtype)] + dw_shapes,
            scratch_shapes=[pltpu.VMEM((B, S), dtype)],
            compiler_params=_cparams(), interpret=interpret,
        )(flip(y_pre), flip(noise), flip(t0s).reshape(-1, 1),
          flip(dts).reshape(-1, 1), flip(gy), flip(ginc), *fw, *hw, *gw)
        dy0, dnoise_f = out[0], out[1]
        dfw = list(out[2:2 + nf])
        dhw = list(out[2 + nf:2 + nf + nh])
        dgw = list(out[2 + nf + nh:2 + nf + nh + ng])
        return dfw, dhw, dgw, dy0, flip(dnoise_f)

    @jax.custom_vjp
    def solve(fw, hw, gw, y0, noise, t0s, dts):
        return fwd_impl(fw, hw, gw, y0, noise, t0s, dts)

    def solve_fwd(fw, hw, gw, y0, noise, t0s, dts):
        ys, qs = fwd_impl(fw, hw, gw, y0, noise, t0s, dts)
        return (ys, qs), (fw, hw, gw, y0, noise, t0s, dts, ys)

    def solve_bwd(res, cots):
        fw, hw, gw, y0, noise, t0s, dts, ys = res
        gy, gq = cots
        dfw, dhw, dgw, dy0, dnoise = bwd_impl(fw, hw, gw, y0, noise, t0s,
                                              dts, ys, gy, gq)
        return (dfw, dhw, dgw, dy0, dnoise,
                jnp.zeros_like(t0s), jnp.zeros_like(dts))

    solve.defvjp(solve_fwd, solve_bwd)
    return solve


def fused_sdeint_logqp(drift, prior, diffusion, y0, ts, key, dt,
                       with_time=False, dispatch="auto"):
    """Whole-solve fused Euler logqp solve for MLP-tower SDEs: the generic
    form of the flagship latent-SDE path (SDELogqp semantics, reference
    base_sde.py:240-307 — ``u = stable_division(f - h, g)``, KL integrand
    ``0.5 |u|^2``). Diagonal noise only; all three towers see the same
    ``[t? | y]`` input row.

    Returns ``(ys, log_ratio)`` exactly like
    ``sdeint(sde, y0, ts, logqp=True, method='euler')``: ``ys`` on ``ts``,
    ``log_ratio`` the per-output-interval KL increments. The noise stream
    matches that call bitwise (the logqp augmentation makes the default bm
    size (B, d+1); the extra channel's increments are sampled-and-unused,
    same as the XLA path's zero diffusion row).
    """
    from ..core import integrate

    if dispatch not in ("auto", "fused", "xla"):
        raise ValueError("dispatch must be 'auto', 'fused' or 'xla'")

    # Validation + dtype contract BEFORE dispatch (same rationale as
    # fused_sdeint): 'auto' must be purely a performance choice.
    S = y0.shape[1]
    B = y0.shape[0]
    for spec, name in ((drift, "drift"), (prior, "prior"),
                       (diffusion, "diffusion")):
        _check_tower_io(spec, name, S, with_time, out_size=S)
    wdtype = drift.layers[0][0].dtype
    y0 = jnp.asarray(y0, wdtype)
    ts_np = np.asarray(ts, np.float64)
    grid = integrate.build_step_grid(ts_np[0], ts_np[-1], dt)
    idx = _grid_indices(grid, ts_np, "fused_sdeint_logqp")

    if dispatch == "fused" and wdtype != jnp.float32:
        raise ValueError(
            f"fused_sdeint_logqp kernels are float32-only (towers are "
            f"{wdtype}); use dispatch='xla'/'auto' or float32 towers")
    if dispatch == "xla" or (dispatch == "auto"
                             and (wdtype != jnp.float32
                                  or not _auto_fuse(drift, prior,
                                                    diffusion))):
        from ..core.sdeint import sdeint
        sde = tower_sde(drift, diffusion, "diagonal", "ito",
                        with_time=with_time, prior=prior)
        return sdeint(sde, y0, ts, method="euler", dt=dt, key=key,
                      logqp=True)

    # Default-bm parity: sdeint's logqp wrapper augments the state with one
    # KL channel, so its BrownianInterval has size (B, d+1).
    W, _, _ = integrate.sample_grid_noise(key, grid, (B, S + 1), wdtype)
    W = W[..., :S]

    fw, hw, gw = drift.pack(), prior.pack(), diffusion.pack()
    grid_dev = jnp.asarray(grid, wdtype)
    t_lo = grid_dev[:-1]
    dts = grid_dev[1:] - grid_dev[:-1]  # f32 subtraction, = integrate_fixed
    solve = _make_euler_logqp(drift.acts, prior.acts, diffusion.acts, S,
                              with_time, wdtype)
    ys_steps, qs_steps = solve(fw, hw, gw, y0, W, t_lo, dts)
    q0 = jnp.zeros((B, 1), wdtype)
    ys_full = jnp.concatenate([y0[None], ys_steps], axis=0)[idx]
    qs_full = jnp.concatenate([q0[None], qs_steps], axis=0)[idx, :, 0]
    return ys_full, qs_full[1:] - qs_full[:-1]
