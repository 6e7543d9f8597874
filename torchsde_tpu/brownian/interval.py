"""Virtual Brownian motion on a dyadic tree with counter-based PRNG, all on device.

This is the TPU-native redesign of the reference's ``BrownianInterval``
(/root/reference/torchsde/_brownian/brownian_interval.py:129-786). The reference
builds a lazy host-side binary interval tree with an LRU cache of ``(W, H)``
values and per-node ``numpy.random.SeedSequence`` seeds; every query walks the
tree in Python. None of that works under ``jax.jit`` and all of it serialises
on the host.

Here the tree is *implicit*: query times are quantised to a dyadic grid of
``2**levels`` leaves, and a query ``(ta, tb)`` runs two fixed-depth descents of
the dyadic tree entirely on device. Each descent maintains the running prefix
increment ``W(t0, t)`` and prefix time-integral ``I(t) = \\int_{t0}^{t} W_u du``,
conditioning parent ``(W, H)`` into child halves with the exact Brownian-bridge
(no-H case, reference brownian_interval.py:226-238) and space-time-Levy-bridge
(with-H case, reference brownian_interval.py:199-225) laws specialised to
midpoint splits. Node noise comes from ``jax.random.fold_in`` on the node's
heap index — the counter-based analogue of the reference's
``SeedSequence(entropy, spawn_key=(2k+b, depth))`` (brownian_interval.py:317-339).

Consequences of the design:

* **Bit-reproducible and query-order independent** — equivalent to the
  reference's ``halfway_tree=True`` semantics (brownian_interval.py:447-452),
  which is also what ``BrownianTree`` provides. There is no cache, no
  dependency tree and no warm-up heuristics: every query is O(levels) with no
  host synchronisation, so both forward and backward solves are O(N log N).
* **Exact additivity**: ``W(ta,t) + W(t,tb) == W(ta,tb)`` because increments
  are differences of prefix values — the chain rule holds to prefix-sum
  floating-point cancellation (absolute error ~eps * |prefix|, i.e. exact for
  all practical purposes even for leaf-width queries). The analogous chain
  rule for the space-time Levy area holds to the same rounding.
* ``tol`` sets the dyadic resolution (leaf width); default resolution is
  ``2**-20`` of the interval span, matching ``BrownianTree``'s default
  ``tol=1e-6`` on a unit interval.
* Full Levy area ``A`` uses Davie's / Foster's approximation
  (brownian_interval.py:78-99) with antisymmetric noise keyed per queried
  interval.

``dt``, ``cache_size``, ``pool_size`` and ``halfway_tree`` are accepted for API
compatibility but are no-ops: the data structure they tune does not exist here.
"""

import math
import warnings

import jax
import jax.numpy as jnp
import numpy as np

from . import base
from ..settings import LEVY_AREA_APPROXIMATIONS

_RSQRT3 = 1.0 / math.sqrt(3.0)
# Leaf-edge indices must stay < 2**31 so heap ids fit `jax.random.fold_in`'s
# 32-bit counter; index arithmetic itself is done in float64 (on host for
# concrete times, on device when x64 is enabled), so 30 levels are exact.
_MAX_LEVELS = 30
_DEFAULT_LEVELS = 20


def _is_concrete_scalar(x):
    if isinstance(x, (int, float)):
        return True
    if isinstance(x, (np.ndarray, np.generic)):
        return True
    if isinstance(x, jax.Array):
        return not isinstance(x, jax.core.Tracer)
    return False


class BrownianInterval(base.BaseBrownian):
    """Queryable virtual Brownian motion: ``bm(ta, tb) -> W(tb) - W(ta)``."""

    def __init__(self,
                 t0=0.0,
                 t1=1.0,
                 size=None,
                 dtype=None,
                 entropy=None,
                 key=None,
                 dt=None,
                 tol=0.0,
                 pool_size=8,
                 cache_size=45,
                 halfway_tree=False,
                 levy_area_approximation=LEVY_AREA_APPROXIMATIONS.none,
                 levels=None,
                 W=None,
                 H=None,
                 device=None):
        del dt, pool_size, cache_size, halfway_tree, device  # API parity; unused here.
        t0 = float(t0)
        t1 = float(t1)
        if t0 >= t1:
            raise ValueError(f"Initial time {t0} should be less than terminal time {t1}.")
        if levy_area_approximation not in LEVY_AREA_APPROXIMATIONS:
            raise ValueError(
                f"`levy_area_approximation` must be one of {LEVY_AREA_APPROXIMATIONS}, "
                f"but got '{levy_area_approximation}'.")

        if size is None:
            for tensor in (W, H):
                if tensor is not None:
                    size = tuple(tensor.shape)
                    break
        if size is None:
            raise ValueError("Must either specify `size` or pass in `W` or `H` to "
                             "implicitly define the size.")
        size = tuple(int(s) for s in size)
        if dtype is None:
            dtype = W.dtype if W is not None else (H.dtype if H is not None else jnp.float32)
        dtype = jnp.dtype(dtype)

        if levels is None:
            if tol and tol > 0.0:
                levels = max(0, min(_MAX_LEVELS, int(math.ceil(math.log2((t1 - t0) / tol)))))
            else:
                levels = _DEFAULT_LEVELS
        levels = int(levels)
        if not (0 <= levels <= _MAX_LEVELS):
            raise ValueError(f"`levels` must be in [0, {_MAX_LEVELS}], got {levels}.")

        if key is None:
            if entropy is None:
                entropy = int(np.random.randint(0, 2 ** 31 - 1))
            key = jax.random.PRNGKey(int(entropy))
        self._key = key
        self._entropy = entropy

        self._t0 = t0
        self._t1 = t1
        self._size = size
        self._dtype_str = str(dtype)
        self._levels = levels
        self._tol = float(tol)
        self._levy_area_approximation = levy_area_approximation

        have_H = levy_area_approximation in (LEVY_AREA_APPROXIMATIONS.space_time,
                                             LEVY_AREA_APPROXIMATIONS.davie,
                                             LEVY_AREA_APPROXIMATIONS.foster)
        self._have_H = have_H
        self._have_A = levy_area_approximation in (LEVY_AREA_APPROXIMATIONS.davie,
                                                   LEVY_AREA_APPROXIMATIONS.foster)

        # Root increment / space-time Levy area over [t0, t1]
        # (reference brownian_interval.py:550-561).
        span = t1 - t0
        key_w, key_h, self._key_nodes, self._key_a = jax.random.split(key, 4)
        if W is None:
            W = jax.random.normal(key_w, size, dtype) * math.sqrt(span)
        else:
            W = jnp.asarray(W, dtype)
        if H is None:
            if have_H:
                H = jax.random.normal(key_h, size, dtype) * math.sqrt(span / 12.0)
            else:
                H = jnp.zeros(size, dtype)
        else:
            H = jnp.asarray(H, dtype)
        self._W_root = W
        self._H_root = H

    # ------------------------------------------------------------------ #
    #  Properties (API parity with the reference)                        #
    # ------------------------------------------------------------------ #

    @property
    def dtype(self):
        return jnp.dtype(self._dtype_str)

    @property
    def shape(self):
        return self._size

    @property
    def levy_area_approximation(self):
        return self._levy_area_approximation

    @property
    def entropy(self):
        return self._entropy

    @property
    def levels(self):
        return self._levels

    @property
    def tol(self):
        return self._tol

    @property
    def t0(self):
        return self._t0

    @property
    def t1(self):
        return self._t1

    def __repr__(self):
        return (f"{self.__class__.__name__}(t0={self._t0:.3f}, t1={self._t1:.3f}, "
                f"size={self._size}, dtype={self._dtype_str}, entropy={self._entropy}, "
                f"levels={self._levels}, "
                f"levy_area_approximation={self._levy_area_approximation!r})")

    # ------------------------------------------------------------------ #
    #  Dyadic descent                                                    #
    # ------------------------------------------------------------------ #

    def _time_to_index(self, t):
        """Quantise a time to an integer dyadic leaf-edge index in [0, 2**levels].

        The index arithmetic runs in float64: on the host when ``t`` is
        concrete (the common case — step grids are built host-side), and on
        device when x64 is enabled. The reference splits its host tree exactly
        at arbitrary real query points (brownian_interval.py:321-330); float32
        index math would misquantise times closer than span * 2**-24.
        """
        span = self._t1 - self._t0
        n_leaves = 1 << self._levels
        if _is_concrete_scalar(t):
            k = int(round((float(t) - self._t0) / span * n_leaves))
            return jnp.asarray(min(max(k, 0), n_leaves), jnp.int32)
        ftype = jax.dtypes.canonicalize_dtype(jnp.float64)
        frac = (jnp.asarray(t, ftype) - self._t0) / span
        k = jnp.round(frac * n_leaves).astype(jnp.int32)
        return jnp.clip(k, 0, n_leaves)

    def _prefix(self, k):
        """Prefix statistics at dyadic index ``k``.

        Returns ``(W_pref, I_pref)`` with ``W_pref = W(t0, t_k)`` and
        ``I_pref = \\int_{t0}^{t_k} (W_u - W_{t0}) du``, where
        ``t_k = t0 + k * span / 2**levels``. The descent conditions each
        parent ``(W, H)`` into halves using the midpoint specialisation of the
        bridge laws in reference brownian_interval.py:199-238.
        """
        dtype = self.dtype
        levels = self._levels
        span = self._t1 - self._t0
        have_H = self._have_H
        zero = jnp.zeros(self._size, dtype)

        w_pref, i_pref = zero, zero
        w_node, h_node = self._W_root, self._H_root
        node_idx = jnp.int32(0)
        for level in range(levels):
            h = span / (2.0 ** level)          # width of the current node
            hl = 0.5 * h                       # width of each child
            sqrt_h = math.sqrt(h)
            bit = (k >> (levels - 1 - level)) & 1

            heap_id = (1 << level) + node_idx
            key_node = jax.random.fold_in(self._key_nodes, heap_id)

            if have_H:
                xs = jax.random.normal(key_node, (2, *self._size), dtype)
                x1, x2 = xs[0], xs[1]
                # Midpoint split of (W, H): left_diff == right_diff == h/2 in the
                # general bridge of reference brownian_interval.py:199-225 gives
                #   W_l = W/2 + (3/2) H + (sqrt(h)/4) X1
                #   H_l = H/4 - (sqrt(h)/8) X1 + (sqrt(h)/(4 sqrt 3)) X2
                #   W_r = W - W_l
                #   H_r = H/4 - (sqrt(h)/8) X1 - (sqrt(h)/(4 sqrt 3)) X2
                w_left = 0.5 * w_node + 1.5 * h_node + (0.25 * sqrt_h) * x1
                h_common = 0.25 * h_node - (0.125 * sqrt_h) * x1
                h_anti = (0.25 * sqrt_h * _RSQRT3) * x2
                h_left = h_common + h_anti
                h_right = h_common - h_anti
                w_right = w_node - w_left
            else:
                # Plain Brownian bridge at the midpoint: W_l ~ N(W/2, h/4)
                # (reference brownian_interval.py:226-238 with equal halves).
                x1 = jax.random.normal(key_node, self._size, dtype)
                w_left = 0.5 * w_node + (0.5 * sqrt_h) * x1
                w_right = w_node - w_left
                h_left = zero
                h_right = zero

            go_right = bit == 1
            # When moving right we pass over the left child: accumulate its
            # increment and its contribution to the prefix time-integral
            #   \int_s^m W_u du = hl * W(s) + hl * (W_l / 2 + H_l).
            u_left = hl * (0.5 * w_left + h_left)
            i_pref = jnp.where(go_right, i_pref + hl * w_pref + u_left, i_pref)
            w_pref = jnp.where(go_right, w_pref + w_left, w_pref)
            w_node = jnp.where(go_right, w_right, w_left)
            if have_H:
                h_node = jnp.where(go_right, h_right, h_left)
            node_idx = 2 * node_idx + bit

        # k == 2**levels is the right edge of the root: the loop above walks
        # all-left for that bit pattern, so patch in the exact full-interval
        # statistics instead.
        full = k == (1 << levels)
        i_full = span * (0.5 * self._W_root + self._H_root)
        w_pref = jnp.where(full, self._W_root, w_pref)
        i_pref = jnp.where(full, i_full, i_pref)
        return w_pref, i_pref

    # ------------------------------------------------------------------ #
    #  Query                                                             #
    # ------------------------------------------------------------------ #

    def __call__(self, ta, tb=None, return_U=False, return_A=False):
        if tb is None:
            warnings.warn(f"{self.__class__.__name__} is optimised for interval-based "
                          f"queries, not point evaluation.")
            ta, tb = self._t0, ta

        if _is_concrete_scalar(ta) and _is_concrete_scalar(tb):
            fa, fb = float(ta), float(tb)
            if fa < self._t0 or fb < self._t0:
                warnings.warn(f"Query times should be >= t0={self._t0}; clamping.")
            if fa > self._t1 or fb > self._t1:
                warnings.warn(f"Query times should be <= t1={self._t1}; clamping.")
            if fa > fb:
                raise RuntimeError(f"Query times ta={fa:.3f} and tb={fb:.3f} must "
                                   f"respect ta <= tb.")

        ka = self._time_to_index(ta)
        kb = self._time_to_index(tb)
        kb = jnp.maximum(ka, kb)

        w_prefs, i_prefs = jax.vmap(self._prefix)(jnp.stack([ka, kb]))
        w_a, i_a = w_prefs[0], i_prefs[0]
        w_b, i_b = w_prefs[1], i_prefs[1]

        dtype = self.dtype
        span = self._t1 - self._t0
        leaf = span / (1 << self._levels)
        h = ((kb - ka).astype(dtype)) * leaf
        degenerate = kb == ka

        W = w_b - w_a
        H = None
        if self._have_H:
            # U_{a,b} = \int_a^b (W_u - W_a) du = I(b) - I(a) - h W(t0,a);
            # H_{a,b} = U/h - W/2 (reference _H_to_U inverse, brownian_interval.py:102-103).
            U = i_b - i_a - h * w_a
            h_safe = jnp.where(degenerate, jnp.ones_like(h), h)
            H = jnp.where(degenerate, jnp.zeros_like(U), U / h_safe - 0.5 * W)
        W = jnp.where(degenerate, jnp.zeros_like(W), W)

        A = None
        if self._have_A:
            A = self._levy_area(ka, kb, W, H, h, degenerate)

        U_out = None
        if self._have_H:
            U_out = h * (0.5 * W + H)

        if return_U and return_A:
            return W, U_out, A
        if return_U:
            return W, U_out
        if return_A:
            return W, A
        return W

    def query_grid(self, grid, return_U=False, return_A=False):
        """Bulk query of all ``len(grid) - 1`` consecutive increments in one pass.

        ``grid`` is a host-side 1-D array of strictly increasing times. Returns
        ``(W, U, A)`` with leading dimension ``len(grid) - 1`` (``U``/``A`` are
        ``None`` unless requested). Bitwise identical to querying each
        ``(grid[i], grid[i+1])`` pair through ``__call__``, but the dyadic
        descents run once per grid *point* (vmapped) instead of twice per grid
        *pair*, and entirely outside any solver scan — this is the fast path
        for fixed-step solves with an explicit BrownianInterval (the reference
        instead amortises repeated queries with a host-side LRU cache,
        brownian_interval.py:517-522).
        """
        grid = np.asarray(grid, np.float64)
        span = self._t1 - self._t0
        n_leaves = 1 << self._levels
        ks = np.clip(np.round((grid - self._t0) / span * n_leaves), 0, n_leaves)
        ks = jnp.asarray(ks.astype(np.int32))

        w_prefs, i_prefs = jax.vmap(self._prefix)(ks)
        ka, kb = ks[:-1], ks[1:]
        dtype = self.dtype
        leaf = span / n_leaves
        h = (kb - ka).astype(dtype) * leaf
        degenerate = kb == ka
        bshape = (-1,) + (1,) * len(self._size)
        h_b = h.reshape(bshape)
        deg_b = degenerate.reshape(bshape)

        W = w_prefs[1:] - w_prefs[:-1]
        H = None
        if self._have_H:
            U = i_prefs[1:] - i_prefs[:-1] - h_b * w_prefs[:-1]
            h_safe = jnp.where(deg_b, jnp.ones_like(h_b), h_b)
            H = jnp.where(deg_b, jnp.zeros_like(U), U / h_safe - 0.5 * W)
        W = jnp.where(deg_b, jnp.zeros_like(W), W)

        A = None
        if self._have_A and return_A:
            A = jax.vmap(self._levy_area)(ka, kb, W, H, h, degenerate)

        U_out = h_b * (0.5 * W + H) if (self._have_H and return_U) else None
        return W, (U_out if return_U else None), (A if return_A else None)

    def _levy_area(self, ka, kb, W, H, h, degenerate):
        """Davie/Foster approximation of full Levy area over the queried cell
        (reference brownian_interval.py:78-99), with antisymmetric noise keyed
        by the quantised interval endpoints."""
        dtype = self.dtype
        if len(self._size) in (0, 1):
            # Zero- or one-dimensional size: treated as a batch of scalar
            # Brownian motions, whose Levy area is identically zero.
            return jnp.zeros_like(W)
        m = self._size[-1]
        noise_shape = (*self._size, m)
        key = jax.random.fold_in(jax.random.fold_in(self._key_a, ka), kb)
        noise = jax.random.normal(key, noise_shape, dtype)
        noise = noise - jnp.swapaxes(noise, -1, -2)  # skew symmetric, variance 2
        A = H[..., :, None] * W[..., None, :] - W[..., :, None] * H[..., None, :]
        if self._levy_area_approximation == LEVY_AREA_APPROXIMATIONS.foster:
            tenth_h = 0.1 * h
            H_sq = jnp.square(H)
            std = jnp.sqrt(tenth_h * (tenth_h + H_sq[..., :, None] + H_sq[..., None, :]))
        else:  # davie
            std = jnp.sqrt(h * h / 12.0)
        A = A + std * noise
        return jnp.where(degenerate, jnp.zeros_like(A), A)


def brownian_interval_like(y, t0=0.0, t1=1.0, size=None, dtype=None, **kwargs):
    """A BrownianInterval with the same size/dtype as a given array
    (reference derived.py:194-205)."""
    size = tuple(y.shape) if size is None else size
    dtype = y.dtype if dtype is None else dtype
    return BrownianInterval(t0=t0, t1=t1, size=size, dtype=dtype, **kwargs)
