"""Virtual Brownian motion on a dyadic tree with counter-based PRNG, all on device.

This is the TPU-native redesign of the reference's ``BrownianInterval``
(/root/reference/torchsde/_brownian/brownian_interval.py:129-786). The reference
builds a lazy host-side binary interval tree with an LRU cache of ``(W, H)``
values and per-node ``numpy.random.SeedSequence`` seeds; every query walks the
tree in Python, splitting nodes *exactly at the query times*
(brownian_interval.py:321-332). None of that works under ``jax.jit`` and all
of it serialises on the host.

Here the tree is *implicit and infinitely deep in principle*: a query
``(ta, tb)`` runs two descents of the dyadic tree entirely on device, one per
endpoint. Each descent maintains the running prefix increment ``W(t0, t)`` and
prefix time-integral ``I(t) = \\int_{t0}^{t} W_u du``, conditioning parent
``(W, H)`` into child halves with the exact Brownian-bridge (no-H case,
reference brownian_interval.py:226-238) and space-time-Levy-bridge (with-H
case, reference brownian_interval.py:199-225) laws specialised to midpoint
splits. Node noise comes from a *path-chained* counter PRNG:
``key(child) = jax.random.fold_in(key(parent), branch_bit)`` — the
counter-based analogue of the reference's
``SeedSequence(entropy, spawn_key=(2k+b, depth))`` (brownian_interval.py:317-339)
that works at any depth.

**Exact splits at arbitrary reals.** Every floating-point time is itself a
dyadic rational, so descending until the query time is resolved reproduces the
reference's exact-split contract at the granularity of the time representation:

* concrete (host) query times are resolved by successive exact float64
  midpoint comparisons down to at most ``levels`` (default 52 — the float64
  fractional resolution of the span: one leaf is ``span * 2**-52``, below one
  ulp of any time of magnitude ~span). Descents stop early at the depth the
  query times actually need, so dyadic step grids stay cheap;
* traced (on-device) query times use the same progressive midpoint
  comparisons in the widest available float dtype (float64 under x64, else
  float32 — in which case resolution bottoms out at the ulp of the on-device
  time values themselves, which is also the resolution limit of any float32
  solver time arithmetic).

Consequences of the design:

* **Bit-reproducible and query-order independent** — stronger than the
  reference default (its tree shape depends on query history unless
  ``halfway_tree=True``, brownian_interval.py:447-452). No cache, no
  dependency tree, no warm-up heuristics: every query is O(depth) with no
  host synchronisation, so both forward and backward solves are O(N log N).
* **Exact additivity**: ``W(ta,t) + W(t,tb) == W(ta,tb)`` because increments
  are differences of prefix values — the chain rule holds to prefix-sum
  floating-point cancellation, including for arbitrarily fine sub-steps (the
  adaptive-solver case the round-1 fixed-depth design degraded on). The
  analogous chain rule for the space-time Levy area holds to the same
  rounding.
* ``tol`` sets the dyadic resolution (leaf width) when given; ``levels``
  caps the descent depth (a speed knob: shallower trees quantise query times
  to ``span * 2**-levels``).
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
# One leaf at depth 52 is span * 2**-52 — the float64 fractional resolution of
# the span. Deeper levels cannot separate distinct float64 times of magnitude
# ~span, so 52 is "exact splits" for all representable query times.
_MAX_LEVELS = 52
_DEFAULT_LEVELS = 52


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

        # Jit-cached batched descents / whole queries for concrete
        # (host-resolved) calls, keyed by bucketed depth — see
        # _concrete_prefix / _concrete_query.
        self._cprefix_cache = {}
        self._cquery_cache = {}

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
    #  Host-side time resolution                                         #
    # ------------------------------------------------------------------ #

    def _host_bits(self, times):
        """Resolve concrete times into dyadic branch bits by successive exact
        midpoint comparisons in the *canonical* float dtype — float64 under
        x64, float32 otherwise. The traced path (:meth:`_prefix`) runs the
        identical comparisons on device in the same canonical dtype, so
        concrete and traced queries of one time agree bit-for-bit in BOTH x64
        modes (with x64 off, a float64 host descent could take a different
        branch than the float32 on-device descent for times within one float32
        ulp of a midpoint, giving the same interval different noise on the two
        paths).

        Returns ``(bits, starts, full)``: ``bits`` an ``(n, depth)`` int32
        matrix trimmed to the depth the times actually need, ``starts`` the
        quantised (floor) times in the canonical dtype, ``full`` the
        ``t >= t1`` mask.
        """
        ftype = np.dtype(jax.dtypes.canonicalize_dtype(jnp.float64))
        ft0 = ftype.type(self._t0)
        ft1 = ftype.type(self._t1)
        t = np.clip(np.asarray(times, ftype), ft0, ft1)
        full = t >= ft1
        # Full points descend trivially (all-left) and are patched with the
        # exact root statistics by the `full` flag — otherwise t1's all-ones
        # bit pattern would force every grid to maximum depth.
        t = np.where(full, ft0, t)
        n = t.shape[0]
        L = self._levels
        bits = np.zeros((n, L), np.int32)
        start = np.full(n, ft0, ftype)
        # Per-level half-widths match the device scan's: computed in float64
        # then cast (halving is exact, so iterating 0.5*width in ftype gives
        # the same values — but cast-from-f64 is what _prefix feeds the scan).
        span = float(self._t1) - float(self._t0)
        halves = (span * np.exp2(-np.arange(1, L + 1, dtype=np.float64))).astype(ftype)
        for level in range(L):
            mid = start + halves[level]
            # mid > start guards ulp saturation: once half underflows below
            # ulp(start) the time is fully resolved and all deeper bits are 0.
            b = (t >= mid) & (mid > start)
            bits[:, level] = b
            start = np.where(b, mid, start)
        # Trim to the needed depth: trailing all-zero levels change nothing.
        nz = np.nonzero(bits.any(axis=0))[0]
        depth = int(nz[-1]) + 1 if nz.size else 0
        return bits[:, :depth], start, full

    # ------------------------------------------------------------------ #
    #  Dyadic descent                                                    #
    # ------------------------------------------------------------------ #

    def _prefix(self, depth, bits=None, t=None, full=None):
        """Prefix statistics at a dyadic point of the tree.

        Exactly one of ``bits`` (a ``(depth,)`` int32 branch-bit vector,
        concrete path) or ``t`` (a traced scalar time, resolved on device by
        progressive midpoint comparison) drives the descent. Returns
        ``(w_pref, i_pref, start, words)`` with ``w_pref = W(t0, t_q)``,
        ``I_pref = \\int_{t0}^{t_q} (W_u - W_{t0}) du`` at the quantised time
        ``t_q``, ``start`` the quantised time, and ``words`` int32 packed
        branch bits (for keying per-interval Levy-area noise).

        The descent conditions each parent ``(W, H)`` into halves using the
        midpoint specialisation of the bridge laws in reference
        brownian_interval.py:199-238; node keys chain by branch bit.
        """
        dtype = self.dtype
        span = self._t1 - self._t0
        have_H = self._have_H
        zero = jnp.zeros(self._size, dtype)
        traced = bits is None

        ftype = jax.dtypes.canonicalize_dtype(jnp.float64)
        widths = span * np.exp2(-np.arange(depth, dtype=np.float64))
        hs_d = jnp.asarray(widths, dtype)
        sqrt_hs_d = jnp.asarray(np.sqrt(widths), dtype)
        halves_t = jnp.asarray(0.5 * widths, ftype)
        # Packed-bit weights: level i -> word i//30, bit position i%30.
        # The word COUNT is canonical — derived from self._levels, never from
        # the (context-dependent) trimmed descent depth — because the packed
        # words key the Levy-area noise via one fold_in per word
        # (_levy_area): a depth-dependent count would give the same interval
        # different A in different query contexts (shallow host-trimmed vs
        # traced full-depth descents). Trailing words stay zero for shallow
        # descents, matching the all-left deeper branches of a full-depth
        # descent of the same time.
        word_idx = np.arange(depth) // 30
        pow2 = jnp.asarray(1 << (np.arange(depth) % 30), jnp.int32)
        n_words = max(1, -(-int(self._levels) // 30))

        carry = dict(w_pref=zero, i_pref=zero,
                     w_node=self._W_root, h_node=self._H_root,
                     key=self._key_nodes,
                     words=jnp.zeros((n_words,), jnp.int32))
        if traced:
            t = jnp.asarray(t, ftype)
            carry["start"] = jnp.asarray(self._t0, ftype)

        if depth > 0:
            xs = dict(h=hs_d, sqrt_h=sqrt_hs_d,
                      word=jnp.asarray(word_idx, jnp.int32), pow2=pow2)
            if traced:
                xs["half"] = halves_t
            else:
                xs["bit"] = jnp.asarray(bits, jnp.int32)

            def body(c, x):
                if traced:
                    mid = c["start"] + x["half"]
                    # mid > start guards ulp saturation: once the half-width
                    # underflows below ulp(start), t is fully resolved and all
                    # deeper branches go left (a deterministic no-op).
                    bit = jnp.logical_and(t >= mid, mid > c["start"]).astype(jnp.int32)
                else:
                    bit = x["bit"]
                h, sqrt_h = x["h"], x["sqrt_h"]
                hl = 0.5 * h
                if have_H:
                    xs2 = jax.random.normal(c["key"], (2, *self._size), dtype)
                    x1, x2 = xs2[0], xs2[1]
                    # Midpoint split of (W, H): left_diff == right_diff == h/2
                    # in the general bridge of reference
                    # brownian_interval.py:199-225 gives
                    #   W_l = W/2 + (3/2) H + (sqrt(h)/4) X1
                    #   H_l = H/4 - (sqrt(h)/8) X1 + (sqrt(h)/(4 sqrt 3)) X2
                    #   W_r = W - W_l
                    #   H_r = H/4 - (sqrt(h)/8) X1 - (sqrt(h)/(4 sqrt 3)) X2
                    w_left = 0.5 * c["w_node"] + 1.5 * c["h_node"] + (0.25 * sqrt_h) * x1
                    h_common = 0.25 * c["h_node"] - (0.125 * sqrt_h) * x1
                    h_anti = (0.25 * _RSQRT3) * sqrt_h * x2
                    h_left = h_common + h_anti
                    h_right = h_common - h_anti
                    w_right = c["w_node"] - w_left
                else:
                    # Plain Brownian bridge at the midpoint: W_l ~ N(W/2, h/4)
                    # (reference brownian_interval.py:226-238, equal halves).
                    x1 = jax.random.normal(c["key"], self._size, dtype)
                    w_left = 0.5 * c["w_node"] + (0.5 * sqrt_h) * x1
                    w_right = c["w_node"] - w_left
                    h_left = zero
                    h_right = zero

                go_right = bit == 1
                # When moving right we pass over the left child: accumulate its
                # increment and its contribution to the prefix time-integral
                #   \int_s^m W_u du = hl * W(s) + hl * (W_l / 2 + H_l).
                u_left = hl * (0.5 * w_left + h_left)
                new = dict(
                    i_pref=jnp.where(go_right,
                                     c["i_pref"] + hl * c["w_pref"] + u_left,
                                     c["i_pref"]),
                    w_pref=jnp.where(go_right, c["w_pref"] + w_left, c["w_pref"]),
                    w_node=jnp.where(go_right, w_right, w_left),
                    h_node=jnp.where(go_right, h_right, h_left) if have_H else zero,
                    key=jax.random.fold_in(c["key"], bit),
                    words=c["words"].at[x["word"]].add(bit * x["pow2"]),
                )
                if traced:
                    new["start"] = jnp.where(go_right, c["start"] + x["half"],
                                             c["start"])
                return new, None

            carry, _ = jax.lax.scan(body, carry, xs)

        # full == True is the right edge of the root: the descent walks
        # all-left for that bit pattern, so patch in the exact full-interval
        # statistics instead.
        if traced:
            full = t >= jnp.asarray(self._t1, ftype)
            start = jnp.where(full, jnp.asarray(self._t1, ftype), carry["start"])
        else:
            start = None  # host-side caller already has exact starts
        i_full = span * (0.5 * self._W_root + self._H_root)
        w_pref = jnp.where(full, self._W_root, carry["w_pref"])
        i_pref = jnp.where(full, i_full, carry["i_pref"])
        words = jnp.where(full,
                          jnp.full_like(carry["words"], jnp.int32(-1)),
                          carry["words"])
        return w_pref, i_pref, start, words

    # ------------------------------------------------------------------ #
    #  Query                                                             #
    # ------------------------------------------------------------------ #

    def _bucket_bits(self, bits):
        """Pad a trimmed ``(n, depth)`` branch-bit matrix up to the next
        multiple-of-8 depth bucket (capped at ``levels``). Trailing zero bits
        descend left, which changes none of the descent outputs
        (``w_pref``/``i_pref``/``words`` only accumulate on right-branches),
        so padding is exact — and it bounds the number of distinct compiled
        programs per sampler to O(levels/8) (``ceil(levels/8) + 1`` counting
        the depth-0 bucket, plus one more when ``levels`` is not a multiple
        of 8). Shared by :meth:`_concrete_prefix` and :meth:`_concrete_query`
        so both caches use identical bucket semantics."""
        depth = bits.shape[1]
        bucket = min(self._levels, -(-depth // 8) * 8) if depth else 0
        if bucket > depth:
            bits = np.pad(np.asarray(bits), ((0, 0), (0, bucket - depth)))
        return bits, bucket

    def _concrete_prefix(self, bits, full):
        """Batched descent for host-resolved queries, jitted and cached per
        depth bucket (see :meth:`_bucket_bits`). ``bits`` is the ``(n, depth)``
        trimmed branch-bit matrix from :meth:`_host_bits`."""
        bits, bucket = self._bucket_bits(bits)
        fn = self._cprefix_cache.get(bucket)
        if fn is None:
            fn = jax.jit(jax.vmap(
                lambda b, f: self._prefix(bucket, bits=b, full=f)))
            self._cprefix_cache[bucket] = fn
        return fn(jnp.asarray(bits), jnp.asarray(full))

    def _pair_stats(self, w_prefs, i_prefs, words, h, degenerate,
                    with_A=True):
        """Shared tail of a two-point query: interval statistics from the two
        prefix descents. Returns ``(W, U, A, H)`` (``U``/``A``/``H`` are
        ``None`` unless the sampler carries them / ``with_A``). ``with_A=False``
        skips the Lévy-area draw so a caller can compute A *eagerly* outside a
        jitted program (the concrete path must: XLA FMA-contracts the
        ``H⊗W − W⊗H`` chain inside jit, which would break bitwise agreement
        with :meth:`query_grid`'s eager A — advisor finding r4)."""
        w_a, i_a = w_prefs[0], i_prefs[0]
        w_b, i_b = w_prefs[1], i_prefs[1]

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
        if self._have_A and with_A:
            A = self._levy_area(words[0], words[1], W, H, h, degenerate)

        U_out = None
        if self._have_H:
            U_out = h * (0.5 * W + H)
        return W, U_out, A, H

    def _concrete_query(self, bits, full, h, degenerate):
        """Two-point query with the descents + W/U statistics as ONE cached
        jitted program, bucketed by depth via :meth:`_bucket_bits`, so an
        eager ``bm(ta, tb)`` call costs one device dispatch instead of an
        op-by-op re-trace. The full Lévy area A is computed *eagerly* from the
        returned branch words — deliberately outside the jitted program, so
        its ``H⊗W − W⊗H`` arithmetic rounds op-by-op exactly like
        :meth:`query_grid`'s eager path and the query-context-independence
        contract (PARITY.md) stays bitwise."""
        bits, bucket = self._bucket_bits(bits)
        fn = self._cquery_cache.get(bucket)
        if fn is None:
            def _q(bits, full, h, degenerate):
                w_prefs, i_prefs, _, words = jax.vmap(
                    lambda b, f: self._prefix(bucket, bits=b, full=f)
                )(bits, full)
                W, U_out, _, H = self._pair_stats(w_prefs, i_prefs, words, h,
                                                  degenerate, with_A=False)
                return W, U_out, H, words
            fn = jax.jit(_q)
            self._cquery_cache[bucket] = fn
        W, U_out, H, words = fn(jnp.asarray(bits), jnp.asarray(full), h,
                                degenerate)
        A = None
        if self._have_A:
            A = self._levy_area(words[0], words[1], W, H, h, degenerate)
        return W, U_out, A

    def __call__(self, ta, tb=None, return_U=False, return_A=False):
        if tb is None:
            warnings.warn(f"{self.__class__.__name__} is optimised for interval-based "
                          f"queries, not point evaluation.")
            ta, tb = self._t0, ta

        dtype = self.dtype
        if _is_concrete_scalar(ta) and _is_concrete_scalar(tb):
            fa, fb = float(ta), float(tb)
            if fa < self._t0 or fb < self._t0:
                warnings.warn(f"Query times should be >= t0={self._t0}; clamping.")
            if fa > self._t1 or fb > self._t1:
                warnings.warn(f"Query times should be <= t1={self._t1}; clamping.")
            if fa > fb:
                raise RuntimeError(f"Query times ta={fa:.3f} and tb={fb:.3f} must "
                                   f"respect ta <= tb.")
            bits, starts, full = self._host_bits(np.asarray([fa, fb]))
            eff = np.where(full, self._t1, starts)
            h_exact = float(eff[1] - eff[0])
            W, U_out, A = self._concrete_query(
                bits, full, jnp.asarray(h_exact, dtype),
                jnp.asarray(h_exact == 0.0))
        else:
            ftype = jax.dtypes.canonicalize_dtype(jnp.float64)
            ta = jnp.clip(jnp.asarray(ta, ftype), self._t0, self._t1)
            tb = jnp.clip(jnp.asarray(tb, ftype), self._t0, self._t1)
            tb = jnp.maximum(ta, tb)
            depth = self._levels
            w_prefs, i_prefs, starts, words = jax.vmap(
                lambda t: self._prefix(depth, t=t)
            )(jnp.stack([ta, tb]))
            h = (starts[1] - starts[0]).astype(dtype)
            degenerate = starts[1] == starts[0]
            W, U_out, A, _ = self._pair_stats(w_prefs, i_prefs, words, h,
                                              degenerate)

        if return_U and return_A:
            return W, U_out, A
        if return_U:
            return W, U_out
        if return_A:
            return W, A
        return W

    def query_pairs(self, points, pairs, return_U=False, return_A=False):
        """Traced multi-interval query sharing ONE dyadic descent per point.

        ``points`` is a 1-D (possibly traced) array of times; ``pairs`` a
        static sequence of ``(ia, ib)`` index pairs with
        ``points[ia] <= points[ib]``. Returns one result per pair in
        ``__call__``'s output format. Bitwise identical to querying each
        pair through ``__call__`` — every increment is a difference of the
        same per-point prefix statistics, and the Lévy-area key depends only
        on the two endpoints' branch words — but runs ``len(points)``
        descents instead of ``2 * len(pairs)``. This is the adaptive
        integrator's hot path: one step attempt needs (t, t+h), (t, tm),
        (tm, t+h) — three pairs over three unique points, so 3 descents
        instead of 6.
        """
        ftype = jax.dtypes.canonicalize_dtype(jnp.float64)
        pts = jnp.clip(jnp.asarray(points, ftype), self._t0, self._t1)
        depth = self._levels
        dtype = self.dtype
        w_prefs, i_prefs, starts, words = jax.vmap(
            lambda t: self._prefix(depth, t=t))(pts)

        out = []
        for ia, ib in pairs:
            w_a, i_a = w_prefs[ia], i_prefs[ia]
            w_b, i_b = w_prefs[ib], i_prefs[ib]
            h = (starts[ib] - starts[ia]).astype(dtype)
            # <= (not ==): an inverted pair clamps to the degenerate zero
            # result, matching __call__'s tb = max(ta, tb) semantics rather
            # than returning sign-flipped statistics
            degenerate = starts[ib] <= starts[ia]
            W = w_b - w_a
            H = None
            if self._have_H:
                U = i_b - i_a - h * w_a
                h_safe = jnp.where(degenerate, jnp.ones_like(h), h)
                H = jnp.where(degenerate, jnp.zeros_like(U),
                              U / h_safe - 0.5 * W)
            W = jnp.where(degenerate, jnp.zeros_like(W), W)
            A = None
            if self._have_A:
                A = self._levy_area(words[ia], words[ib], W, H, h, degenerate)
            U_out = h * (0.5 * W + H) if self._have_H else None
            res = [W]
            if return_U:
                res.append(U_out)
            if return_A:
                res.append(A)
            out.append(res[0] if len(res) == 1 else tuple(res))
        return out

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
        bits, starts, full = self._host_bits(grid)
        w_prefs, i_prefs, _, words = self._concrete_prefix(bits, full)

        dtype = self.dtype
        eff = np.where(full, self._t1, starts)
        h_host = np.diff(eff)
        degenerate = h_host == 0.0
        bshape = (-1,) + (1,) * len(self._size)
        h_b = jnp.asarray(h_host, dtype).reshape(bshape)
        deg_b = jnp.asarray(degenerate).reshape(bshape)

        W = w_prefs[1:] - w_prefs[:-1]
        H = None
        if self._have_H:
            U = i_prefs[1:] - i_prefs[:-1] - h_b * w_prefs[:-1]
            h_safe = jnp.where(deg_b, jnp.ones_like(h_b), h_b)
            H = jnp.where(deg_b, jnp.zeros_like(U), U / h_safe - 0.5 * W)
        W = jnp.where(deg_b, jnp.zeros_like(W), W)

        A = None
        if self._have_A and return_A:
            A = jax.vmap(self._levy_area)(
                words[:-1], words[1:], W, H,
                jnp.asarray(h_host, dtype), jnp.asarray(degenerate))

        U_out = h_b * (0.5 * W + H) if (self._have_H and return_U) else None
        return W, (U_out if return_U else None), (A if return_A else None)

    def _levy_area(self, words_a, words_b, W, H, h, degenerate):
        """Davie/Foster approximation of full Levy area over the queried cell
        (reference brownian_interval.py:78-99), with antisymmetric noise keyed
        by the packed branch bits of the two endpoints."""
        dtype = self.dtype
        if len(self._size) in (0, 1):
            # Zero- or one-dimensional size: treated as a batch of scalar
            # Brownian motions, whose Levy area is identically zero.
            return jnp.zeros_like(W)
        m = self._size[-1]
        noise_shape = (*self._size, m)
        key = self._key_a
        for w in list(words_a) + list(words_b):
            key = jax.random.fold_in(key, w)
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
        # The diagonal is exactly zero by skew symmetry (noise is
        # skew-symmetrised too); enforce it so jit — which may fuse
        # H_i*W_i - W_i*H_i into an FMA with a ~1-ulp residual — agrees
        # bitwise with eager queries.
        A = A * (1.0 - jnp.eye(m, dtype=dtype))
        return jnp.where(degenerate, jnp.zeros_like(A), A)


def brownian_interval_like(y, t0=0.0, t1=1.0, size=None, dtype=None, **kwargs):
    """A BrownianInterval with the same size/dtype as a given array
    (reference derived.py:194-205)."""
    size = tuple(y.shape) if size is None else size
    dtype = y.dtype if dtype is None else dtype
    return BrownianInterval(t0=t0, t1=t1, size=size, dtype=dtype, **kwargs)
