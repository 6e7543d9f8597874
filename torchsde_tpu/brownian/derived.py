"""Derived Brownian motions (parity with /root/reference/torchsde/_brownian/derived.py).

``BrownianPath`` and ``BrownianTree`` were host-cache tuning knobs in the
reference (store-everything vs. query-order-independent tree). Our
``BrownianInterval`` is already cache-free, bit-reproducible and
query-order-independent, so both become thin wrappers that only add the
``w0`` offset / endpoint-pinning semantics of the originals.
"""

import jax.numpy as jnp
import numpy as np

from . import base
from .interval import BrownianInterval


class ReverseBrownian(base.BaseBrownian):
    """Time-reversal wrapper used by the adjoint solve
    (reference derived.py:22-49): ``rev(ta, tb) == base(-tb, -ta)``.

    The adjoint SDE returns negated drift/diffusion, so no negation of the
    statistics happens here.
    """

    def __init__(self, base_brownian):
        self.base_brownian = base_brownian

    def __call__(self, ta, tb=None, return_U=False, return_A=False):
        return self.base_brownian(-tb, -ta, return_U=return_U, return_A=return_A)

    def query_grid(self, grid, return_U=False, return_A=False):
        """Reversed-grid bulk query: interval ``i`` of a reversed grid maps to
        forward interval ``N-1-i`` of the negated, order-reversed grid."""
        fwd = -np.asarray(grid, np.float64)[::-1]
        W, U, A = self.base_brownian.query_grid(fwd, return_U=return_U,
                                                return_A=return_A)
        flip = lambda x: None if x is None else x[::-1]  # noqa: E731
        return flip(W), flip(U), flip(A)

    def query_pairs(self, points, pairs, return_U=False, return_A=False):
        """Shared-descent multi-pair query: ``rev`` interval
        ``(points[ia], points[ib])`` is forward interval ``(-tb, -ta)``, so
        negate the points and swap each pair's indices. Duck-typed bases
        without ``query_pairs`` (PrecomputedBrownian, custom samplers) fall
        back to per-pair calls — same results, one descent per pair. Inverted
        pairs (points[ia] > points[ib]) are clamped to zero-width here,
        mirroring BrownianInterval's ``tb = max(ta, tb)`` semantics, since a
        ``__call__``-only base may not enforce that contract itself."""
        if not hasattr(self.base_brownian, "query_pairs"):
            points = jnp.asarray(points)
            outs = []
            for ia, ib in pairs:
                ta = points[ia]
                tb = jnp.maximum(ta, points[ib])
                outs.append(self(ta, tb, return_U=return_U, return_A=return_A))
            return outs
        return self.base_brownian.query_pairs(
            -jnp.asarray(points), [(ib, ia) for ia, ib in pairs],
            return_U=return_U, return_A=return_A)

    def __repr__(self):
        return f"{self.__class__.__name__}(base_brownian={self.base_brownian})"

    @property
    def dtype(self):
        return self.base_brownian.dtype

    @property
    def shape(self):
        return self.base_brownian.shape

    @property
    def levy_area_approximation(self):
        return self.base_brownian.levy_area_approximation


class BrownianPath(base.BaseBrownian):
    """Brownian path supporting point evaluation with an initial offset
    (reference derived.py:52-103)."""

    def __init__(self, t0, w0, window_size=8, t1=None, **kwargs):
        del window_size  # deprecated in the reference; unused here
        if t1 is None:
            t1 = float(t0) + 1
        self._w0 = jnp.asarray(w0)
        self._interval = BrownianInterval(t0=t0, t1=t1, size=tuple(self._w0.shape),
                                          dtype=self._w0.dtype, **kwargs)

    def __call__(self, t, tb=None, return_U=False, return_A=False):
        out = self._interval(t, tb, return_U=return_U, return_A=return_A)
        if tb is None and not return_U and not return_A:
            out = out + self._w0
        return out

    def query_grid(self, grid, return_U=False, return_A=False):
        return self._interval.query_grid(grid, return_U=return_U,
                                         return_A=return_A)

    def query_pairs(self, points, pairs, return_U=False, return_A=False):
        # The w0 offset applies to point evaluation only, never to intervals.
        return self._interval.query_pairs(points, pairs, return_U=return_U,
                                          return_A=return_A)

    def __repr__(self):
        return f"{self.__class__.__name__}(interval={self._interval})"

    @property
    def dtype(self):
        return self._interval.dtype

    @property
    def shape(self):
        return self._interval.shape

    @property
    def levy_area_approximation(self):
        return self._interval.levy_area_approximation


class BrownianTree(base.BaseBrownian):
    """Brownian tree with fixed entropy; query-order independent
    (reference derived.py:106-191). Supports pinning both endpoints."""

    def __init__(self, t0, w0, t1=None, w1=None, entropy=None, tol=1e-6,
                 pool_size=24, cache_depth=9, safety=None, **kwargs):
        del pool_size, cache_depth, safety  # deprecated / host-cache tuning; unused
        if t1 is None:
            t1 = float(t0) + 1
        w0 = jnp.asarray(w0)
        W = None if w1 is None else jnp.asarray(w1) - w0
        self._w0 = w0
        self._interval = BrownianInterval(t0=t0, t1=t1, size=tuple(w0.shape),
                                          dtype=w0.dtype, entropy=entropy, tol=tol,
                                          W=W, **kwargs)

    def __call__(self, t, tb=None, return_U=False, return_A=False):
        out = self._interval(t, tb, return_U=return_U, return_A=return_A)
        if tb is None and not return_U and not return_A:
            out = out + self._w0
        return out

    def query_grid(self, grid, return_U=False, return_A=False):
        return self._interval.query_grid(grid, return_U=return_U,
                                         return_A=return_A)

    def query_pairs(self, points, pairs, return_U=False, return_A=False):
        # The w0 offset applies to point evaluation only, never to intervals.
        return self._interval.query_pairs(points, pairs, return_U=return_U,
                                          return_A=return_A)

    def __repr__(self):
        return f"{self.__class__.__name__}(interval={self._interval})"

    @property
    def dtype(self):
        return self._interval.dtype

    @property
    def shape(self):
        return self._interval.shape

    @property
    def levy_area_approximation(self):
        return self._interval.levy_area_approximation
