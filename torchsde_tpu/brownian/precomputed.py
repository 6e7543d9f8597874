"""Precomputed-grid Brownian motion with O(1) interval queries.

TPU-first analogue of the reference's ``BrownianPath`` (store-everything cache,
/root/reference/torchsde/_brownian/derived.py:52-103): instead of lazily
caching host-side tree nodes, sample the whole path once on a uniform fine
grid in a single fused pass and answer ``(ta, tb)`` queries with two gathers
from cumulative arrays. Ideal when the query resolution is known up front
(fixed-step solves, convergence diagnostics where every ``dt`` must see the
same underlying path).

Supports the full ``(W, U, A)`` interface. Consistency (additivity, U chain
rule) is exact by construction, as with :class:`BrownianInterval`.
"""

import jax
import jax.numpy as jnp
import numpy as np

from . import base
from ..settings import LEVY_AREA_APPROXIMATIONS


class PrecomputedBrownian(base.BaseBrownian):
    """Brownian motion sampled on ``n`` uniform fine cells over [t0, t1].

    Memory: O(n * prod(size)). Query cost: O(1).
    """

    def __init__(self, t0, t1, size, n, dtype=None, entropy=None, key=None,
                 levy_area_approximation=LEVY_AREA_APPROXIMATIONS.none):
        t0, t1 = float(t0), float(t1)
        if t0 >= t1:
            raise ValueError(f"Initial time {t0} should be less than terminal time {t1}.")
        if levy_area_approximation not in LEVY_AREA_APPROXIMATIONS:
            raise ValueError(f"`levy_area_approximation` must be one of "
                             f"{LEVY_AREA_APPROXIMATIONS}.")
        size = tuple(int(s) for s in size)
        dtype = jnp.dtype(jnp.float32 if dtype is None else dtype)
        if key is None:
            if entropy is None:
                entropy = int(np.random.randint(0, 2 ** 31 - 1))
            key = jax.random.PRNGKey(int(entropy))
        self._entropy = entropy
        self._t0, self._t1 = t0, t1
        self._size = size
        self._dtype_str = str(dtype)
        self._n = int(n)
        self._levy_area_approximation = levy_area_approximation
        self._have_H = levy_area_approximation in (LEVY_AREA_APPROXIMATIONS.space_time,
                                                   LEVY_AREA_APPROXIMATIONS.davie,
                                                   LEVY_AREA_APPROXIMATIONS.foster)
        self._have_A = levy_area_approximation in (LEVY_AREA_APPROXIMATIONS.davie,
                                                   LEVY_AREA_APPROXIMATIONS.foster)

        h = (t1 - t0) / self._n
        key_w, key_h, self._key_a = jax.random.split(key, 3)
        W = jax.random.normal(key_w, (self._n, *size), dtype) * np.sqrt(h)
        zero = jnp.zeros((1, *size), dtype)
        self._cumW = jnp.concatenate([zero, jnp.cumsum(W, axis=0)], axis=0)
        if self._have_H:
            H = jax.random.normal(key_h, (self._n, *size), dtype) * np.sqrt(h / 12.0)
            U = h * (0.5 * W + H)
            # cumI[k] = int_{t0}^{t_k} (W_u - W_{t0}) du
            #         = sum_{j<k} (U_j + h * cumW[j])
            incr = U + h * self._cumW[:-1]
            self._cumI = jnp.concatenate([zero, jnp.cumsum(incr, axis=0)], axis=0)
        else:
            self._cumI = zero  # placeholder

    # -- properties ------------------------------------------------------- #

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
    def n(self):
        return self._n

    def __repr__(self):
        return (f"{self.__class__.__name__}(t0={self._t0:.3f}, t1={self._t1:.3f}, "
                f"size={self._size}, n={self._n}, "
                f"levy_area_approximation={self._levy_area_approximation!r})")

    # -- query ------------------------------------------------------------ #

    def _index(self, t):
        """Cell-edge index; float64 arithmetic (host-side when ``t`` is
        concrete) so fine grids don't misquantise: rounding the fractional
        position in float32 can land a cell off once ``n`` approaches the
        float32 mantissa resolution of the span (the same reason
        BrownianInterval resolves query times via float64 ``_host_bits``)."""
        if isinstance(t, (int, float, np.ndarray, np.generic)) or (
                isinstance(t, jax.Array) and not isinstance(t, jax.core.Tracer)):
            k = int(round((float(t) - self._t0) / (self._t1 - self._t0) * self._n))
            return jnp.asarray(min(max(k, 0), self._n), jnp.int32)
        ftype = jax.dtypes.canonicalize_dtype(jnp.float64)
        frac = (jnp.asarray(t, ftype) - self._t0) / (self._t1 - self._t0)
        return jnp.clip(jnp.round(frac * self._n).astype(jnp.int32), 0, self._n)

    def __call__(self, ta, tb=None, return_U=False, return_A=False):
        if tb is None:
            ta, tb = self._t0, ta
        dtype = self.dtype
        ka = self._index(ta)
        kb = jnp.maximum(ka, self._index(tb))
        h_cell = (self._t1 - self._t0) / self._n
        h = (kb - ka).astype(dtype) * h_cell
        degenerate = kb == ka

        W = self._cumW[kb] - self._cumW[ka]
        H = None
        if self._have_H:
            U = self._cumI[kb] - self._cumI[ka] - h * self._cumW[ka]
            h_safe = jnp.where(degenerate, jnp.ones_like(h), h)
            H = jnp.where(degenerate, jnp.zeros_like(U), U / h_safe - 0.5 * W)
        W = jnp.where(degenerate, jnp.zeros_like(W), W)

        A = None
        if self._have_A:
            A = self._levy_area(ka, kb, W, H, h, degenerate)

        U_out = h * (0.5 * W + H) if self._have_H else None
        if return_U and return_A:
            return W, U_out, A
        if return_U:
            return W, U_out
        if return_A:
            return W, A
        return W

    def _levy_area(self, ka, kb, W, H, h, degenerate):
        dtype = self.dtype
        if len(self._size) in (0, 1):
            return jnp.zeros_like(W)
        m = self._size[-1]
        key = jax.random.fold_in(jax.random.fold_in(self._key_a, ka), kb)
        noise = jax.random.normal(key, (*self._size, m), dtype)
        noise = noise - jnp.swapaxes(noise, -1, -2)
        A = H[..., :, None] * W[..., None, :] - W[..., :, None] * H[..., None, :]
        if self._levy_area_approximation == LEVY_AREA_APPROXIMATIONS.foster:
            tenth_h = 0.1 * h
            H_sq = jnp.square(H)
            std = jnp.sqrt(tenth_h * (tenth_h + H_sq[..., :, None] + H_sq[..., None, :]))
        else:
            std = jnp.sqrt(h * h / 12.0)
        A = A + std * noise
        return jnp.where(degenerate, jnp.zeros_like(A), A)
