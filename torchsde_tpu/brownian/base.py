"""Abstract Brownian motion interface.

API parity with /root/reference/torchsde/_brownian/brownian_base.py:18-50:
``bm(ta, tb, return_U=..., return_A=...)`` returns the increment W(tb)-W(ta)
(optionally with space-time Levy area U and full Levy area A), and exposes
shape/dtype/levy_area_approximation properties.
"""

import abc

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.module import Module


class BaseBrownian(Module, metaclass=abc.ABCMeta):

    @abc.abstractmethod
    def __call__(self, ta, tb=None, return_U=False, return_A=False):
        raise NotImplementedError

    def query_grid(self, grid, return_U=False, return_A=False):
        """Bulk form of ``__call__``: all ``len(grid) - 1`` consecutive
        increments in one vmapped pass (TPU-native addition; fixed-step
        integrators hoist their noise queries out of the scan through this).
        Subclasses override with cheaper exact implementations where possible.
        Returns ``(W, U, A)`` with ``U``/``A`` ``None`` unless requested."""
        t0s = jnp.asarray(np.asarray(grid[:-1], np.float64))
        t1s = jnp.asarray(np.asarray(grid[1:], np.float64))

        def one(a, b):
            out = {}
            if return_U and return_A:
                out["W"], out["U"], out["A"] = self(a, b, return_U=True,
                                                    return_A=True)
            elif return_U:
                out["W"], out["U"] = self(a, b, return_U=True)
            elif return_A:
                out["W"], out["A"] = self(a, b, return_A=True)
            else:
                out["W"] = self(a, b)
            return out

        out = jax.vmap(one)(t0s, t1s)
        return out["W"], out.get("U"), out.get("A")

    @property
    @abc.abstractmethod
    def dtype(self):
        raise NotImplementedError

    @property
    @abc.abstractmethod
    def shape(self):
        raise NotImplementedError

    @property
    @abc.abstractmethod
    def levy_area_approximation(self):
        raise NotImplementedError

    def size(self):
        return self.shape
