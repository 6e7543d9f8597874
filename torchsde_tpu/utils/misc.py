"""Small tensor/pytree utilities (analogue of /root/reference/torchsde/_core/misc.py)."""

import warnings

import jax
import jax.numpy as jnp
import numpy as np


def handle_unused_kwargs(unused_kwargs, msg=None):
    if len(unused_kwargs) > 0:
        if msg is not None:
            warnings.warn(f"{msg}: Unexpected arguments {unused_kwargs}")
        else:
            warnings.warn(f"Unexpected arguments {unused_kwargs}")


def is_strictly_increasing(ts):
    ts = np.asarray(ts)
    return bool(np.all(ts[:-1] < ts[1:]))


def batch_mvp(m, v):
    """Batched matrix-vector product: (..., d, m) x (..., m) -> (..., d)."""
    return jnp.einsum("...dm,...m->...d", m, v)


def stable_division(a, b, epsilon=1e-7):
    """a / b with |b| clamped away from zero (reference misc.py:66-68).

    The magnitude test uses a stopped gradient, matching the reference's
    ``b.abs().detach() > epsilon``.
    """
    big = jax.lax.stop_gradient(jnp.abs(b)) > epsilon
    sign = jnp.where(b >= 0, 1.0, -1.0).astype(b.dtype)
    b_safe = jnp.where(big, b, epsilon * sign)
    return a / b_safe


def tree_add(*trees):
    return jax.tree_util.tree_map(lambda *xs: sum(xs), *trees)


def tree_sub(a, b):
    return jax.tree_util.tree_map(lambda x, y: x - y, a, b)


def tree_scale(c, tree):
    return jax.tree_util.tree_map(lambda x: c * x, tree)


def tree_lc(*pairs):
    """Linear combination of pytrees: tree_lc((c1, t1), (c2, t2), ...).

    Leaves with dtype float0 (symbolic-zero cotangents of integer leaves) are
    passed through unchanged.
    """
    coeffs = [c for c, _ in pairs]
    trees = [t for _, t in pairs]

    def combine(*xs):
        if getattr(xs[0], "dtype", None) == jax.dtypes.float0:
            return xs[0]
        out = sum(c * x for c, x in zip(coeffs, xs))
        # Keep scan carries dtype-stable: the first tree is the accumulator,
        # so promotion from later terms (e.g. mixed-precision user fns) must
        # not change the carry dtype.
        dtype = getattr(xs[0], "dtype", None)
        if dtype is not None and getattr(out, "dtype", None) != dtype:
            out = out.astype(dtype)
        return out

    return jax.tree_util.tree_map(combine, *trees)


def tree_zeros_like(tree):
    return jax.tree_util.tree_map(jnp.zeros_like, tree)


def tree_rms(tree, eps=1e-7):
    """Root-mean-square over all leaves of a pytree."""
    leaves = jax.tree_util.tree_leaves(tree)
    sq = sum(jnp.sum(jnp.square(x)) for x in leaves)
    n = sum(x.size for x in leaves)
    return jnp.maximum(jnp.sqrt(sq / n), eps)


class LinearScheduler:
    """Linear 0->1 ramp over `iters` steps (reference latent_sde.py:36-47)."""

    def __init__(self, iters, maxval=1.0):
        self._iters = max(1, iters)
        self._val = maxval / self._iters
        self._maxval = maxval

    def step(self):
        self._val = min(self._maxval, self._val + self._maxval / self._iters)

    @property
    def val(self):
        return self._val


class EMAMetric:
    """Exponential moving average of a scalar metric (reference latent_sde.py:50-63)."""

    def __init__(self, gamma=0.99):
        self._val = 0.0
        self._gamma = gamma

    def step(self, x):
        self._val = self._gamma * self._val + (1 - self._gamma) * float(x)
        return self._val

    @property
    def val(self):
        return self._val
