"""Minimal neural-net layers as pytree Modules.

The reference's examples use torch.nn (Linear/GRU/Sequential); these are their
self-contained JAX counterparts, kept dependency-free so the model families
under ``torchsde_tpu.models`` are pure pytrees that compose with
``sdeint_adjoint`` (every array leaf automatically receives gradients).
Matmul-heavy ops stay in large batched einsums so XLA tiles them onto the MXU.
"""

import math

import jax
import jax.numpy as jnp

from ..utils.module import Module


def _uniform(key, shape, scale, dtype):
    return jax.random.uniform(key, shape, dtype, -scale, scale)


class Linear(Module):
    def __init__(self, key, in_dim, out_dim, dtype=jnp.float32):
        scale = 1.0 / math.sqrt(in_dim)
        k1, k2 = jax.random.split(key)
        self.w = _uniform(k1, (in_dim, out_dim), scale, dtype)
        self.b = _uniform(k2, (out_dim,), scale, dtype)

    def __call__(self, x):
        return x @ self.w + self.b


class MLP(Module):
    """Linear -> act -> ... -> Linear [-> final_activation]."""

    def __init__(self, key, sizes, activation="softplus", final_activation=None,
                 dtype=jnp.float32):
        keys = jax.random.split(key, len(sizes) - 1)
        self.layers = [Linear(k, a, b, dtype) for k, a, b in
                       zip(keys, sizes[:-1], sizes[1:])]
        self.activation = activation
        self.final_activation = final_activation

    def __call__(self, x):
        act = getattr(jax.nn, self.activation)
        for layer in self.layers[:-1]:
            x = act(layer(x))
        x = self.layers[-1](x)
        if self.final_activation is not None:
            x = getattr(jax.nn, self.final_activation)(x)
        return x


class GRUCell(Module):
    def __init__(self, key, input_size, hidden_size, dtype=jnp.float32):
        scale = 1.0 / math.sqrt(hidden_size)
        ks = jax.random.split(key, 4)
        self.w_ih = _uniform(ks[0], (input_size, 3 * hidden_size), scale, dtype)
        self.w_hh = _uniform(ks[1], (hidden_size, 3 * hidden_size), scale, dtype)
        self.b_ih = _uniform(ks[2], (3 * hidden_size,), scale, dtype)
        self.b_hh = _uniform(ks[3], (3 * hidden_size,), scale, dtype)
        self.hidden_size = hidden_size

    def __call__(self, x, h):
        return self.step_from_gi(x @ self.w_ih + self.b_ih, h)

    def step_from_gi(self, gi, h):
        """Advance from a precomputed input projection ``gi = x @ w_ih + b_ih``
        — lets the sequence layer hoist the input matmul out of the scan."""
        gh = h @ self.w_hh + self.b_hh
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        return (1 - z) * n + z * h


class GRU(Module):
    """Unidirectional GRU over a (T, B, F) sequence via lax.scan."""

    def __init__(self, key, input_size, hidden_size, dtype=jnp.float32):
        self.cell = GRUCell(key, input_size, hidden_size, dtype)

    def __call__(self, xs, h0=None):
        B = xs.shape[1]
        if h0 is None:
            h0 = jnp.zeros((B, self.cell.hidden_size), xs.dtype)

        # Input projections for ALL timesteps in one (T*B, in) @ (in, 3H)
        # matmul: half the per-step matmuls leave the sequential scan and the
        # MXU sees one large op instead of T small ones (the cuDNN RNN trick).
        gi_all = xs @ self.cell.w_ih + self.cell.b_ih

        def step(h, gi):
            h1 = self.cell.step_from_gi(gi, h)
            return h1, h1

        h_last, hs = jax.lax.scan(step, h0, gi_all)
        return hs, h_last
