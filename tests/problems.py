"""Test problems, mirroring /root/reference/tests/problems.py.

ExDiagonal / ExScalar / ExAdditive are examples 1-3 from Rackauckas & Nie
(2017), with matched Itô/Stratonovich drifts. Neural* use tiny MLPs with
0.1-scaled noise. Basic* exercise unused / shared parameters. FGSDE-family
fixtures spell the same general-noise SDE through every capability
combination for bitwise-equivalence tests.
"""

import jax
import jax.numpy as jnp

from torchsde_tpu import BaseSDE, Module, SDEIto
from torchsde_tpu.settings import NOISE_TYPES, SDE_TYPES


def _randn(key, *shape):
    return jax.random.normal(key, shape, jnp.float64)


class MLP(Module):
    """Tiny 1-hidden-layer MLP: Linear -> softplus -> Linear [-> sigmoid]."""

    def __init__(self, key, in_dim, hidden, out_dim, final_sigmoid=False):
        k1, k2 = jax.random.split(key)
        s1 = 1.0 / jnp.sqrt(in_dim)
        s2 = 1.0 / jnp.sqrt(hidden)
        self.w1 = jax.random.uniform(k1, (in_dim, hidden), jnp.float64, -s1, s1)
        self.b1 = jnp.zeros((hidden,), jnp.float64)
        self.w2 = jax.random.uniform(k2, (hidden, out_dim), jnp.float64, -s2, s2)
        self.b2 = jnp.zeros((out_dim,), jnp.float64)
        self.final_sigmoid = final_sigmoid

    def __call__(self, x):
        h = jax.nn.softplus(x @ self.w1 + self.b1)
        out = h @ self.w2 + self.b2
        return jax.nn.sigmoid(out) if self.final_sigmoid else out


def _t_cat(t, y):
    return jnp.concatenate([jnp.broadcast_to(jnp.asarray(t, y.dtype), (y.shape[0], 1)), y],
                           axis=1)


class ExDiagonal(BaseSDE):
    """Geometric-Brownian-like diagonal problem with analytical sample solution."""
    noise_type = NOISE_TYPES.diagonal

    def __init__(self, d, key=None, sde_type=SDE_TYPES.ito, **kwargs):
        super().__init__(sde_type=sde_type, noise_type=NOISE_TYPES.diagonal)
        key = jax.random.PRNGKey(0) if key is None else key
        k1, k2 = jax.random.split(key)
        sigma = jax.nn.sigmoid(_randn(k1, d))
        mu = -sigma ** 2 - jax.nn.sigmoid(_randn(k2, d))
        self.mu = mu
        self.sigma = sigma

    def f(self, t, y):
        if self.sde_type == SDE_TYPES.ito:
            return self.mu * y
        return self.mu * y - 0.5 * (self.sigma ** 2) * y

    def g(self, t, y):
        return self.sigma * y

    def h(self, t, y):
        return jnp.zeros_like(y)

    def analytical_sample(self, y0, ts, bm):
        """Exact solution of the Ito SDE dy = mu y dt + sigma y dW:
        y(t) = y0 exp((mu - sigma^2/2) t + sigma W_t)."""
        t0 = float(ts[0])
        outs = [y0]
        for t in list(ts[1:]):
            W = bm(t0, float(t))
            drift = (self.mu - 0.5 * self.sigma ** 2) * (float(t) - t0)
            outs.append(y0 * jnp.exp(drift + self.sigma * W))
        return jnp.stack(outs, axis=0)


class ExScalar(BaseSDE):
    noise_type = NOISE_TYPES.scalar

    def __init__(self, d, key=None, sde_type=SDE_TYPES.ito, **kwargs):
        super().__init__(sde_type=sde_type, noise_type=NOISE_TYPES.scalar)
        key = jax.random.PRNGKey(1) if key is None else key
        self.p = jax.nn.sigmoid(_randn(key, d))

    def f(self, t, y):
        if self.sde_type == SDE_TYPES.ito:
            return -self.p ** 2.0 * jnp.sin(y) * jnp.cos(y) ** 3.0
        return jnp.zeros_like(y)

    def g(self, t, y):
        return (self.p * jnp.cos(y) ** 2)[..., None]

    def h(self, t, y):
        return jnp.zeros_like(y)

    def analytical_sample(self, y0, ts, bm):
        """Exact: y(t) = arctan(p W_t + tan(y0)) for the Stratonovich form
        (and the matched Ito drift)."""
        t0 = float(ts[0])
        outs = [y0]
        for t in list(ts[1:]):
            W = bm(t0, float(t))
            outs.append(jnp.arctan(self.p * W + jnp.tan(y0)))
        return jnp.stack(outs, axis=0)


class ExAdditive(BaseSDE):
    noise_type = NOISE_TYPES.additive

    def __init__(self, d, m, key=None, sde_type=SDE_TYPES.ito, **kwargs):
        super().__init__(sde_type=sde_type, noise_type=NOISE_TYPES.additive)
        key = jax.random.PRNGKey(2) if key is None else key
        k1, k2 = jax.random.split(key)
        self.m = m
        self.a = jax.nn.sigmoid(_randn(k1, d))
        self.b = jax.nn.sigmoid(_randn(k2, d))

    def f(self, t, y):
        return self.b / jnp.sqrt(1.0 + t) - y / (2.0 + 2.0 * t)

    def g(self, t, y):
        fill = self.a * self.b / jnp.sqrt(1.0 + t)
        return jnp.broadcast_to(fill[None, :, None], (y.shape[0], fill.shape[0], self.m))

    def h(self, t, y):
        return jnp.zeros_like(y)

    def analytical_sample(self, y0, ts, bm):
        """Exact: substituting y = u/sqrt(1+t) reduces the SDE to
        du = b dt + a b sum_j dW^j, so
        y(t) = (y0 sqrt(1+t0) + b (t-t0) + a b sum_j W^j(t0,t)) / sqrt(1+t)."""
        t0 = float(ts[0])
        outs = [y0]
        for t in list(ts[1:]):
            W = bm(t0, float(t))
            w_sum = jnp.sum(W, axis=-1, keepdims=True)
            u = y0 * jnp.sqrt(1.0 + t0) + self.b * (float(t) - t0) + self.a * self.b * w_sum
            outs.append(u / jnp.sqrt(1.0 + float(t)))
        return jnp.stack(outs, axis=0)


class NeuralDiagonal(BaseSDE):
    noise_type = NOISE_TYPES.diagonal

    def __init__(self, d, key=None, sde_type=SDE_TYPES.ito, **kwargs):
        super().__init__(sde_type=sde_type, noise_type=NOISE_TYPES.diagonal)
        key = jax.random.PRNGKey(3) if key is None else key
        k1, k2 = jax.random.split(key)
        self.f_net = MLP(k1, d + 1, 8, d)
        self.g_net = MLP(k2, d + 1, 8, d, final_sigmoid=True)

    def f(self, t, y):
        return self.f_net(_t_cat(t, y))

    def g(self, t, y):
        return 0.1 * self.g_net(_t_cat(t, y))

    def h(self, t, y):
        return jnp.zeros_like(y)


class NeuralScalar(BaseSDE):
    noise_type = NOISE_TYPES.scalar

    def __init__(self, d, key=None, sde_type=SDE_TYPES.ito, **kwargs):
        super().__init__(sde_type=sde_type, noise_type=NOISE_TYPES.scalar)
        key = jax.random.PRNGKey(4) if key is None else key
        k1, k2 = jax.random.split(key)
        self.f_net = MLP(k1, d + 1, 8, d)
        self.g_net = MLP(k2, d + 1, 8, d, final_sigmoid=True)

    def f(self, t, y):
        return self.f_net(_t_cat(t, y))

    def g(self, t, y):
        return 0.1 * self.g_net(_t_cat(t, y))[..., None]

    def h(self, t, y):
        return jnp.zeros_like(y)


class NeuralAdditive(BaseSDE):
    noise_type = NOISE_TYPES.additive

    def __init__(self, d, m, key=None, sde_type=SDE_TYPES.ito, **kwargs):
        super().__init__(sde_type=sde_type, noise_type=NOISE_TYPES.additive)
        key = jax.random.PRNGKey(5) if key is None else key
        k1, k2 = jax.random.split(key)
        self.d, self.m = d, m
        self.f_net = MLP(k1, d + 1, 8, d)
        self.g_net = MLP(k2, 1, 8, d * m, final_sigmoid=True)

    def f(self, t, y):
        return self.f_net(_t_cat(t, y))

    def g(self, t, y):
        t_in = jnp.broadcast_to(jnp.asarray(t, y.dtype), (y.shape[0], 1))
        return self.g_net(t_in).reshape(y.shape[0], self.d, self.m)

    def h(self, t, y):
        return jnp.zeros_like(y)


class NeuralGeneral(BaseSDE):
    noise_type = NOISE_TYPES.general

    def __init__(self, d, m, key=None, sde_type=SDE_TYPES.ito, **kwargs):
        super().__init__(sde_type=sde_type, noise_type=NOISE_TYPES.general)
        key = jax.random.PRNGKey(6) if key is None else key
        k1, k2 = jax.random.split(key)
        self.d, self.m = d, m
        self.f_net = MLP(k1, d + 1, 8, d)
        self.g_net = MLP(k2, d + 1, 8, d * m, final_sigmoid=True)

    def f(self, t, y):
        return self.f_net(_t_cat(t, y))

    def g(self, t, y):
        return 0.1 * self.g_net(_t_cat(t, y)).reshape(y.shape[0], self.d, self.m)

    def h(self, t, y):
        return jnp.zeros_like(y)


class BasicSDE1(SDEIto):
    def __init__(self, d=10, key=None):
        super().__init__(noise_type="diagonal")
        key = jax.random.PRNGKey(7) if key is None else key
        ks = jax.random.split(key, 4)
        self.shared_param = _randn(ks[0], 1, d)
        self.no_grad_param = jax.lax.stop_gradient(_randn(ks[1], 1, d))
        self.unused_param1 = _randn(ks[2], 1, d)
        self.unused_param2 = _randn(ks[3], 1, d)

    def f(self, t, y):
        return (self.shared_param * jnp.sin(y) * 0.2 + jnp.cos(y ** 2.0) * 0.1 +
                jnp.cos(t) + self.no_grad_param * y)

    def g(self, t, y):
        return (jax.nn.sigmoid(self.shared_param * jnp.cos(y) * 0.3 + jnp.sin(t)) +
                jax.nn.sigmoid(self.no_grad_param * y) + 0.1)

    def h(self, t, y):
        return jax.nn.sigmoid(y)


class BasicSDE2(SDEIto):
    def __init__(self, d=10, key=None):
        super().__init__(noise_type="diagonal")
        key = jax.random.PRNGKey(8) if key is None else key
        ks = jax.random.split(key, 2)
        self.shared_param = _randn(ks[0], 1, d)
        self.no_grad_param = _randn(ks[1], 1, d)

    def f(self, t, y):
        return self.shared_param * 0.2 + self.no_grad_param + jnp.zeros_like(y)

    def g(self, t, y):
        return (jax.nn.sigmoid(self.shared_param * 0.3) +
                jax.nn.sigmoid(self.no_grad_param) + jnp.zeros_like(y) + 0.1)

    def h(self, t, y):
        return jax.nn.sigmoid(y)


class BasicSDE3(SDEIto):
    """Drift/diffusion constant in every trainable parameter."""

    def __init__(self, d=10, key=None):
        super().__init__(noise_type="diagonal")
        key = jax.random.PRNGKey(9) if key is None else key
        self.unused_param1 = _randn(key, 1, d)

    def f(self, t, y):
        return 0.2 + jnp.zeros_like(y)

    def g(self, t, y):
        return jax.nn.sigmoid(0.3 * jnp.ones_like(y)) + 0.1

    def h(self, t, y):
        return jax.nn.sigmoid(y)


class BasicSDE4(SDEIto):
    def __init__(self, d=10, key=None):
        super().__init__(noise_type="diagonal")
        key = jax.random.PRNGKey(10) if key is None else key
        ks = jax.random.split(key, 2)
        self.shared_param = _randn(ks[0], 1, d)
        self.unused_param2 = _randn(ks[1], 1, d)

    def f(self, t, y):
        return jnp.full_like(y, 0.1)

    def g(self, t, y):
        return jax.nn.sigmoid(jnp.zeros_like(y)) + 0.1

    def h(self, t, y):
        return jax.nn.sigmoid(y)


class CustomNamesSDE(SDEIto):
    def __init__(self):
        super().__init__(noise_type="diagonal")

    def forward(self, t, y):
        return y * t

    def g(self, t, y):
        return jax.nn.sigmoid(t * y)


class CustomNamesSDELogqp(SDEIto):
    def __init__(self):
        super().__init__(noise_type="diagonal")

    def forward(self, t, y):
        return y * t

    def g(self, t, y):
        return jax.nn.sigmoid(t * y)

    def w(self, t, y):
        return y * t


# --- Capability-spelling fixtures (general noise) -------------------------- #

def _fg_g(y, vector):
    return jax.nn.sigmoid(y)[..., None] * vector


class FGSDE(Module):
    noise_type = "general"

    def __init__(self, sde_type, vector):
        self.sde_type = sde_type
        self.vector = vector

    def f(self, t, y):
        return -y

    def g(self, t, y):
        return _fg_g(y, self.vector)


class FAndGSDE(Module):
    noise_type = "general"

    def __init__(self, sde_type, vector):
        self.sde_type = sde_type
        self.vector = vector

    def f_and_g(self, t, y):
        return -y, _fg_g(y, self.vector)


class GProdSDE(Module):
    noise_type = "general"

    def __init__(self, sde_type, vector):
        self.sde_type = sde_type
        self.vector = vector

    def f(self, t, y):
        return -y

    def g_prod(self, t, y, v):
        return jnp.einsum("bdm,bm->bd", _fg_g(y, self.vector), v)


class FAndGProdSDE(Module):
    noise_type = "general"

    def __init__(self, sde_type, vector):
        self.sde_type = sde_type
        self.vector = vector

    def f_and_g_prod(self, t, y, v):
        return -y, jnp.einsum("bdm,bm->bd", _fg_g(y, self.vector), v)


class FAndGGProdSDE1(Module):
    noise_type = "general"

    def __init__(self, sde_type, vector):
        self.sde_type = sde_type
        self.vector = vector

    def f_and_g(self, t, y):
        return -y, _fg_g(y, self.vector)

    def g_prod(self, t, y, v):
        return jnp.einsum("bdm,bm->bd", _fg_g(y, self.vector), v)


class FAndGGProdSDE2(Module):
    noise_type = "general"

    def __init__(self, sde_type, vector):
        self.sde_type = sde_type
        self.vector = vector

    def f(self, t, y):
        return -y

    def f_and_g(self, t, y):
        return -y, _fg_g(y, self.vector)

    def g_prod(self, t, y, v):
        return jnp.einsum("bdm,bm->bd", _fg_g(y, self.vector), v)
