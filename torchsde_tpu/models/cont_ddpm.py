"""Continuous-time DDPM: variance-preserving score-based diffusion.

Counterpart of /root/reference/examples/cont_ddpm.py (Song et al. 2021,
arXiv:2011.13456): VP-SDE with linear beta schedule, analytical conditional
sampling/score, variance-weighted denoising score matching with stratified
time sampling (cont_ddpm.py:137-155), reverse-time SDE sampling through
``sdeint`` on flattened image state (cont_ddpm.py:204-214) with the negated
time trick, the probability-flow ODE sampler, and the Tweedie correction.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core.sdeint import sdeint
from ..utils.module import Module


def _fill_tail_dims(t, ref):
    return t.reshape(t.shape + (1,) * (ref.ndim - t.ndim))


class ScoreMatchingSDE(Module):
    """Forward (noising) VP-SDE + score-matching objective."""
    noise_type = "diagonal"
    sde_type = "ito"

    def __init__(self, denoiser, input_size=(1, 28, 28), t0=0.0, t1=1.0,
                 beta_min=0.1, beta_max=20.0):
        if t0 > t1:
            raise ValueError(f"Expected t0 <= t1, but found t0={t0:.4f}, t1={t1:.4f}")
        self.denoiser = denoiser
        self.input_size = tuple(input_size)
        self.t0, self.t1 = float(t0), float(t1)
        self.beta_min, self.beta_max = beta_min, beta_max

    def score(self, t, y):
        """Dtype-preserving on ``y``: the denoiser runs in its own parameter
        dtype (bf16 nets see bf16 inputs even when the sampler integrates its
        state in f32 — the VP-SDE's time coefficients are f32 scalars, so
        bf16 states promote after one solver step), and the score is cast
        back to ``y``'s dtype. All casts are no-ops when dtypes agree.

        The compute dtype is inferred from the denoiser's first pytree leaf —
        correct for homogeneous-dtype networks (all models in this repo); a
        custom denoiser mixing parameter dtypes should cast inputs itself."""
        param_dtype = jax.tree_util.tree_leaves(self.denoiser)[0].dtype
        # t stays f32 into the denoiser: the sinusoidal time embedding's
        # t*freqs products are precision-sensitive, so the UNet computes the
        # embedding in f32 and casts to param dtype only afterwards (the
        # reference keeps t in the state dtype, examples/unet.py:43-52).
        t = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (y.shape[0],))
        return self.denoiser(t, y.astype(param_dtype)).astype(y.dtype)

    def _beta(self, t):
        return self.beta_min + t * (self.beta_max - self.beta_min)

    def _indefinite_int(self, t):
        return self.beta_min * t + 0.5 * t ** 2 * (self.beta_max - self.beta_min)

    def analytical_mean(self, t, x_t0):
        coeff = jnp.exp(-0.5 * (self._indefinite_int(t) - self._indefinite_int(self.t0)))
        return x_t0 * _fill_tail_dims(coeff, x_t0)

    def analytical_var(self, t):
        return 1 - jnp.exp(-self._indefinite_int(t) + self._indefinite_int(self.t0))

    def analytical_sample(self, key, t, x_t0):
        mean = self.analytical_mean(t, x_t0)
        std = jnp.sqrt(self.analytical_var(t))
        return mean + jax.random.normal(key, mean.shape, mean.dtype) * \
            _fill_tail_dims(std, mean)

    def analytical_score(self, x_t, t, x_t0):
        mean = self.analytical_mean(t, x_t0)
        var = jnp.maximum(self.analytical_var(t), 1e-5)
        return -(x_t - mean) / _fill_tail_dims(var, mean)

    # Forward (noising) SDE on flattened state for sdeint compatibility.
    def f(self, t, y):
        return -0.5 * self._beta(t) * y

    def g(self, t, y):
        return jnp.broadcast_to(jnp.sqrt(self._beta(jnp.asarray(t, y.dtype))),
                                y.shape)

    def sample_t1_marginal(self, key, batch_size, tau=1.0):
        # Match the denoiser's parameter dtype (under jax_enable_x64 the
        # default normal would be float64 and conv inputs must agree).
        dtype = jax.tree_util.tree_leaves(self.denoiser)[0].dtype
        return (jax.random.normal(key, (batch_size, *self.input_size), dtype)
                * math.sqrt(tau))

    def loss(self, key, x_t0, partitions=1):
        """Stratified score-matching objective (reference cont_ddpm.py:137-155):
        per-example loss vector of length batch * partitions."""
        B = x_t0.shape[0]
        k1, k2 = jax.random.split(key)
        u = jax.random.uniform(k1, (B, partitions), x_t0.dtype)
        u = u * ((self.t1 - self.t0) / partitions)
        shifts = (jnp.arange(partitions, dtype=x_t0.dtype)[None, :]
                  * ((self.t1 - self.t0) / partitions) + self.t0)
        t = (u + shifts).reshape(-1)
        lambda_t = self.analytical_var(t)

        x_rep = jnp.repeat(x_t0, partitions, axis=0)
        x_t = self.analytical_sample(k2, t, x_rep)
        fake_score = self.score(t, x_t)
        true_score = self.analytical_score(x_t, t, x_rep)
        sq = ((fake_score - true_score) ** 2).reshape(x_t.shape[0], -1).sum(axis=1)
        return lambda_t * sq


class ReverseDiffeqWrapper(Module):
    """Reverse-time dynamics via the negated-time trick
    (reference cont_ddpm.py:160-214): solve on increasing -t."""
    noise_type = "diagonal"
    sde_type = "stratonovich"

    def __init__(self, module: ScoreMatchingSDE):
        self.module = module

    @property
    def t0(self):
        return self.module.t0

    @property
    def t1(self):
        return self.module.t1

    def _unflatten(self, y):
        return y.reshape(-1, *self.module.input_size)

    # --- probability-flow ODE vector field ---
    def ode_f(self, t, y):
        m = self.module
        return -(m.f(-t, y) - 0.5 * m.g(-t, y) ** 2 *
                 m.score(-t, self._unflatten(y)).reshape(y.shape))

    # --- reverse SDE (flattened state, sdeint contract) ---
    def f(self, t, y):
        m = self.module
        x = self._unflatten(y)
        out = -(m.f(-t, x) - m.g(-t, x) ** 2 * m.score(-t, x))
        return out.reshape(y.shape[0], -1)

    def g(self, t, y):
        x = self._unflatten(y)
        return -self.module.g(-t, x).reshape(y.shape[0], -1)

    def sde_sample(self, key, batch_size=64, tau=1.0, dt=1e-2, t_size=2,
                   tweedie_correction=True, denoise_t=None):
        """Reverse-time SDE sampling on flattened images.

        ``denoise_t > 0`` stops the reverse solve at that time and jumps to
        ``t0`` with the exact Tweedie posterior mean :meth:`denoise` — the
        standard fix for residual speckle: near ``t=0`` the marginal variance
        (and the score-matching weight ``lambda_t``) vanish, so the learned
        score there is too weak to scrub the last injected noise, while at
        ``denoise_t`` the score is well-trained and the denoising jump is
        analytically exact given the score."""
        k1, k2 = jax.random.split(key)
        y = self.module.sample_t1_marginal(k1, batch_size, tau)
        t_lo = float(denoise_t) if denoise_t else self.t0
        # numpy, not jnp: `ts` must stay concrete at trace time so sampling
        # can live inside an outer jit (jnp.linspace returns a tracer there).
        ts = np.linspace(-self.t1, -t_lo, t_size)
        ys = sdeint(self, y.reshape(batch_size, -1), ts, dt=dt, method="midpoint",
                    key=k2)
        ys = ys.reshape(t_size, batch_size, *self.module.input_size)
        if denoise_t:
            ys = ys.at[-1].set(self.denoise(t_lo, ys[-1]))
        elif tweedie_correction:
            ys = ys.at[-1].set(self.tweedie_correction(self.t0, ys[-1], dt))
        return ys

    def sde_sample_final(self, key, batch_size=64, tau=1.0, dt=1e-2,
                         denoise_t=None):
        return self.sde_sample(key, batch_size, tau, dt,
                               denoise_t=denoise_t)[-1]

    def denoise(self, t, y):
        """Exact Tweedie denoising from the time-``t`` marginal to ``t0``:
        ``E[x_{t0} | x_t] = (x_t + var(t) * score(t, x_t)) / mean_coeff(t)``
        (Tweedie's formula for the VP-SDE conditional
        ``x_t ~ N(mean_coeff * x_0, var)``)."""
        m = self.module
        t = jnp.asarray(t, jnp.float32)
        var = m.analytical_var(t)
        coeff = jnp.exp(-0.5 * (m._indefinite_int(t) - m._indefinite_int(m.t0)))
        return (y + var * m.score(t, y)) / coeff

    def ode_sample(self, batch_size=64, tau=1.0, y=None, dt=1e-2, key=None):
        """Probability-flow ODE sampling with fixed-step RK4
        (reference uses torchdiffeq rk4, cont_ddpm.py:192-197)."""
        if y is None:
            y = self.module.sample_t1_marginal(key, batch_size, tau)
        shape = y.shape
        out_dtype = y.dtype
        # Integrate the ODE state in >= f32 (RK4 state arithmetic in bf16
        # loses the increments); the denoiser still runs in its own dtype
        # via the dtype-preserving `score`.
        y = y.reshape(shape[0], -1).astype(jnp.promote_types(y.dtype,
                                                             jnp.float32))
        n = int(round((self.t1 - self.t0) / dt))
        # Grid in the state dtype: under x64 a default-f64 grid would promote
        # the scan carry mid-body and break the carry-type invariant.
        t_grid = jnp.linspace(-self.t1, -self.t0, n + 1, dtype=y.dtype)

        def rk4_step(y, i):
            t = t_grid[i]
            h = t_grid[i + 1] - t_grid[i]
            k1 = self.ode_f(t, y)
            k2 = self.ode_f(t + h / 2, y + h * k1 / 2)
            k3 = self.ode_f(t + h / 2, y + h * k2 / 2)
            k4 = self.ode_f(t + h, y + h * k3)
            return y + (h / 6) * (k1 + 2 * k2 + 2 * k3 + k4), None

        y, _ = jax.lax.scan(rk4_step, y, jnp.arange(n))
        return y.reshape(shape).astype(out_dtype)

    def tweedie_correction(self, t, y, dt):
        """Final denoising jump (reference cont_ddpm.py:220-223)."""
        return y + dt * self.module.score(t, y)
