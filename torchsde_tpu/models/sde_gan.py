"""SDE-GAN: neural-SDE generator vs neural-CDE discriminator.

Counterpart of /root/reference/examples/sde_gan.py ("Neural SDEs as
Infinite-Dimensional GANs"): a Stratonovich general-noise generator with fused
``f_and_g``, solved with the reversible-Heun / adjoint-reversible-Heun pair at
``dt=1.0`` (reference sde_gan.py:129-130), against a linear-interpolation
neural-CDE discriminator (reference uses torchcde with backend='torchsde',
sde_gan.py:183-185).

TPU-first notes:

* the CDE is expressed as a drift-only SDE ``dh = F(t,h) X'(t) dt`` whose
  interpolation coefficients are *attributes of the SDE module*, so
  ``sdeint_adjoint`` automatically differentiates through the control path
  back into the generator — the reference needs the explicit
  ``adjoint_params=(ys_coeffs,)`` plumbing for this;
* both generator and discriminator solves jit into single scans and share the
  reversible pair's machine-precision gradients.
"""

import jax
import jax.numpy as jnp
from jax import lax

from .layers import Linear
from ..core.adjoint import sdeint_adjoint
from ..core.sdeint import sdeint
from ..utils.module import Module


def lipswish(x):
    return 0.909 * jax.nn.silu(x)


class LipMLP(Module):
    """MLP with LipSwish activations (Lipschitz-friendly; reference
    sde_gan.py:49-70), optional final tanh."""

    def __init__(self, key, in_size, out_size, mlp_size, num_layers, tanh,
                 dtype=jnp.float32):
        sizes = [in_size] + [mlp_size] * num_layers + [out_size]
        keys = jax.random.split(key, len(sizes) - 1)
        self.layers = [Linear(k, a, b, dtype) for k, a, b in
                       zip(keys, sizes[:-1], sizes[1:])]
        self.tanh = tanh

    def __call__(self, x):
        for layer in self.layers[:-1]:
            x = lipswish(layer(x))
        x = self.layers[-1](x)
        return jnp.tanh(x) if self.tanh else x


class GeneratorFunc(Module):
    """Stratonovich general-noise SDE with fused f_and_g
    (reference sde_gan.py:77-101)."""
    sde_type = "stratonovich"
    noise_type = "general"

    def __init__(self, key, noise_size, hidden_size, mlp_size, num_layers,
                 dtype=jnp.float32):
        k1, k2 = jax.random.split(key)
        self.drift = LipMLP(k1, 1 + hidden_size, hidden_size, mlp_size,
                            num_layers, tanh=True, dtype=dtype)
        self.diffusion = LipMLP(k2, 1 + hidden_size, hidden_size * noise_size,
                                mlp_size, num_layers, tanh=True, dtype=dtype)
        self.noise_size = noise_size
        self.hidden_size = hidden_size

    def f_and_g(self, t, x):
        tx = jnp.concatenate(
            [jnp.broadcast_to(jnp.asarray(t, x.dtype), (x.shape[0], 1)), x], axis=1)
        f = self.drift(tx)
        g = self.diffusion(tx).reshape(x.shape[0], self.hidden_size, self.noise_size)
        return f, g


class Generator(Module):
    def __init__(self, key, data_size, initial_noise_size, noise_size,
                 hidden_size, mlp_size, num_layers, dtype=jnp.float32,
                 init_mult1=1.0, init_mult2=1.0):
        ks = jax.random.split(key, 3)
        self.initial = LipMLP(ks[0], initial_noise_size, hidden_size, mlp_size,
                              num_layers, tanh=False, dtype=dtype)
        self.func = GeneratorFunc(ks[1], noise_size, hidden_size, mlp_size,
                                  num_layers, dtype=dtype)
        self.readout = Linear(ks[2], hidden_size, data_size, dtype)
        self.initial_noise_size = initial_noise_size
        # "Picking a good initialisation is important!" — the reference
        # scales the initial MLP so the untrained t=0 distribution has
        # roughly the data's variance, and shrinks the vector-field MLPs so
        # the t>0 spread starts in the right ballpark (reference
        # sde_gan.py:347-348, 376-383).
        if init_mult1 != 1.0:
            self.initial = jax.tree_util.tree_map(
                lambda p: p * init_mult1, self.initial)
        if init_mult2 != 1.0:
            self.func = jax.tree_util.tree_map(
                lambda p: p * init_mult2, self.func)

    def __call__(self, key, ts, batch_size, dt=1.0, adjoint=True,
                 fused=False):
        """Returns generated paths with time as channel 0:
        shape (batch, t_size, 1 + data_size). ``fused=True`` runs the solve
        as whole-solve Pallas kernels (ops/gan_fused.py, TPU)."""
        k1, k2 = jax.random.split(key)
        # Sample in the parameters' dtype: keeps the pipeline (and the noise
        # stream, which is dtype-dependent) stable under jax_enable_x64.
        init_noise = jax.random.normal(k1, (batch_size, self.initial_noise_size),
                                       self.readout.w.dtype)
        x0 = self.initial(init_noise)
        if fused:
            from ..ops.gan_fused import generator_solve_fused
            xs = generator_solve_fused(self.func, x0, ts, k2, dt)
        else:
            solve = sdeint_adjoint if adjoint else sdeint
            xs = solve(self.func, x0, ts, method="reversible_heun", dt=dt,
                       key=k2)
        ys = self.readout(xs)                      # (T, B, data)
        ys = jnp.transpose(ys, (1, 0, 2))          # (B, T, data)
        ts_chan = jnp.broadcast_to(jnp.asarray(ts, ys.dtype)[None, :, None],
                                   (batch_size, len(ts), 1))
        return jnp.concatenate([ts_chan, ys], axis=2)


class CDEFunc(Module):
    """The discriminator CDE ``dh = F(t,h) dX`` as a drift-only SDE:
    ``f(t,h) = F(t,h) @ X'(t)`` with the piecewise-linear control's knot
    values stored on the module (gradients flow to them through the adjoint).
    """
    sde_type = "stratonovich"
    noise_type = "additive"

    def __init__(self, key, data_size, hidden_size, mlp_size, num_layers,
                 dtype=jnp.float32):
        self.func = LipMLP(key, 1 + hidden_size, hidden_size * (1 + data_size),
                           mlp_size, num_layers, tanh=True, dtype=dtype)
        self.data_size = data_size
        self.hidden_size = hidden_size
        # Control path knots, attached per batch via evolve(...).
        self._path_ts = jnp.zeros((1,), dtype)
        self._path_ys = jnp.zeros((1, 1, 1 + data_size), dtype)

    def _x_dot(self, t):
        """Derivative of the linear interpolant at time t: slope of the
        bracketing knot interval."""
        ts = self._path_ts
        i = jnp.clip(jnp.searchsorted(ts, t, side="right") - 1, 0, len(ts) - 2)
        dt_knot = ts[i + 1] - ts[i]
        return (self._path_ys[:, i + 1] - self._path_ys[:, i]) / dt_knot

    def f(self, t, h):
        th = jnp.concatenate(
            [jnp.broadcast_to(jnp.asarray(t, h.dtype), (h.shape[0], 1)), h], axis=1)
        F = self.func(th).reshape(h.shape[0], self.hidden_size, 1 + self.data_size)
        return jnp.einsum("bhc,bc->bh", F, self._x_dot(t))

    def g(self, t, h):
        return jnp.zeros((h.shape[0], self.hidden_size, 1), h.dtype)


class Discriminator(Module):
    def __init__(self, key, data_size, hidden_size, mlp_size, num_layers,
                 dtype=jnp.float32):
        ks = jax.random.split(key, 3)
        self.initial = LipMLP(ks[0], 1 + data_size, hidden_size, mlp_size,
                              num_layers, tanh=False, dtype=dtype)
        self.func = CDEFunc(ks[1], data_size, hidden_size, mlp_size, num_layers,
                            dtype=dtype)
        self.readout = Linear(ks[2], hidden_size, 1, dtype)

    def scores(self, ts, ys_paths, dt=1.0, adjoint=True, fused=False):
        """Per-sample critic scores. ys_paths: (batch, t_size, 1 + data_size),
        time in channel 0; ``ts`` are the (concrete) knot times
        (reference sde_gan.py:170-190). ``fused=True`` runs the CDE solve as
        whole-solve Pallas kernels (ops/gan_fused.py, TPU)."""
        h0 = self.initial(ys_paths[:, 0])
        func = self.func.evolve(_path_ts=jnp.asarray(ts, ys_paths.dtype),
                                _path_ys=ys_paths)
        if fused:
            from ..ops.gan_fused import cde_final_state_fused
            h_last = cde_final_state_fused(func, h0, ts, dt)
        else:
            solve = sdeint_adjoint if adjoint else sdeint
            hs = solve(func, h0, ts, method="reversible_heun", dt=dt,
                       entropy=0)
            h_last = hs[-1]
        return self.readout(h_last)[:, 0]

    def __call__(self, ts, ys_paths, dt=1.0, adjoint=True):
        """Mean critic score over the batch."""
        return jnp.mean(self.scores(ts, ys_paths, dt=dt, adjoint=adjoint))

    def clip_weights(self):
        """Lipschitz constraint: clamp each Linear's weight to
        +-1/out_features (reference sde_gan.py:409-416)."""
        def clip_linear(lin):
            lim = 1.0 / lin.w.shape[1]
            return lin.evolve(w=jnp.clip(lin.w, -lim, lim))

        def walk(mod):
            if isinstance(mod, Linear):
                return clip_linear(mod)
            if isinstance(mod, Module):
                changes = {}
                for name in list(vars(mod)):
                    if name == "_dyn_names_":
                        continue
                    val = vars(mod)[name]
                    if isinstance(val, Module):
                        changes[name] = walk(val)
                    elif isinstance(val, list) and val and isinstance(val[0], Module):
                        changes[name] = [walk(v) for v in val]
                return mod.evolve(**changes) if changes else mod
            return mod

        return walk(self)


# --------------------------------------------------------------------------- #
#  Synthetic dataset: time-dependent Ornstein-Uhlenbeck paths                  #
#  (reference sde_gan.py:193-247)                                              #
# --------------------------------------------------------------------------- #

class _OU(Module):
    sde_type = "ito"
    noise_type = "scalar"

    def __init__(self, mu, theta, sigma, t_size):
        self.mu, self.theta, self.sigma = mu, theta, sigma
        self.t_size = t_size

    def f(self, t, y):
        return self.mu * t - self.theta * y

    def g(self, t, y):
        val = self.sigma * (2 * t / self.t_size)
        return jnp.broadcast_to(jnp.asarray(val, y.dtype), (y.shape[0], 1))[..., None]


def linear_fill_nans(ts, ys):
    """Fill NaN observations by linear interpolation between the nearest
    observed knots (constant extension past the first/last observation) —
    the NaN handling of torchcde.linear_interpolation_coeffs that the
    reference's GAN relies on for irregular data
    (/root/reference/examples/sde_gan.py:219-228, 246-248).

    ``ts`` is ``(T,)``; ``ys`` is ``(..., T, C)`` with NaNs marking missing
    observations. A channel with no observations at all fills with zeros.
    """
    ts = jnp.asarray(ts, ys.dtype)
    T = ys.shape[-2]
    obs = jnp.isfinite(ys)                                   # (..., T, C)
    idx = jnp.arange(T)[:, None]                             # (T, 1)
    # Nearest observed index at-or-before / at-or-after each position.
    prev = lax.associative_scan(jnp.maximum,
                                jnp.where(obs, idx, -1), axis=-2)
    nxt = jnp.flip(lax.associative_scan(
        jnp.minimum, jnp.flip(jnp.where(obs, idx, T), axis=-2), axis=-2),
        axis=-2)
    # Clip for safe gathers; the masks below decide what is actually used.
    has_prev, has_next = prev >= 0, nxt <= T - 1
    p = jnp.clip(prev, 0, T - 1)
    n = jnp.clip(nxt, 0, T - 1)
    ys0 = jnp.where(obs, ys, 0.0)
    y_p = jnp.take_along_axis(ys0, p, axis=-2)
    y_n = jnp.take_along_axis(ys0, n, axis=-2)
    t_p = jnp.take(ts, p)
    t_n = jnp.take(ts, n)
    width = t_n - t_p
    w = jnp.where(width > 0, (ts[:, None] - t_p) / jnp.where(width > 0, width, 1.0), 0.0)
    interp = y_p * (1 - w) + y_n * w
    both = jnp.logical_and(has_prev, has_next)
    filled = jnp.where(both, interp,
                       jnp.where(has_prev, y_p,
                                 jnp.where(has_next, y_n, 0.0)))
    return jnp.where(obs, ys, filled)


def get_ou_data(key, dataset_size, t_size, dt=1e-1, drop_frac=0.0):
    """OU dataset with time channel, normalised by initial statistics.

    ``drop_frac > 0`` reproduces the reference's irregular-data demo: that
    fraction of the observations is dropped (NaN) before normalisation, then
    filled by linear interpolation for the CDE's knots — the reference drops
    30% (/root/reference/examples/sde_gan.py:216-228)."""
    k1, k2, k3 = jax.random.split(key, 3)
    ou = _OU(mu=0.02, theta=0.1, sigma=0.4, t_size=t_size)
    y0 = jax.random.uniform(k1, (dataset_size, 1)) * 2 - 1
    ts = jnp.linspace(0.0, t_size - 1, t_size)
    ys = sdeint(ou, y0, ts, dt=dt, method="euler", key=k2)   # (T, B, 1)
    if drop_frac > 0.0:
        drop = jax.random.bernoulli(k3, drop_frac, ys.shape)
        ys = jnp.where(drop, jnp.nan, ys)
    # Normalise w.r.t. the observed initial statistics, not the whole series
    # (reference sde_gan.py:227-233).
    y0_flat = ys[0].reshape(-1)
    y0_obs = jnp.isfinite(y0_flat)
    denom = jnp.maximum(y0_obs.sum(), 1)
    mean = jnp.where(y0_obs, y0_flat, 0.0).sum() / denom
    var = jnp.where(y0_obs, (y0_flat - mean) ** 2, 0.0).sum() / jnp.maximum(denom - 1, 1)
    # guard: a single surviving observation gives var 0 -> would NaN the
    # whole dataset silently
    ys = (ys - mean) / jnp.sqrt(jnp.maximum(var, 1e-12))
    ys = jnp.transpose(ys, (1, 0, 2))                        # (B, T, 1)
    if drop_frac > 0.0:
        ys = linear_fill_nans(ts, ys)
    ts_chan = jnp.broadcast_to(ts[None, :, None], (dataset_size, t_size, 1))
    return ts, jnp.concatenate([ts_chan, ys], axis=2)


def gan_loss(generator, discriminator, key, ts, real_paths, dt=1.0,
             adjoint=True, fused=False):
    """Single Wasserstein-style objective D(fake) - D(real); the training
    step negates the generator's gradients (reference sde_gan.py:395-405).

    The fake and real critic solves share weights and knot times, so they run
    as ONE CDE solve at 2x batch instead of two sequential solves — the CDE
    step's matmuls are tiny ((B,17)@(17,16)), so the workload is
    latency-bound and halving the number of sequential solver steps nearly
    halves the discriminator cost. Values are identical to two separate
    solves (the CDE drift is per-sample; its zero diffusion makes the noise
    stream irrelevant).

    ``adjoint=True`` uses the reversible pair's O(1)-memory backward
    (reference sde_gan.py:129-130); ``adjoint=False`` backprops through the
    solver scan. For reversible Heun both compute the SAME exact discrete
    gradient — the adjoint pair inverts the recurrence algebraically, the
    scan stores it — so the choice is purely a memory/speed tradeoff: at
    this scale backprop is ~1.5x faster on v5e (BENCH_NOTES §1b)."""
    B = real_paths.shape[0]
    fake = generator(key, ts, B, dt=dt, adjoint=adjoint, fused=fused)
    both = jnp.concatenate([fake, real_paths], axis=0)
    s = discriminator.scores(ts, both, dt=dt, adjoint=adjoint, fused=fused)
    return jnp.mean(s[:B]) - jnp.mean(s[B:])


def gan_grads(generator, discriminator, key, ts, real_paths, dt=1.0,
              adjoint=True, fused=False):
    """Returns (loss, gen_grads, disc_grads) with the generator's gradients
    already negated (it ascends the critic score)."""
    loss, (g_gen, g_disc) = jax.value_and_grad(gan_loss, argnums=(0, 1))(
        generator, discriminator, key, ts, real_paths, dt, adjoint, fused)
    g_gen = jax.tree_util.tree_map(lambda x: -x, g_gen)
    return loss, g_gen, g_disc
