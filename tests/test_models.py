"""Model-family tests: fused capabilities and training-step sanity.

Covers the TPU-native ``f_and_h`` fused-drift extension consumed by
``SDELogqp`` (core/base_sde.py), and its LatentSDE implementation
(models/latent_sde.py) against the unfused ``f``/``h`` towers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchsde_tpu import sdeint
from torchsde_tpu.models.latent_sde import LatentSDE, latent_sde_loss
from torchsde_tpu.utils.module import Module


class _PlainSDE(Module):
    noise_type = "diagonal"
    sde_type = "ito"

    def __init__(self):
        self.theta = jnp.asarray(0.3)

    def f(self, t, y):
        return -self.theta * y

    def g(self, t, y):
        return 0.2 * jnp.ones_like(y)

    def h(self, t, y):
        return -0.5 * y


class _FusedSDE(_PlainSDE):
    def f_and_h(self, t, y):
        return self.f(t, y), self.h(t, y)


def test_logqp_uses_f_and_h_bitwise():
    """SDELogqp must dispatch to a provided f_and_h; a trivially-consistent
    fused spelling yields bitwise-identical logqp trajectories."""
    y0 = jax.random.normal(jax.random.PRNGKey(0), (4, 3))
    ts = jnp.linspace(0.0, 1.0, 5)
    kw = dict(dt=0.1, logqp=True, key=jax.random.PRNGKey(1))
    ys1, kl1 = sdeint(_PlainSDE(), y0, ts, **kw)
    ys2, kl2 = sdeint(_FusedSDE(), y0, ts, **kw)
    np.testing.assert_array_equal(np.asarray(ys1), np.asarray(ys2))
    np.testing.assert_array_equal(np.asarray(kl1), np.asarray(kl2))


@pytest.fixture(scope="module")
def latent_model():
    key = jax.random.PRNGKey(0)
    model = LatentSDE(key, data_size=3, latent_size=4, context_size=8,
                      hidden_size=16)
    ts = jnp.linspace(0.0, 1.0, 6)
    xs = jax.random.normal(jax.random.fold_in(key, 1), (6, 5, 3))
    ctx = model.encode(xs, ts)
    return model.contextualize(ts, ctx), xs, ts


def test_latent_sde_fused_drift_matches_towers(latent_model):
    model, xs, ts = latent_model
    y = jax.random.normal(jax.random.PRNGKey(2), (5, 4))
    for t in (0.0, 0.37, 1.0):
        f_ref, h_ref = model.f(t, y), model.h(t, y)
        f_fused, h_fused = model.f_and_h(t, y)
        np.testing.assert_allclose(np.asarray(f_fused), np.asarray(f_ref),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(h_fused), np.asarray(h_ref),
                                   atol=1e-6)


@pytest.mark.heavy
def test_latent_sde_loss_grads_finite(latent_model):
    model, xs, ts = latent_model
    key = jax.random.PRNGKey(3)

    def loss_fn(m):
        return latent_sde_loss(m, xs, ts, key, dt=0.25)[0]

    loss, grads = jax.value_and_grad(loss_fn)(model)
    assert bool(jnp.isfinite(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    # The fused drift must feed gradients back into BOTH towers.
    for net in (grads.f_net, grads.h_net):
        total = sum(float(jnp.sum(jnp.abs(l)))
                    for l in jax.tree_util.tree_leaves(net))
        assert total > 0.0


# --------------------------------------------------------------------------- #
#  Irregular-data fill for the GAN's CDE knots (reference sde_gan.py:216-228)  #
# --------------------------------------------------------------------------- #


def test_linear_fill_nans_matches_hand_interp():
    from torchsde_tpu.models.sde_gan import linear_fill_nans
    ts = jnp.asarray([0.0, 1.0, 2.0, 3.0, 4.0])
    ys = jnp.asarray([[1.0], [jnp.nan], [jnp.nan], [4.0], [jnp.nan]])
    out = np.asarray(linear_fill_nans(ts, ys))
    # Interior NaNs: linear between the bracketing observations.
    np.testing.assert_allclose(out[:, 0], [1.0, 2.0, 3.0, 4.0, 4.0])
    # Leading NaNs: constant extension from the first observation.
    ys2 = jnp.asarray([[jnp.nan], [2.0], [jnp.nan], [6.0], [jnp.nan]])
    out2 = np.asarray(linear_fill_nans(ts, ys2))
    np.testing.assert_allclose(out2[:, 0], [2.0, 2.0, 4.0, 6.0, 6.0])
    # Observed entries are untouched, bitwise.
    assert out[0, 0] == 1.0 and out[3, 0] == 4.0


@pytest.mark.heavy
def test_linear_fill_nans_batched_and_degenerate():
    from torchsde_tpu.models.sde_gan import linear_fill_nans
    key = jax.random.PRNGKey(0)
    ts = jnp.linspace(0.0, 7.0, 8)
    ys = jax.random.normal(key, (4, 8, 2))
    drop = jax.random.bernoulli(jax.random.fold_in(key, 1), 0.3, ys.shape)
    ys_nan = jnp.where(drop, jnp.nan, ys)
    out = np.asarray(linear_fill_nans(ts, ys_nan))
    assert np.isfinite(out).all()
    # Observed values pass through bitwise; a fully-NaN series fills with 0.
    keep = ~np.asarray(drop)
    np.testing.assert_array_equal(out[keep], np.asarray(ys)[keep])
    all_nan = jnp.full((8, 1), jnp.nan)
    np.testing.assert_array_equal(
        np.asarray(linear_fill_nans(ts, all_nan)), np.zeros((8, 1)))


@pytest.mark.heavy
def test_get_ou_data_irregular():
    from torchsde_tpu.models.sde_gan import get_ou_data
    ts, data = get_ou_data(jax.random.PRNGKey(0), 64, 16, drop_frac=0.3)
    assert data.shape == (64, 16, 2)
    assert bool(jnp.all(jnp.isfinite(data)))
    # Normalisation used the OBSERVED initial statistics: mean ~0, std ~1 on
    # the surviving t=0 entries is not directly recoverable post-fill, but
    # the series must stay in a sane range.
    assert float(jnp.abs(data[..., 1]).max()) < 50.0


# --------------------------------------------------------------------------- #
#  cont-DDPM: Tweedie denoising correctness                                    #
# --------------------------------------------------------------------------- #

class _OracleScore(Module):
    """Denoiser returning the EXACT score of the VP-SDE marginal for a
    point-mass data distribution at ``x0``: with
    ``x_t ~ N(mean_coeff(t) x0, var(t))``,
    ``score(t, x) = -(x - mean_coeff(t) x0) / var(t)``. Uses the same
    beta schedule constants as ScoreMatchingSDE's defaults."""

    beta_min, beta_max = 0.1, 20.0

    def __init__(self, x0):
        self.x0 = x0

    def _coeff_var(self, t):
        ind = self.beta_min * t + 0.5 * t ** 2 * (self.beta_max - self.beta_min)
        return jnp.exp(-0.5 * ind), 1.0 - jnp.exp(-ind)

    def __call__(self, t, x):
        coeff, var = self._coeff_var(t[0])
        return -(x - coeff * self.x0[None]) / jnp.maximum(var, 1e-12)


def test_ddpm_tweedie_denoise_recovers_point_mass():
    """Tweedie's formula is exact for a point-mass data distribution:
    E[x0 | x_t] = x0 for every x_t and every t, so denoise(t, x_t) with the
    oracle score must return x0 to float rounding — a closed-form check of
    the (x + var * score) / mean_coeff algebra with no solver involved."""
    from torchsde_tpu.models.cont_ddpm import (ReverseDiffeqWrapper,
                                               ScoreMatchingSDE)

    key = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(key, (1, 4, 4), jnp.float64) * 2 - 1
    sde = ScoreMatchingSDE(_OracleScore(x0), input_size=(1, 4, 4))
    rev = ReverseDiffeqWrapper(sde)

    for t in (0.03, 0.1, 0.5, 0.9):
        x_t = sde.analytical_sample(jax.random.fold_in(key, int(t * 100)),
                                    jnp.full((8,), t, jnp.float64),
                                    jnp.broadcast_to(x0, (8, 1, 4, 4)))
        x0_hat = rev.denoise(t, x_t)
        np.testing.assert_allclose(np.asarray(x0_hat),
                                   np.asarray(jnp.broadcast_to(x0, x0_hat.shape)),
                                   rtol=0, atol=1e-8)


def test_ddpm_sde_sample_denoise_t_plumbing():
    """sde_sample(denoise_t=...) stops the reverse solve at denoise_t and
    applies the Tweedie jump: with the oracle score of a point mass, the
    samples must collapse onto x0 (up to reverse-solve discretisation),
    far inside the t1-marginal's unit spread."""
    from torchsde_tpu.models.cont_ddpm import (ReverseDiffeqWrapper,
                                               ScoreMatchingSDE)

    key = jax.random.PRNGKey(3)
    x0 = jax.random.uniform(key, (1, 4, 4), jnp.float64) * 2 - 1
    sde = ScoreMatchingSDE(_OracleScore(x0), input_size=(1, 4, 4))
    rev = ReverseDiffeqWrapper(sde)

    samp = rev.sde_sample_final(jax.random.fold_in(key, 1), batch_size=16,
                                dt=5e-3, denoise_t=0.05)
    assert samp.shape == (16, 1, 4, 4)
    err = float(jnp.abs(samp - x0[None]).max())
    assert err < 0.12, err
    # and the jump matters: stopping at denoise_t WITHOUT the Tweedie jump
    # leaves the t=0.05 marginal's noise (std ~0.17) in the samples
    raw = rev.sde_sample(jax.random.fold_in(key, 1), batch_size=16,
                         dt=5e-3, denoise_t=None, tweedie_correction=False)
    assert float(jnp.abs(rev.denoise(0.05, raw[-1]) - x0[None]).max()) < 0.2
