"""bfloat16 / float32 robustness: TPU-typical dtypes must flow through the
solver and adjoint without dtype drift in scan carries."""

import jax
import jax.numpy as jnp
import pytest

import torchsde_tpu as tsde


class DiagSDE(tsde.SDEIto):
    def __init__(self, dtype):
        super().__init__(noise_type="diagonal")
        self.w = jnp.ones((4, 4), dtype) * 0.1

    def f(self, t, y):
        return jnp.tanh(y @ self.w)

    def g(self, t, y):
        return 0.1 * jax.nn.sigmoid(y)


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
def test_solve_and_adjoint_dtype(dtype):
    sde = DiagSDE(dtype)
    y0 = jnp.full((8, 4), 0.1, dtype)
    ts = [0.0, 0.1, 0.2]

    ys = tsde.sdeint(sde, y0, ts, method="euler", dt=0.05, entropy=0)
    assert ys.dtype == dtype
    assert bool(jnp.all(jnp.isfinite(ys.astype(jnp.float32))))

    def loss(s):
        return tsde.sdeint_adjoint(s, y0, ts, method="euler", dt=0.05,
                                   adjoint_method="euler",
                                   entropy=0)[-1].astype(jnp.float32).sum()

    g = jax.grad(loss)(sde)
    assert g.w.dtype == dtype
    assert bool(jnp.all(jnp.isfinite(g.w.astype(jnp.float32))))


@pytest.mark.heavy
def test_latent_model_bf16_step():
    from torchsde_tpu.models.latent_sde import LatentSDE, latent_sde_loss
    key = jax.random.PRNGKey(0)
    ts = jnp.linspace(0.0, 0.2, 4)
    xs = jax.random.normal(jax.random.fold_in(key, 1), (4, 8, 3), jnp.bfloat16)
    model = LatentSDE(jax.random.fold_in(key, 2), 3, 2, 4, 8, dtype=jnp.bfloat16)

    def lf(m):
        loss, _ = latent_sde_loss(m, xs, ts, key, dt=0.1)
        return loss.astype(jnp.float32)

    loss, grads = jax.value_and_grad(lf)(model)
    assert bool(jnp.isfinite(loss))
    assert grads.projector.w.dtype == jnp.bfloat16


@pytest.mark.heavy
def test_ddpm_bf16_loss_and_samplers():
    """A bf16 U-Net must train and sample through BOTH samplers: the VP-SDE's
    time coefficients are f32 scalars, so sampler state promotes after one
    step — `score` must feed the denoiser its own param dtype regardless
    (regression: benchmarks/sampling_bench.py first hit this in ode_sample)."""
    from torchsde_tpu.models.cont_ddpm import (ReverseDiffeqWrapper,
                                               ScoreMatchingSDE)
    from torchsde_tpu.models.unet import UNet

    key = jax.random.PRNGKey(0)
    denoiser = UNet(key, in_ch=1, base_ch=8, ch_mults=(1, 2),
                    dtype=jnp.bfloat16)
    sde = ScoreMatchingSDE(denoiser, input_size=(1, 8, 8))
    x = jnp.zeros((2, 1, 8, 8), jnp.bfloat16)

    loss = jnp.mean(sde.loss(jax.random.fold_in(key, 1), x))
    assert bool(jnp.isfinite(loss.astype(jnp.float32)))

    rev = ReverseDiffeqWrapper(sde)
    samp_sde = rev.sde_sample_final(jax.random.fold_in(key, 2), batch_size=2,
                                    dt=0.5)
    samp_ode = rev.ode_sample(batch_size=2, dt=0.5,
                              key=jax.random.fold_in(key, 3))
    for s in (samp_sde, samp_ode):
        assert s.dtype == jnp.bfloat16
        assert bool(jnp.all(jnp.isfinite(s.astype(jnp.float32))))
