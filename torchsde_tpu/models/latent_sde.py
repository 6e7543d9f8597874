"""Latent SDE model family (variational SDE / "SDE as a VAE").

Counterpart of the reference's flagship workloads:
/root/reference/examples/latent_sde_lorenz.py (GRU encoder -> context,
posterior drift conditioned on piecewise-constant context, learned OU-ish
prior drift ``h``, per-dimension diagonal noise nets, ``logqp=True`` KL path)
and /root/reference/examples/latent_sde.py (KL annealing, projector
decoder). TPU-first differences:

* the model is one pytree; the encoder context is attached to the SDE via
  ``evolve(_ctx=...)``, so ``sdeint_adjoint`` gradients flow back through the
  context into the encoder automatically — no manual ``adjoint_params=(ctx,)``
  plumbing (reference latent_sde_lorenz.py:180-187);
* the whole training step jits into a single XLA program: encoder scan,
  solver scan, adjoint reverse scan, optimizer update.
"""

import jax
import jax.numpy as jnp

from .layers import GRU, Linear, MLP
from ..core.adjoint import sdeint_adjoint
from ..core.sdeint import sdeint
from ..utils.module import Module


class LatentSDE(Module):
    """Posterior/prior latent SDE with GRU context encoder.

    Drift ``f(t, y)`` conditions on a piecewise-constant context path looked
    up by time (reference latent_sde_lorenz.py:149-161); prior drift ``h``;
    diagonal noise via per-dimension nets (reference :136-147).
    """

    noise_type = "diagonal"
    sde_type = "ito"

    def __init__(self, key, data_size, latent_size, context_size, hidden_size,
                 dtype=jnp.float32):
        ks = jax.random.split(key, 8)
        self.encoder = GRU(ks[0], data_size, hidden_size, dtype)
        self.encoder_proj = Linear(ks[1], hidden_size, context_size, dtype)
        self.qz0_net = Linear(ks[2], context_size, 2 * latent_size, dtype)
        self.f_net = MLP(ks[3], (latent_size + context_size, hidden_size,
                                 hidden_size, latent_size), dtype=dtype)
        self.h_net = MLP(ks[4], (latent_size, hidden_size, hidden_size,
                                 latent_size), dtype=dtype)
        # Per-dimension noise nets keep the diffusion diagonal
        # (reference latent_sde_lorenz.py:136-147): one shared stack applied
        # dimension-wise via vmap rather than a Python list of tiny nets.
        gk = jax.random.split(ks[5], latent_size)
        self.g_nets = jax.vmap(lambda k: _g_net_init(k, hidden_size, dtype))(gk)
        self.projector = Linear(ks[6], latent_size, data_size, dtype)
        self.pz0_mean = jnp.zeros((1, latent_size), dtype)
        self.pz0_logstd = jnp.zeros((1, latent_size), dtype)
        self.latent_size = latent_size
        self.context_size = context_size
        # Context path, attached per-batch via evolve(...) before solving.
        self._ctx_ts = jnp.zeros((1,), dtype)
        self._ctx = jnp.zeros((1, 1, context_size), dtype)

    # -- encoder -------------------------------------------------------- #

    def encode(self, xs, ts):
        """xs: (T, B, data). Runs the GRU over the reversed sequence so the
        context at time t summarises the future (reference :173-175)."""
        hs, _ = self.encoder(jnp.flip(xs, axis=0))
        ctx = self.encoder_proj(jnp.flip(hs, axis=0))
        return ctx

    def contextualize(self, ts, ctx):
        return self.evolve(_ctx_ts=jnp.asarray(ts, ctx.dtype), _ctx=ctx)

    def _ctx_at(self, t):
        i = jnp.searchsorted(self._ctx_ts, t, side="left")
        i = jnp.clip(i, 0, self._ctx.shape[0] - 1)
        return self._ctx[i]

    # -- SDE interface --------------------------------------------------- #

    def f(self, t, y):
        ctx = self._ctx_at(t)
        return self.f_net(jnp.concatenate([y, ctx], axis=1))

    def h(self, t, y):
        return self.h_net(y)

    def f_and_h(self, t, y):
        """Fused posterior+prior drift: both 3-layer towers as ONE stacked
        batched-einsum MLP (SDELogqp consumes this when present). The h tower
        sees only ``y`` — its first-layer weights are zero-padded over the
        context rows — so values match f()/h() exactly up to matmul regrouping.
        Halves the drift kernel launches per solver step, which is what the
        latency-bound logqp solve pays for (BENCH_NOTES §1)."""
        ctx = self._ctx_at(t)
        x = jnp.concatenate([y, ctx], axis=1)           # (B, L+C)
        fl, hl = self.f_net.layers, self.h_net.layers
        pad = jnp.zeros((ctx.shape[1], hl[0].w.shape[1]), hl[0].w.dtype)
        w1 = jnp.stack([fl[0].w, jnp.concatenate([hl[0].w, pad], axis=0)])
        z = jax.nn.softplus(jnp.einsum("bi,kih->kbh", x, w1)
                            + jnp.stack([fl[0].b, hl[0].b])[:, None, :])
        for i in (1, 2):
            w = jnp.stack([fl[i].w, hl[i].w])
            b = jnp.stack([fl[i].b, hl[i].b])[:, None, :]
            z = jnp.einsum("kbh,khj->kbj", z, w) + b
            if i == 1:
                z = jax.nn.softplus(z)
        return z[0], z[1]

    def g(self, t, y):
        # Stacked per-dimension nets applied in one batched einsum: the
        # diagonal structure of the reference's Python list of tiny nets
        # (latent_sde_lorenz.py:136-147) without L separate matmuls.
        w1, b1, w2, b2 = self.g_nets      # (L,1,H), (L,H), (L,H,1), (L,1)
        yi = y.T[..., None]               # (L, B, 1)
        h = jax.nn.softplus(jnp.einsum("lbi,lih->lbh", yi, w1) + b1[:, None, :])
        out = jax.nn.sigmoid(jnp.einsum("lbh,lho->lbo", h, w2) + b2[:, None, :])
        return out[..., 0].T              # (B, L)

    # -- training-time API ----------------------------------------------- #

    def posterior_z0(self, ctx0, key):
        qz0_mean, qz0_logstd = jnp.split(self.qz0_net(ctx0), 2, axis=1)
        eps = jax.random.normal(key, qz0_mean.shape, qz0_mean.dtype)
        z0 = qz0_mean + jnp.exp(qz0_logstd) * eps
        return z0, qz0_mean, qz0_logstd


def _g_net_init(key, hidden_size, dtype):
    k1, k2 = jax.random.split(key)
    s1 = 1.0
    w1 = jax.random.uniform(k1, (1, hidden_size), dtype, -s1, s1)
    b1 = jnp.zeros((hidden_size,), dtype)
    w2 = jax.random.uniform(k2, (hidden_size, 1), dtype,
                            -1.0 / hidden_size ** 0.5, 1.0 / hidden_size ** 0.5)
    b2 = jnp.zeros((1,), dtype)
    return (w1, b1, w2, b2)


def _normal_logp(x, mean, std):
    var = std ** 2
    return -0.5 * (jnp.log(2 * jnp.pi * var) + (x - mean) ** 2 / var)


def _kl_diag_normal(mean1, logstd1, mean2, logstd2):
    var1 = jnp.exp(2 * logstd1)
    var2 = jnp.exp(2 * logstd2)
    return (logstd2 - logstd1 + (var1 + (mean1 - mean2) ** 2) / (2 * var2) - 0.5)


def latent_sde_loss(model, xs, ts, key, noise_std=0.01, kl_weight=1.0,
                    dt=1e-2, method="euler", adjoint=False, fused=False,
                    **solve_kwargs):
    """ELBO loss (reference latent_sde_lorenz.py:171-199): reconstruction
    log-likelihood under the projector decoder, KL at t0, and the pathwise
    KL integral from the ``logqp`` channel.

    ``adjoint`` defaults to False — backprop-through-solver — matching the
    reference example's default (latent_sde_lorenz.py:287) and the faster
    mode at this scale: the per-step state is tiny, so storing scan residuals
    beats the adjoint's recompute+vjp backward 2x on v5e (BENCH_NOTES §1).
    Use ``adjoint=True`` for long horizons where O(1) solve memory matters.

    ``fused=True`` routes the Euler logqp solve through the whole-solve
    Pallas kernel (ops/latent_fused.py) — one kernel for all forward steps,
    one for the hand-derived backward, same noise stream as the XLA path."""
    ctx = model.encode(xs, ts)
    model = model.contextualize(ts, ctx)
    z0, qz0_mean, qz0_logstd = model.posterior_z0(ctx[0], key)

    if fused:
        if adjoint or method != "euler" or solve_kwargs:
            raise ValueError(
                "fused=True supports the default euler/backprop path only")
        from ..ops.latent_fused import latent_logqp_solve_fused
        zs, log_ratio = latent_logqp_solve_fused(
            model, z0, ts, jax.random.fold_in(key, 1), dt)
    else:
        solve = sdeint_adjoint if adjoint else sdeint
        zs, log_ratio = solve(model, z0, ts, dt=dt, method=method, logqp=True,
                              key=jax.random.fold_in(key, 1), **solve_kwargs)

    _xs = model.projector(zs)
    log_pxs = jnp.sum(jnp.mean(_normal_logp(xs, _xs, noise_std), axis=1))

    logqp0 = jnp.sum(jnp.mean(
        _kl_diag_normal(qz0_mean, qz0_logstd, model.pz0_mean, model.pz0_logstd),
        axis=0))
    logqp_path = jnp.mean(jnp.sum(log_ratio, axis=0))
    loss = -log_pxs + kl_weight * (logqp0 + logqp_path)
    return loss, dict(log_pxs=log_pxs, logqp=logqp0 + logqp_path)


def latent_sde_loss_multi(models, xs, ts, keys, noise_std=0.01,
                          kl_weight=1.0, dt=1e-2, fused=False):
    """ELBO losses for K independent replicas in ONE program — the
    aggregate-throughput remedy for the single-solve latency plateau
    (BENCH_NOTES §5, §8): K solver chains interleave on the chip, peaking
    at 262 agg steps/s at K=16 bf16 on v5e-1 vs 146 for one chain.

    ``models`` is a stacked ``LatentSDE`` pytree (leading replica axis, e.g.
    ``jax.vmap(lambda k: LatentSDE(k, ...))(jax.random.split(key, K))``);
    ``keys`` is ``(K,)``; ``xs`` is shared ``(T, B, D)`` or per-replica
    ``(K, T, B, D)``.

    ``fused=False`` (default) vmaps the whole per-replica loss — XLA
    interleaves the K independent chains; this is the measured-fastest
    multi-replica path (BENCH_NOTES §8). ``fused=True`` runs the K logqp
    Euler solves as ONE multi-replica whole-solve Pallas kernel pair
    (ops/latent_fused.py) with encoder/decoder/KL vmapped around it;
    measured slower at K>=2 (VPU-bound, §8 reading 5) but kept as the
    kernel-path option. Per-replica semantics match ``latent_sde_loss``.

    Returns ``(total_loss, per_replica_losses)`` — grad of the total gives
    each replica its own gradients (replicas are independent).
    """
    from ..ops.latent_fused import latent_logqp_solve_fused_multi

    xs_ax = 0 if xs.ndim == 4 else None

    if not fused:
        def one(model, xs_k, key):
            loss, _ = latent_sde_loss(model, xs_k, ts, key,
                                      noise_std=noise_std,
                                      kl_weight=kl_weight, dt=dt)
            return loss

        losses = jax.vmap(one, in_axes=(0, xs_ax, 0))(models, xs, keys)
        return jnp.sum(losses), losses

    def prep(model, xs_k, key):
        ctx = model.encode(xs_k, ts)
        m = model.contextualize(ts, ctx)
        z0, qz0_mean, qz0_logstd = m.posterior_z0(ctx[0], key)
        return m, z0, qz0_mean, qz0_logstd

    ms, z0, qz0_mean, qz0_logstd = jax.vmap(prep, in_axes=(0, xs_ax, 0))(
        models, xs, keys)
    solve_keys = jax.vmap(lambda k: jax.random.fold_in(k, 1))(keys)
    zs, log_ratio = latent_logqp_solve_fused_multi(ms, z0, ts, solve_keys, dt)

    def tail(m, xs_k, zs_k, lr_k, qm_k, ql_k):
        _xs = m.projector(zs_k)
        log_pxs = jnp.sum(jnp.mean(_normal_logp(xs_k, _xs, noise_std),
                                   axis=1))
        logqp0 = jnp.sum(jnp.mean(
            _kl_diag_normal(qm_k, ql_k, m.pz0_mean, m.pz0_logstd), axis=0))
        logqp_path = jnp.mean(jnp.sum(lr_k, axis=0))
        return -log_pxs + kl_weight * (logqp0 + logqp_path)

    losses = jax.vmap(tail, in_axes=(0, xs_ax, 0, 0, 0, 0))(
        ms, xs, zs, log_ratio, qz0_mean, qz0_logstd)
    return jnp.sum(losses), losses


def sample_posterior(model, xs, ts, key, dt=1e-2, method="euler"):
    """Posterior sample paths projected to data space."""
    ctx = model.encode(xs, ts)
    model = model.contextualize(ts, ctx)
    z0, _, _ = model.posterior_z0(ctx[0], key)
    zs = sdeint(model, z0, ts, dt=dt, method=method,
                key=jax.random.fold_in(key, 1))
    return model.projector(zs)


def sample_prior(model, batch_size, ts, key, dt=1e-2, method="euler"):
    """Prior sample paths: integrate the prior drift ``h`` with the same
    diffusion (reference latent_sde_lorenz.py:163-169 via names=)."""
    eps = jax.random.normal(key, (batch_size, model.latent_size),
                            model.pz0_mean.dtype)
    z0 = model.pz0_mean + jnp.exp(model.pz0_logstd) * eps
    model = model.contextualize(jnp.zeros((1,)), jnp.zeros(
        (1, batch_size, model.context_size), model.pz0_mean.dtype))
    zs = sdeint(model, z0, ts, dt=dt, method="euler",
                names={"drift": "h"}, key=jax.random.fold_in(key, 1))
    return model.projector(zs)


# --------------------------------------------------------------------------- #
#  Stochastic Lorenz attractor dataset (reference latent_sde_lorenz.py:56-96) #
# --------------------------------------------------------------------------- #

class StochasticLorenz(Module):
    noise_type = "diagonal"
    sde_type = "ito"

    def __init__(self, a=(10.0, 28.0, 8.0 / 3.0), b=(0.1, 0.28, 0.3)):
        self.a = jnp.asarray(a)
        self.b = jnp.asarray(b)

    def f(self, t, y):
        x1, x2, x3 = y[:, 0], y[:, 1], y[:, 2]
        a1, a2, a3 = self.a
        return jnp.stack([a1 * (x2 - x1), a2 * x1 - x2 - x1 * x3,
                          x1 * x2 - a3 * x3], axis=1)

    def g(self, t, y):
        return jnp.broadcast_to(self.b[None, :], y.shape)


def make_lorenz_data(key, batch_size, ts, noise_std=0.01, dt=1e-3):
    """Simulate the stochastic Lorenz attractor, normalise, add observation
    noise (reference latent_sde_lorenz.py:81-96)."""
    k1, k2, k3 = jax.random.split(key, 3)
    y0 = jax.random.normal(k1, (batch_size, 3)) * jnp.asarray([15.0, 15.0, 6.0])
    xs = sdeint(StochasticLorenz(), y0, ts, dt=dt, method="euler", key=k2)
    mean = jnp.mean(xs, axis=(0, 1), keepdims=True)
    std = jnp.std(xs, axis=(0, 1), keepdims=True)
    xs = (xs - mean) / (std + 1e-8)
    xs = xs + noise_std * jax.random.normal(k3, xs.shape)
    return xs
