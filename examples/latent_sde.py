"""1-D latent SDE fit to a noisy sinusoid.

Port of /root/reference/examples/latent_sde.py: a scalar latent SDE with an
OU prior (drift ``h = theta (mu - y)``), time-inhomogeneous posterior drift
with sinusoidal positional encoding, *manual* logqp augmentation via
``f_aug``/``g_aug`` + ``names=`` (reference latent_sde.py:128-158), KL
annealing, and SRK sampling with a space-time-Levy-area BrownianInterval
(reference :240-246). ``--adjoint`` switches to sdeint_adjoint.

Usage: python examples/latent_sde.py [--steps 100] [--adjoint] [--cpu]
"""

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--dt", type=float, default=1e-2)
    p.add_argument("--method", type=str, default="euler")
    p.add_argument("--adjoint", action="store_true")
    p.add_argument("--kl-anneal-iters", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--log-jsonl", type=str, default=None,
                   help="append per-step loss records here (JSONL)")
    p.add_argument("--artifacts-dir", type=str, default=None,
                   help="save the posterior-fit plot + acceptance record here")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from torchsde_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()  # persist XLA executables across runs
    import jax.numpy as jnp
    import optax

    import torchsde_tpu as tsde
    from torchsde_tpu.models.layers import MLP
    from torchsde_tpu.utils.misc import stable_division

    class LatentSDE1D(tsde.Module):
        noise_type = "diagonal"
        sde_type = "ito"

        def __init__(self, key, theta=1.0, mu=0.0, sigma=0.5):
            logvar = math.log(sigma ** 2 / (2.0 * theta))
            self.theta = jnp.asarray([[theta]])
            self.mu = jnp.asarray([[mu]])
            self.sigma = jnp.asarray([[sigma]])
            self.py0_mean = jnp.asarray([[mu]])
            self.py0_logvar = jnp.asarray([[logvar]])
            self.net = MLP(key, (3, 200, 200, 1), activation="tanh")
            # Glow-style zero init of the last layer.
            self.net.layers[-1].w = jnp.zeros_like(self.net.layers[-1].w)
            self.net.layers[-1].b = jnp.zeros_like(self.net.layers[-1].b)
            self.qy0_mean = jnp.asarray([[mu]])
            self.qy0_logvar = jnp.asarray([[logvar]])

        def f(self, t, y):  # posterior drift with positional encoding
            tt = jnp.broadcast_to(jnp.asarray(t, y.dtype), y.shape)
            return self.net(jnp.concatenate([jnp.sin(tt), jnp.cos(tt), y], axis=-1))

        def g(self, t, y):
            return jnp.broadcast_to(self.sigma, y.shape)

        def h(self, t, y):  # OU prior drift
            return self.theta * (self.mu - y)

        def f_aug(self, t, y):
            y = y[:, 0:1]
            f, g, h = self.f(t, y), self.g(t, y), self.h(t, y)
            u = stable_division(f - h, g)
            f_logqp = 0.5 * jnp.sum(u ** 2, axis=1, keepdims=True)
            return jnp.concatenate([f, f_logqp], axis=1)

        def g_aug(self, t, y):
            y = y[:, 0:1]
            g = self.g(t, y)
            return jnp.concatenate([g, jnp.zeros_like(y)], axis=1)

    def make_data(key, batch):
        """Irregularly-sampled sinusoid: 16 uniform times in [0.4, 1.6] plus
        the [0, 2] solve endpoints, ys = 0.8 sin(2 pi t) + observation noise
        (reference make_irregular_sine_data, latent_sde.py:196-206; the
        likelihood is evaluated only at the 16 interior observation times,
        reference :262-266)."""
        ts_obs = jnp.sort(jax.random.uniform(
            jax.random.fold_in(key, 0), (16,), minval=0.4, maxval=1.6))
        ts_ext = jnp.concatenate(
            [jnp.zeros((1,)), ts_obs, jnp.full((1,), 2.0)])
        ys_ = 0.8 * jnp.sin(ts_obs * (2.0 * math.pi))[None, :, None]
        ys_ = jnp.repeat(ys_, batch, axis=0)
        ys_ = ys_ + 0.01 * jax.random.normal(jax.random.fold_in(key, 1),
                                             ys_.shape)
        return ts_ext, jnp.transpose(ys_, (1, 0, 2))  # (16, B, 1)

    key = jax.random.PRNGKey(0)
    ts, ys_data = make_data(jax.random.fold_in(key, 0), args.batch)
    obs = slice(1, -1)  # interior observation times within the solve grid
    model = LatentSDE1D(jax.random.fold_in(key, 1))
    solve = tsde.sdeint_adjoint if args.adjoint else tsde.sdeint

    scale = 0.05  # observation noise

    def loss_fn(model, key, kl_coeff):
        eps = jax.random.normal(key, (args.batch, 1))
        qy0_std = jnp.exp(0.5 * model.qy0_logvar)
        py0_std = jnp.exp(0.5 * model.py0_logvar)
        y0 = model.qy0_mean + eps * qy0_std
        logqp0 = jnp.sum(
            model.py0_logvar / 2 - model.qy0_logvar / 2 +
            (qy0_std ** 2 + (model.qy0_mean - model.py0_mean) ** 2) /
            (2 * py0_std ** 2) - 0.5)
        aug_y0 = jnp.concatenate([y0, jnp.zeros((args.batch, 1))], axis=1)
        aug_ys = solve(model, aug_y0, ts, method=args.method, dt=args.dt,
                       names={"drift": "f_aug", "diffusion": "g_aug"},
                       key=jax.random.fold_in(key, 1))
        ys_model, logqp_path = aug_ys[obs, :, 0:1], aug_ys[-1, :, 1]
        logpy = jnp.sum(jnp.mean(
            -0.5 * ((ys_data - ys_model) / scale) ** 2
            - math.log(scale * math.sqrt(2 * math.pi)), axis=1))
        logqp = logqp0 + jnp.mean(logqp_path)
        return -logpy + kl_coeff * logqp, (logpy, logqp)

    opt = optax.adam(args.lr)
    opt_state = opt.init(model)

    @jax.jit
    def train_step(model, opt_state, key, kl_coeff):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            model, key, kl_coeff)
        updates, opt_state = opt.update(grads, opt_state, model)
        return optax.apply_updates(model, updates), opt_state, loss, aux

    from _evidence import JsonlLogger, artifact_path, save_acceptance
    logger = JsonlLogger(args.log_jsonl)

    t_dense = jnp.linspace(float(ts[0]), float(ts[-1]), 101)
    # Noiseless target at the interior observation times.
    ys_clean = 0.8 * jnp.sin(ts[obs] * (2.0 * math.pi))

    def posterior_fit_mse(model, key_, n=512):
        """MSE of the posterior mean (over n sampled paths) against the
        noiseless sinusoid at the observation times — the fit the
        reference's `vis()` percentile plots visualise
        (/root/reference/examples/latent_sde.py:283-339)."""
        eps = jax.random.normal(key_, (n, 1))
        y0 = model.qy0_mean + eps * jnp.exp(0.5 * model.qy0_logvar)
        zs = tsde.sdeint(model, y0, ts, method="euler", dt=args.dt,
                         key=jax.random.fold_in(key_, 1))
        post_mean = jnp.mean(zs[obs, :, 0], axis=1)  # (16,)
        return float(jnp.mean((post_mean - ys_clean) ** 2))

    mse0 = posterior_fit_mse(model, jax.random.fold_in(key, 999))
    print(f"initial posterior-fit MSE {mse0:.4f}")

    log_every = max(1, args.steps // 200)
    for step in range(args.steps):
        kl_coeff = min(1.0, step / args.kl_anneal_iters)
        model, opt_state, loss, (logpy, logqp) = train_step(
            model, opt_state, jax.random.fold_in(key, 100 + step), kl_coeff)
        if step % log_every == 0 or step == args.steps - 1:
            logger.write(step=step, loss=float(loss), logpy=float(logpy),
                         kl=float(logqp), kl_coeff=kl_coeff)
        if step % max(1, args.steps // 10) == 0:
            print(f"step {step:4d} loss {float(loss):10.3f} "
                  f"logpy {float(logpy):9.3f} kl {float(logqp):8.3f}")

    # Posterior sampling with SRK + space-time Levy area (reference :240-246).
    bm = tsde.BrownianInterval(t0=float(ts[0]), t1=float(ts[-1]),
                               size=(8, 1), levy_area_approximation="space-time",
                               entropy=42)
    y0 = jnp.broadcast_to(model.qy0_mean, (8, 1))
    zs = tsde.sdeint(model, y0, ts, bm=bm, method="srk", dt=args.dt)
    print("SRK posterior sample:", zs.shape,
          "finite:", bool(jnp.all(jnp.isfinite(zs))))
    print("final loss:", float(loss))

    mse1 = posterior_fit_mse(model, jax.random.fold_in(key, 999))
    # Acceptance: the trained posterior mean tracks the noiseless sinusoid
    # (amplitude 1, so the untrained zero-drift model sits at ~0.5 MSE).
    # Thresholds pre-registered: absolute fit below 0.05 AND >= 5x under the
    # untrained MSE.
    save_acceptance(
        args.artifacts_dir, "latent_sde_acceptance.json",
        workload="latent_sde_sinusoid", steps=args.steps, batch=args.batch,
        posterior_fit_mse_initial=mse0, posterior_fit_mse_final=mse1,
        accept_fit_mse_below=0.05, accept_improvement_factor=5.0,
        passed=bool(mse1 < 0.05 and mse1 * 5.0 < mse0))

    if args.artifacts_dir:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import numpy as np

        # Dense posterior percentile band + prior samples + data, the
        # reference vis() layout (latent_sde.py:283-339).
        n_vis = 512
        eps = jax.random.normal(jax.random.fold_in(key, 555), (n_vis, 1))
        y0v = model.qy0_mean + eps * jnp.exp(0.5 * model.qy0_logvar)
        zs_post = tsde.sdeint(model, y0v, t_dense, method="euler", dt=args.dt,
                              key=jax.random.fold_in(key, 556))[:, :, 0]
        eps_p = jax.random.normal(jax.random.fold_in(key, 557), (n_vis, 1))
        y0p = model.py0_mean + eps_p * jnp.exp(0.5 * model.py0_logvar)
        zs_prior = tsde.sdeint(model, y0p, t_dense, method="euler",
                               dt=args.dt, names={"drift": "h"},
                               key=jax.random.fold_in(key, 558))[:, :, 0]

        fig, ax = plt.subplots(figsize=(9, 5))
        td = np.asarray(t_dense)
        for zs_v, color, label in ((zs_post, "C0", "posterior"),
                                   (zs_prior, "C2", "prior")):
            lo, mid, hi = np.percentile(np.asarray(zs_v), [5, 50, 95], axis=1)
            ax.fill_between(td, lo, hi, alpha=0.2, color=color)
            ax.plot(td, mid, color=color, label=f"{label} median (5-95%)")
        ax.plot(td, 0.8 * np.sin(td * 2 * np.pi), "k--", lw=1,
                label="true sinusoid")
        ax.scatter(np.asarray(ts[obs]),
                   np.asarray(jnp.mean(ys_data[:, :, 0], axis=1)),
                   color="C3", zorder=5, label="data (batch mean)")
        ax.set_title(f"latent SDE sinusoid fit: posterior MSE "
                     f"{mse0:.3f} -> {mse1:.4f}")
        ax.legend()
        fig.tight_layout()
        out = artifact_path(args.artifacts_dir, "latent_sde_fit.png")
        fig.savefig(out, dpi=110)
        print("saved", out)


if __name__ == "__main__":
    main()
