"""Latent SDE fit to the stochastic Lorenz attractor.

Port of /root/reference/examples/latent_sde_lorenz.py using the
``torchsde_tpu.models.latent_sde`` family: GRU encoder -> context, posterior
drift conditioned on context, learned prior ``h``, diagonal noise nets,
``logqp=True`` through the solver, adjoint gradients, one jitted train step.

Usage: python examples/latent_sde_lorenz.py [--steps 100] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--t-size", type=int, default=32)
    p.add_argument("--latent", type=int, default=4)
    p.add_argument("--context", type=int, default=64)
    p.add_argument("--hidden", type=int, default=128)
    p.add_argument("--dt", type=float, default=1e-2)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--kl-anneal-iters", type=int, default=50)
    p.add_argument("--no-adjoint", action="store_true")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--save", type=str, default=None,
                   help="checkpoint path to save the trained model")
    p.add_argument("--fused", action="store_true",
                   help="whole-solve Pallas kernels (TPU; needs --no-adjoint)")
    p.add_argument("--restore", type=str, default=None,
                   help="checkpoint path to restore before training")
    p.add_argument("--log-jsonl", type=str, default=None,
                   help="append per-step loss records to this JSONL file")
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

    from torchsde_tpu.models.latent_sde import (LatentSDE, latent_sde_loss,
                                                make_lorenz_data,
                                                sample_posterior)

    key = jax.random.PRNGKey(0)
    ts = jnp.linspace(0.0, 1.0, args.t_size)
    xs = make_lorenz_data(jax.random.fold_in(key, 0), args.batch, ts)
    model = LatentSDE(jax.random.fold_in(key, 1), data_size=3,
                      latent_size=args.latent, context_size=args.context,
                      hidden_size=args.hidden)
    if args.restore:
        from torchsde_tpu.utils.checkpoint import load_pytree
        model = load_pytree(args.restore, model)
        print("restored from", args.restore)

    opt = optax.adam(args.lr)
    opt_state = opt.init(model)

    @jax.jit
    def train_step(model, opt_state, key, kl_weight):
        def lf(m):
            return latent_sde_loss(m, xs, ts, key, dt=args.dt,
                                   kl_weight=kl_weight,
                                   adjoint=not args.no_adjoint,
                                   fused=args.fused)
        (loss, aux), grads = jax.value_and_grad(lf, has_aux=True)(model)
        updates, opt_state = opt.update(grads, opt_state, model)
        return optax.apply_updates(model, updates), opt_state, loss, aux

    from _evidence import JsonlLogger, artifact_path, save_acceptance
    logger = JsonlLogger(args.log_jsonl)

    def recon_mse(model, key_):
        """Reconstruction MSE of one posterior sample path vs the data, in
        normalised data units (the eval the reference's fit plots visualise,
        latent_sde_lorenz.py:204-260)."""
        samples = sample_posterior(model, xs, ts, key_, dt=args.dt)
        return float(jnp.mean((samples - xs) ** 2))

    mse0 = recon_mse(model, jax.random.fold_in(key, 999))
    print(f"initial reconstruction MSE {mse0:.4f}")

    log_every = max(1, args.steps // 200)
    for step in range(args.steps):
        kl_weight = min(1.0, step / args.kl_anneal_iters)
        model, opt_state, loss, aux = train_step(
            model, opt_state, jax.random.fold_in(key, 100 + step), kl_weight)
        if step % log_every == 0 or step == args.steps - 1:
            logger.write(step=step, loss=float(loss),
                         log_pxs=float(aux["log_pxs"]),
                         kl=float(aux["logqp"]), kl_weight=kl_weight)
        if step % max(1, args.steps // 10) == 0:
            print(f"step {step:4d} loss {float(loss):12.3f} "
                  f"log_pxs {float(aux['log_pxs']):10.3f} "
                  f"kl {float(aux['logqp']):10.3f}")

    if args.save:
        from torchsde_tpu.utils.checkpoint import save_pytree
        print("saved to", save_pytree(args.save, model))

    samples = sample_posterior(model, xs, ts, jax.random.fold_in(key, 999),
                               dt=args.dt)
    print("posterior samples:", samples.shape,
          "finite:", bool(jnp.all(jnp.isfinite(samples))))

    # same model/key/inputs as `samples` above — reuse instead of re-solving
    mse1 = float(jnp.mean((samples - xs) ** 2))
    # Acceptance: the trained posterior reconstructs the (unit-variance
    # normalised) Lorenz paths far better than the untrained model — below
    # an absolute 0.15 data-variance units AND at least 4x under the
    # untrained MSE. Thresholds sit well above the converged value and well
    # below the untrained one (RESULTS.md).
    save_acceptance(
        args.artifacts_dir, "latent_sde_lorenz_acceptance.json",
        workload="latent_sde_lorenz", steps=args.steps, batch=args.batch,
        recon_mse_initial=mse0, recon_mse_final=mse1,
        accept_recon_mse_below=0.15, accept_improvement_factor=4.0,
        passed=bool(mse1 < 0.15 and mse1 * 4.0 < mse0))

    if args.artifacts_dir:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig = plt.figure(figsize=(12, 7))
        ts_np = jnp.asarray(ts)
        n_show = 4
        for dim, label in enumerate("xyz"):
            ax = fig.add_subplot(2, 3, dim + 1)
            for b in range(n_show):
                ax.plot(ts_np, xs[:, b, dim], lw=1.0, alpha=0.8,
                        color=f"C{b}")
                ax.plot(ts_np, samples[:, b, dim], lw=1.0, ls="--",
                        color=f"C{b}")
            ax.set_title(f"{label}(t): data (solid) vs posterior (dashed)")
        ax3d = fig.add_subplot(2, 3, 4, projection="3d")
        for b in range(n_show):
            ax3d.plot(xs[:, b, 0], xs[:, b, 1], xs[:, b, 2], lw=0.8,
                      color=f"C{b}")
        ax3d.set_title("data")
        bx3d = fig.add_subplot(2, 3, 5, projection="3d")
        for b in range(n_show):
            bx3d.plot(samples[:, b, 0], samples[:, b, 1], samples[:, b, 2],
                      lw=0.8, ls="--", color=f"C{b}")
        bx3d.set_title("posterior samples")
        ax = fig.add_subplot(2, 3, 6)
        ax.set_title(f"recon MSE {mse0:.3f} -> {mse1:.4f}")
        ax.axis("off")
        fig.tight_layout()
        out = artifact_path(args.artifacts_dir, "latent_sde_lorenz_fit.png")
        fig.savefig(out, dpi=110)
        print("saved", out)


if __name__ == "__main__":
    main()
