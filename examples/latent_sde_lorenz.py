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
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
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

    for step in range(args.steps):
        kl_weight = min(1.0, step / args.kl_anneal_iters)
        model, opt_state, loss, aux = train_step(
            model, opt_state, jax.random.fold_in(key, 100 + step), kl_weight)
        if step % max(1, args.steps // 10) == 0:
            print(f"step {step:4d} loss {float(loss):12.3f} "
                  f"log_pxs {float(aux['log_pxs']):10.3f} "
                  f"kl {float(aux['logqp']):10.3f}")

    if args.save:
        from torchsde_tpu.utils.checkpoint import save_pytree
        print("saved to", save_pytree(args.save, model))

    samples = sample_posterior(model, xs, ts, jax.random.fold_in(key, 999))
    print("posterior samples:", samples.shape,
          "finite:", bool(jnp.all(jnp.isfinite(samples))))


if __name__ == "__main__":
    main()
