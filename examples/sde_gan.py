"""SDE-GAN on time-dependent Ornstein-Uhlenbeck data.

Port of /root/reference/examples/sde_gan.py: reversible-Heun generator with
exact adjoint gradients (dt=1.0), linear-interpolation neural-CDE
discriminator, Wasserstein objective with negated generator gradients,
Adadelta, weight clipping, and stochastic weight averaging.

Usage: python examples/sde_gan.py [--steps 200] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--t-size", type=int, default=32)
    p.add_argument("--dataset-size", type=int, default=1024)
    p.add_argument("--init-noise", type=int, default=5)
    p.add_argument("--noise-size", type=int, default=3)
    p.add_argument("--hidden", type=int, default=16)
    p.add_argument("--mlp-size", type=int, default=16)
    p.add_argument("--num-layers", type=int, default=1)
    p.add_argument("--gen-lr", type=float, default=2e-4)
    p.add_argument("--disc-lr", type=float, default=1e-3)
    p.add_argument("--weight-decay", type=float, default=0.01)
    p.add_argument("--swa-step-start", type=int, default=100)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--fused", action="store_true",
                   help="whole-solve Pallas kernels (TPU)")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from torchsde_tpu.models import sde_gan as G

    key = jax.random.PRNGKey(0)
    ts_dev, data = G.get_ou_data(jax.random.fold_in(key, 0), args.dataset_size,
                                 args.t_size)
    ts = np.asarray(ts_dev)

    gen = G.Generator(jax.random.fold_in(key, 1), data_size=1,
                      initial_noise_size=args.init_noise,
                      noise_size=args.noise_size, hidden_size=args.hidden,
                      mlp_size=args.mlp_size, num_layers=args.num_layers)
    disc = G.Discriminator(jax.random.fold_in(key, 2), data_size=1,
                           hidden_size=args.hidden + 1, mlp_size=args.mlp_size,
                           num_layers=args.num_layers)

    opt_g = optax.chain(optax.add_decayed_weights(args.weight_decay),
                        optax.adadelta(args.gen_lr))
    opt_d = optax.chain(optax.add_decayed_weights(args.weight_decay),
                        optax.adadelta(args.disc_lr))
    sg, sd = opt_g.init(gen), opt_d.init(disc)

    @jax.jit
    def train_step(gen, disc, sg, sd, key, batch):
        loss, g_gen, g_disc = G.gan_grads(gen, disc, key, ts, batch,
                                          adjoint=not args.fused,
                                          fused=args.fused)
        ug, sg = opt_g.update(g_gen, sg, gen)
        gen = optax.apply_updates(gen, ug)
        ud, sd = opt_d.update(g_disc, sd, disc)
        disc = optax.apply_updates(disc, ud)
        disc = disc.clip_weights()
        return gen, disc, sg, sd, loss

    # Stochastic weight averaging (reference sde_gan.py:370-371, 419-421).
    avg_gen, avg_disc, n_avg = gen, disc, 0

    for step in range(args.steps):
        idx = jax.random.permutation(jax.random.fold_in(key, 1000 + step),
                                     args.dataset_size)[:args.batch]
        batch = data[idx]
        gen, disc, sg, sd, loss = train_step(
            gen, disc, sg, sd, jax.random.fold_in(key, 2000 + step), batch)
        if step >= args.swa_step_start:
            w = 1.0 / (n_avg + 1)
            avg_gen = jax.tree_util.tree_map(
                lambda a, b: (1 - w) * a + w * b, avg_gen, gen)
            avg_disc = jax.tree_util.tree_map(
                lambda a, b: (1 - w) * a + w * b, avg_disc, disc)
            n_avg += 1
        else:
            avg_gen, avg_disc = gen, disc
        if step % max(1, args.steps // 10) == 0:
            print(f"step {step:4d} wasserstein loss {float(loss):9.4f}")

    fake = avg_gen(jax.random.fold_in(key, 9999), ts, 8)
    print("generated paths:", fake.shape,
          "finite:", bool(jnp.all(jnp.isfinite(fake))))
    real_mean = float(jnp.mean(data[..., 1]))
    fake_mean = float(jnp.mean(fake[..., 1]))
    print(f"real mean {real_mean:+.3f}  generated mean {fake_mean:+.3f}")


if __name__ == "__main__":
    main()
