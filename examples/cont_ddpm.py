"""Continuous-time DDPM on synthetic images.

Port of /root/reference/examples/cont_ddpm.py: VP-SDE score matching with a
U-Net denoiser, reverse-time SDE sampling through sdeint (with Tweedie
correction) and probability-flow ODE sampling. Uses synthetic gaussian-blob
images (no dataset download in this environment).

Usage: python examples/cont_ddpm.py [--steps 200] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--size", type=int, default=16)
    p.add_argument("--base-ch", type=int, default=32)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--sample-dt", type=float, default=2e-2)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from torchsde_tpu.models.cont_ddpm import ReverseDiffeqWrapper, ScoreMatchingSDE
    from torchsde_tpu.models.unet import UNet

    key = jax.random.PRNGKey(0)
    H = args.size

    def make_blobs(key, n):
        """Images of a single gaussian blob at a random position."""
        k1, k2 = jax.random.split(key)
        cx = jax.random.uniform(k1, (n, 1, 1), minval=0.25 * H, maxval=0.75 * H)
        cy = jax.random.uniform(k2, (n, 1, 1), minval=0.25 * H, maxval=0.75 * H)
        yy, xx = jnp.mgrid[0:H, 0:H]
        img = jnp.exp(-((xx[None] - cx) ** 2 + (yy[None] - cy) ** 2) / (2 * (H / 8) ** 2))
        return (img * 2 - 1)[:, None, :, :]  # (N, 1, H, H) in [-1, 1]

    data = make_blobs(jax.random.fold_in(key, 0), 512)

    denoiser = UNet(jax.random.fold_in(key, 1), in_ch=1, base_ch=args.base_ch,
                    ch_mults=(1, 2))
    sde = ScoreMatchingSDE(denoiser, input_size=(1, H, H))

    opt = optax.adam(args.lr)
    opt_state = opt.init(sde)

    @jax.jit
    def train_step(sde, opt_state, key, x):
        def lf(s):
            return jnp.mean(s.loss(key, x, partitions=1))
        loss, grads = jax.value_and_grad(lf)(sde)
        updates, opt_state = opt.update(grads, opt_state, sde)
        return optax.apply_updates(sde, updates), opt_state, loss

    for step in range(args.steps):
        idx = jax.random.permutation(jax.random.fold_in(key, 100 + step),
                                     data.shape[0])[:args.batch]
        sde, opt_state, loss = train_step(sde, opt_state,
                                          jax.random.fold_in(key, 200 + step),
                                          data[idx])
        if step % max(1, args.steps // 10) == 0:
            print(f"step {step:4d} score-matching loss {float(loss):10.3f}")

    rev = ReverseDiffeqWrapper(sde)
    samp_sde = rev.sde_sample_final(jax.random.fold_in(key, 900),
                                    batch_size=4, dt=args.sample_dt)
    samp_ode = rev.ode_sample(batch_size=4, dt=args.sample_dt,
                              key=jax.random.fold_in(key, 901))
    print("reverse-SDE samples:", samp_sde.shape,
          "finite:", bool(jnp.all(jnp.isfinite(samp_sde))),
          "range", float(samp_sde.min()), float(samp_sde.max()))
    print("prob-flow ODE samples:", samp_ode.shape,
          "finite:", bool(jnp.all(jnp.isfinite(samp_ode))))


if __name__ == "__main__":
    main()
