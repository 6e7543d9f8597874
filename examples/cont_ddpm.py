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
    p.add_argument("--log-jsonl", type=str, default=None,
                   help="append per-step loss records to this JSONL file")
    p.add_argument("--artifacts-dir", type=str, default=None,
                   help="save the sample grid + acceptance record here")
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

    from _evidence import JsonlLogger, artifact_path, save_acceptance
    logger = JsonlLogger(args.log_jsonl)

    def blob_fit(samples):
        """Mean Pearson correlation between each sample and the ideal
        gaussian blob rendered at the sample's own peak position — 1.0 means
        the model generates exactly the data family (blobs of width H/8
        anywhere in the central region), ~0 for noise. Qualitative-sample
        acceptance in the spirit of the reference's scheduled image dumps
        (cont_ddpm.py:276-306), made numeric."""
        yy, xx = jnp.mgrid[0:H, 0:H]
        corrs = []
        for img in samples[:, 0]:
            # Peak of the lightly smoothed image = blob centre estimate.
            from scipy import ndimage
            sm = ndimage.gaussian_filter(jnp.asarray(img), 1.0)
            cy, cx = jnp.unravel_index(int(sm.argmax()), sm.shape)
            ideal = jnp.exp(-((xx - cx) ** 2 + (yy - cy) ** 2)
                            / (2 * (H / 8) ** 2)) * 2 - 1
            a = (img - img.mean()).ravel()
            b = (ideal - ideal.mean()).ravel()
            corrs.append(float((a @ b) / (jnp.linalg.norm(a)
                                          * jnp.linalg.norm(b) + 1e-12)))
        return float(jnp.mean(jnp.asarray(corrs)))

    losses = []
    log_every = max(1, args.steps // 200)
    for step in range(args.steps):
        idx = jax.random.permutation(jax.random.fold_in(key, 100 + step),
                                     data.shape[0])[:args.batch]
        sde, opt_state, loss = train_step(sde, opt_state,
                                          jax.random.fold_in(key, 200 + step),
                                          data[idx])
        if step % log_every == 0 or step == args.steps - 1:
            losses.append(float(loss))
            logger.write(step=step, loss=float(loss))
        if step % max(1, args.steps // 10) == 0:
            print(f"step {step:4d} score-matching loss {float(loss):10.3f}")

    rev = ReverseDiffeqWrapper(sde)
    n_show = 16
    samp_sde = rev.sde_sample_final(jax.random.fold_in(key, 900),
                                    batch_size=n_show, dt=args.sample_dt)
    samp_ode = rev.ode_sample(batch_size=4, dt=args.sample_dt,
                              key=jax.random.fold_in(key, 901))
    print("reverse-SDE samples:", samp_sde.shape,
          "finite:", bool(jnp.all(jnp.isfinite(samp_sde))),
          "range", float(samp_sde.min()), float(samp_sde.max()))
    print("prob-flow ODE samples:", samp_ode.shape,
          "finite:", bool(jnp.all(jnp.isfinite(samp_ode))))

    corr = blob_fit(samp_sde)
    loss0 = losses[0] if losses else float("nan")
    loss1 = (float(jnp.mean(jnp.asarray(losses[-10:])))
             if losses else float("nan"))
    # Acceptance: reverse-SDE samples are blob-shaped (mean correlation with
    # the ideal blob at each sample's own peak > 0.8; noise scores ~0) and
    # the score-matching loss dropped at least 3x from its first record
    # (RESULTS.md).
    save_acceptance(
        args.artifacts_dir, "cont_ddpm_acceptance.json",
        workload="cont_ddpm", steps=args.steps, batch=args.batch,
        loss_first=loss0, loss_final_mean10=loss1, blob_corr=corr,
        accept_blob_corr_above=0.8, accept_loss_drop_factor=3.0,
        passed=bool(corr > 0.8 and loss1 * 3.0 < loss0))

    if args.artifacts_dir:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(4, 8, figsize=(14, 7))
        for i in range(n_show):
            ax = axes[i // 8][i % 8]
            ax.imshow(jnp.asarray(samp_sde[i, 0]), cmap="gray",
                      vmin=-1, vmax=1)
            ax.set_title("sample", fontsize=7)
            ax.axis("off")
        for j in range(16):
            ax = axes[2 + j // 8][j % 8]
            ax.imshow(jnp.asarray(data[j, 0]), cmap="gray", vmin=-1, vmax=1)
            ax.set_title("data", fontsize=7)
            ax.axis("off")
        fig.suptitle(f"cont-DDPM reverse-SDE samples vs data "
                     f"(blob corr {corr:.3f}, loss {loss0:.1f} -> {loss1:.1f})")
        fig.tight_layout()
        out = artifact_path(args.artifacts_dir, "cont_ddpm_samples.png")
        fig.savefig(out, dpi=110)
        print("saved", out)


if __name__ == "__main__":
    main()
