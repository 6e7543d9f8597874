"""Continuous-DDPM throughput (third workload family, BENCH_NOTES §1c).

Times (a) one score-matching training step (U-Net denoiser, VP-SDE
variance-weighted objective, Adam) and (b) reverse-time SDE sampling
throughput through ``sdeint`` on flattened image state — the two hot paths of
/root/reference/examples/cont_ddpm.py (train loop :232-259, sampling :204-214)
at MNIST scale (1x28x28, the reference's dataset).

Usage: python benchmarks/cont_ddpm_bench.py [--cpu]. Recorded in BENCH_NOTES.md.
"""

import argparse
import json
import time


def measure(batch, size, base_ch, ch_mults, sample_dt, n_steps=32,
            platform=None):
    import jax
    if platform:
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp
    import optax

    from torchsde_tpu.models.cont_ddpm import (ReverseDiffeqWrapper,
                                               ScoreMatchingSDE)
    from torchsde_tpu.models.unet import UNet

    key = jax.random.PRNGKey(0)
    denoiser = UNet(jax.random.fold_in(key, 1), in_ch=1, base_ch=base_ch,
                    ch_mults=ch_mults)
    sde = ScoreMatchingSDE(denoiser, input_size=(1, size, size))
    x = jax.random.normal(jax.random.fold_in(key, 2), (batch, 1, size, size))

    opt = optax.adam(1e-4)

    def train_step(state, step_idx):
        sde, opt_state = state

        def lf(s):
            return jnp.mean(s.loss(jax.random.fold_in(key, step_idx), x,
                                   partitions=1))
        loss, grads = jax.value_and_grad(lf)(sde)
        updates, opt_state = opt.update(grads, opt_state, sde)
        return (optax.apply_updates(sde, updates), opt_state), loss

    # Packed training state: U-Net + Adam state cross the tunnel as ONE
    # buffer per step instead of ~300 leaf handles (utils/packing.py).
    from torchsde_tpu.utils.packing import pack_train_step
    state0 = (sde, opt.init(sde))
    step = pack_train_step(train_step, state0)
    K = 4  # train steps per dispatch (bench.py methodology)
    multi = step.multi(K)
    n_timed = (n_steps // K) * K
    packed = step.pack(state0)
    packed, losses = multi(packed, jnp.int32(0))  # warmup
    float(losses[-1])
    t0 = time.perf_counter()
    for i in range(n_timed // K):
        packed, losses = multi(packed, jnp.int32(i + 1))
    float(losses[-1])
    train_sps = n_timed / (time.perf_counter() - t0)

    # Reverse-SDE sampling: euler with dt=sample_dt over [t0, t1]
    # (reference cont_ddpm.py:204-214; 1/dt denoiser evaluations per sample).
    rev = ReverseDiffeqWrapper(sde)

    @jax.jit
    def sample(sde, key):
        return ReverseDiffeqWrapper(sde).sde_sample_final(
            key, batch_size=batch, dt=sample_dt)

    y = sample(sde, key)
    float(jnp.sum(y))
    t0 = time.perf_counter()
    n_rep = 3
    for i in range(n_rep):
        y = sample(sde, jax.random.fold_in(key, 1000 + i))
    float(jnp.sum(y))
    sample_sps = n_rep * batch / (time.perf_counter() - t0)

    return {
        "batch": batch, "size": size, "base_ch": base_ch,
        "ch_mults": list(ch_mults), "sample_dt": sample_dt,
        "train_steps_per_s": round(train_sps, 2),
        "train_samples_per_s": round(train_sps * batch, 1),
        "sample_imgs_per_s": round(sample_sps, 1),
        "platform": jax.devices()[0].platform,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--quick", action="store_true",
                    help="tiny shapes for a smoke run")
    args = ap.parse_args()
    platform = "cpu" if args.cpu else None

    if args.quick:
        configs = [dict(batch=8, size=16, base_ch=8, ch_mults=(1, 2),
                        sample_dt=0.1)]
    else:
        configs = [
            # MNIST scale, reference-like U-Net depth.
            dict(batch=128, size=28, base_ch=32, ch_mults=(1, 2, 2),
                 sample_dt=0.01),
            dict(batch=512, size=28, base_ch=32, ch_mults=(1, 2, 2),
                 sample_dt=0.01),
        ]
    for cfg in configs:
        print(json.dumps(measure(platform=platform, **cfg)))


if __name__ == "__main__":
    main()
