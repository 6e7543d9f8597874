"""Aggregate throughput past the single-solve latency plateau (VERDICT r1 #1).

The flagship latent-SDE train step is latency-bound: 256 sequential solver
steps per training step, each a handful of small matmuls, leaving the chip
idle most of each step (BENCH_NOTES §5). The fix is batching INDEPENDENT
work per dispatch: K replicas (independent models with stacked weights)
train in one jitted program via `jax.vmap` of the whole train step, so the
K sequential chains interleave on the chip and aggregate steps/s scales
until compute saturates.

Measures aggregate train steps/s for K in {1, 2, 4, 8} x {XLA, fused} x
{f32, bf16} at the flagship config, with the same timing discipline as
bench.py (chained dispatches, one scalar fetch at the end).

Usage: python benchmarks/multi_solve_bench.py [--cpu] [--quick]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH = 1024
DATA = 3
LATENT = 4
CTX = 64
HIDDEN = 128
T_SIZE = 32
T1 = 1.0
DT = 1.0 / 128


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--quick", action="store_true",
                   help="small config for a smoke run")
    p.add_argument("--steps", type=int, default=24)
    p.add_argument("--K", type=str, default="1,2,4,8",
                   help="comma-separated replica counts")
    p.add_argument("--dtypes", type=str, default="float32,bfloat16")
    p.add_argument("--paths", type=str, default="xla,fused")
    p.add_argument("--packed", action="store_true",
                   help="packed training state + 4 steps per dispatch "
                        "(bench.py methodology) for peak-aggregate rows")
    p.add_argument("--remat", action="store_true",
                   help="checkpoint the solver scan body (sdeint remat=True): "
                        "O(states) instead of O(activations) residuals, "
                        "unlocking larger K")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from torchsde_tpu.models.latent_sde import (LatentSDE, latent_sde_loss,
                                                latent_sde_loss_multi)

    global BATCH, T_SIZE
    if args.quick:
        BATCH, T_SIZE = 64, 8

    key = jax.random.PRNGKey(0)
    ts = jnp.linspace(0.0, T1, T_SIZE)

    def bench_config(K, dtype, fused, n_steps):
        xs = jax.random.normal(jax.random.fold_in(key, 1),
                               (T_SIZE, BATCH, DATA)).astype(dtype)

        def make(k):
            return LatentSDE(k, DATA, LATENT, CTX, HIDDEN, dtype=dtype)

        models = jax.vmap(make)(jax.random.split(key, K))

        def loss_one(model, k):
            kw = dict(remat=True) if (args.remat and fused == "xla") else {}
            loss, _ = latent_sde_loss(model, xs, ts, k, dt=DT,
                                      fused=fused == "fused", **kw)
            return loss

        @jax.jit
        def step(models, i):
            ks = jax.vmap(lambda j: jax.random.fold_in(
                jax.random.fold_in(key, 7), i * K + j))(jnp.arange(K))
            if fused == "fused_multi":
                # K-unrolled whole-solve kernels: the K chains interleave
                # INSIDE one pallas_call (vmap of pallas_call serialises).
                (_, losses), grads = jax.value_and_grad(
                    lambda m: latent_sde_loss_multi(m, xs, ts, ks, dt=DT,
                                                    fused=True),
                    has_aux=True)(models)
            else:
                losses, grads = jax.vmap(
                    jax.value_and_grad(loss_one))(models, ks)
            models = jax.tree_util.tree_map(
                lambda p_, g_: p_ - jnp.asarray(1e-4, p_.dtype) * g_,
                models, grads)
            return models, losses

        if args.packed:
            from torchsde_tpu.utils.packing import pack_train_step
            ps = pack_train_step(step, models)
            mstep = ps.multi(4)
            n_steps = (n_steps // 4) * 4
            p_ = ps.pack(models)
            p_, losses = mstep(p_, jnp.int32(0))
            float(jnp.asarray(losses[-1, -1], jnp.float32))
            t0 = time.perf_counter()
            for i in range(n_steps // 4):
                p_, losses = mstep(p_, jnp.int32(i + 1))
            float(jnp.asarray(losses[-1, -1], jnp.float32))
            return K * n_steps / (time.perf_counter() - t0)
        m, losses = step(models, jnp.int32(0))   # compile + warmup
        float(jnp.asarray(losses[-1], jnp.float32))
        t0 = time.perf_counter()
        for i in range(n_steps):
            m, losses = step(m, jnp.int32(i + 1))
        float(jnp.asarray(losses[-1], jnp.float32))
        elapsed = time.perf_counter() - t0
        return K * n_steps / elapsed

    platform = jax.devices()[0].platform
    print(f"platform {platform}; batch {BATCH}, T {T_SIZE}, dt 1/128, "
          f"hidden {HIDDEN} (flagship config)")
    print(f"{'K':>3} {'dtype':>9} {'path':>11} {'agg steps/s':>12} "
          f"{'per-replica':>12} {'scaling':>8}")

    paths = args.paths.split(",")
    if platform == "cpu":
        paths = ["xla"]
    dtypes = [jnp.dtype(d).type for d in args.dtypes.split(",")]
    Ks = [int(k) for k in args.K.split(",")]
    for fused in paths:
        for dtype in dtypes:
            base = None
            for K in Ks:
                try:
                    agg = bench_config(K, dtype, fused, args.steps)
                except Exception as e:
                    print(f"{K:>3} {jnp.dtype(dtype).name:>9} "
                          f"{fused:>11}   "
                          f"FAILED: {type(e).__name__}: {str(e)[:120]}")
                    break
                if base is None:
                    base = agg
                print(f"{K:>3} {jnp.dtype(dtype).name:>9} "
                      f"{fused:>11} {agg:>12.1f} "
                      f"{agg / K:>12.1f} {agg / base:>7.2f}x")


if __name__ == "__main__":
    main()
