"""SDE-GAN training throughput (the second BASELINE.md north-star workload).

Times one full GAN training step — reversible-Heun generator solve (dt=1),
one neural-CDE critic solve over fake+real at 2x batch, Wasserstein
objective with negated generator gradients, Adadelta updates, weight
clipping — at the reference's sde_gan.py scale (batch 1024, t_size 64,
reference /root/reference/examples/sde_gan.py:440 defaults) and the repo
example's smoke scale. Gradients are backprop-through-solver (identical
discrete gradients to the adjoint pair for reversible Heun, ~1.5x faster;
BENCH_NOTES §1b); --fused rows run the whole-solve Pallas kernels.

Usage: python benchmarks/sde_gan_bench.py [--cpu]. Recorded in BENCH_NOTES.md.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def measure(batch, t_size, hidden, mlp_size, num_layers, n_steps=32,
            platform=None, fused=False, dtype="float32"):
    import jax
    if platform:
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from torchsde_tpu.models import sde_gan as G

    key = jax.random.PRNGKey(0)
    ts_dev, data = G.get_ou_data(jax.random.fold_in(key, 0),
                                 max(batch, 1024), t_size)
    ts = np.asarray(ts_dev)

    jdt = jnp.dtype(dtype).type
    gen = G.Generator(jax.random.fold_in(key, 1), data_size=1,
                      initial_noise_size=5, noise_size=3, hidden_size=hidden,
                      mlp_size=mlp_size, num_layers=num_layers, dtype=jdt)
    disc = G.Discriminator(jax.random.fold_in(key, 2), data_size=1,
                           hidden_size=hidden + 1, mlp_size=mlp_size,
                           num_layers=num_layers, dtype=jdt)
    opt_g = optax.adadelta(2e-4)
    opt_d = optax.adadelta(1e-3)

    batch_data = jnp.asarray(data[:batch], jdt)

    def train_step(state, step_idx):
        gen, disc, sg, sd = state
        # fold_in inside the jit: an eager fold_in dispatches its own tiny
        # device program per iteration over the async tunnel (BENCH_NOTES 1a).
        # adjoint=False: for reversible Heun backprop-through-solver computes
        # the same exact discrete gradient as the adjoint pair and is ~1.5x
        # faster at this scale (BENCH_NOTES §1b).
        loss, g_gen, g_disc = G.gan_grads(gen, disc,
                                          jax.random.fold_in(key, step_idx),
                                          ts, batch_data, adjoint=False,
                                          fused=fused)
        ug, sg = opt_g.update(g_gen, sg, gen)
        gen = optax.apply_updates(gen, ug)
        ud, sd = opt_d.update(g_disc, sd, disc)
        disc = optax.apply_updates(disc, ud)
        disc = disc.clip_weights()  # Lipschitz constraint (sde_gan.py:409-416)
        return (gen, disc, sg, sd), loss

    # Packed training state: gen+disc+optimizer states cross the host/device
    # boundary as ONE flat buffer (~200 leaf handles otherwise; utils/packing)
    # — and K=4 full train steps run per dispatch inside lax.scan (the step
    # is ~4 ms with fused kernels, so per-dispatch tunnel overhead matters;
    # same methodology as bench.py).
    from torchsde_tpu.utils.packing import pack_train_step
    state0 = (gen, disc, opt_g.init(gen), opt_d.init(disc))
    step = pack_train_step(train_step, state0)
    K = 4
    multi = step.multi(K)
    n_timed = (n_steps // K) * K
    packed = step.pack(state0)
    packed, losses = multi(packed, jnp.int32(0))
    float(losses[-1])
    t0 = time.perf_counter()
    for i in range(n_timed // K):
        packed, losses = multi(packed, jnp.int32(i + 1))
    float(losses[-1])
    sps = n_timed / (time.perf_counter() - t0)
    return dict(batch=batch, t_size=t_size, hidden=hidden, fused=fused,
                dtype=dtype, steps_per_sec=round(sps, 2),
                samples_per_sec=round(sps * batch, 1),
                device=jax.devices()[0].platform)


def measure_multi(K, batch, t_size, hidden, mlp_size, num_layers,
                  n_steps=24, platform=None, dtype="float32", packed=False):
    """Aggregate adversarial-training throughput for K independent GAN
    replicas in ONE jitted program (parallel.replicas pattern): the K
    sequential reversible-Heun generator chains + CDE critic chains
    interleave on the chip, same remedy as the flagship's multi-replica
    table (BENCH_NOTES §8) applied to the second north-star workload."""
    import jax
    if platform:
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from torchsde_tpu.models import sde_gan as G

    jdt = jnp.dtype(dtype).type
    key = jax.random.PRNGKey(0)
    ts_dev, data = G.get_ou_data(jax.random.fold_in(key, 0),
                                 max(batch, 1024), t_size)
    ts = np.asarray(ts_dev)
    batch_data = jnp.asarray(data[:batch], jdt)

    def make_pair(k):
        gen = G.Generator(jax.random.fold_in(k, 1), data_size=1,
                          initial_noise_size=5, noise_size=3,
                          hidden_size=hidden, mlp_size=mlp_size,
                          num_layers=num_layers, dtype=jdt)
        disc = G.Discriminator(jax.random.fold_in(k, 2), data_size=1,
                               hidden_size=hidden + 1, mlp_size=mlp_size,
                               num_layers=num_layers, dtype=jdt)
        return gen, disc

    gens, discs = jax.vmap(make_pair)(jax.random.split(key, K))
    opt_g = optax.adadelta(2e-4)
    opt_d = optax.adadelta(1e-3)
    sgs = jax.vmap(opt_g.init)(gens)
    sds = jax.vmap(opt_d.init)(discs)

    def one(gen, disc, sg, sd, k):
        loss, g_gen, g_disc = G.gan_grads(gen, disc, k, ts, batch_data,
                                          adjoint=False)
        ug, sg = opt_g.update(g_gen, sg, gen)
        gen = optax.apply_updates(gen, ug)
        ud, sd = opt_d.update(g_disc, sd, disc)
        disc = optax.apply_updates(disc, ud)
        return gen, disc.clip_weights(), sg, sd, loss

    @jax.jit
    def step(state, i):
        gens, discs, sgs, sds = state
        ks = jax.vmap(lambda j: jax.random.fold_in(
            jax.random.fold_in(key, 9), i * K + j))(jnp.arange(K))
        gens, discs, sgs, sds, losses = jax.vmap(one)(gens, discs, sgs,
                                                      sds, ks)
        return (gens, discs, sgs, sds), losses

    state0 = (gens, discs, sgs, sds)
    if packed:
        # Packed state + 4 steps per dispatch (bench.py methodology): the
        # stacked GAN state is ~400 leaves x K otherwise.
        from torchsde_tpu.utils.packing import pack_train_step
        ps = pack_train_step(step, state0)
        mstep = ps.multi(4)
        n_steps = (n_steps // 4) * 4
        p = ps.pack(state0)
        p, losses = mstep(p, jnp.int32(0))
        float(jnp.asarray(losses[-1, -1], jnp.float32))
        t0 = time.perf_counter()
        for i in range(n_steps // 4):
            p, losses = mstep(p, jnp.int32(i + 1))
        float(jnp.asarray(losses[-1, -1], jnp.float32))
    else:
        state, losses = step(state0, jnp.int32(0))
        float(jnp.asarray(losses[-1], jnp.float32))
        t0 = time.perf_counter()
        for i in range(n_steps):
            state, losses = step(state, jnp.int32(i + 1))
        float(jnp.asarray(losses[-1], jnp.float32))
    agg = K * n_steps / (time.perf_counter() - t0)
    return dict(K=K, dtype=dtype, batch=batch, t_size=t_size, packed=packed,
                agg_steps_per_sec=round(agg, 2),
                per_replica=round(agg / K, 2),
                device=jax.devices()[0].platform)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--K", type=str, default=None,
                    help="comma-separated replica counts: run the "
                         "multi-replica aggregate sweep instead")
    ap.add_argument("--dtypes", type=str, default="float32,bfloat16")
    ap.add_argument("--packed", action="store_true")
    args = ap.parse_args()
    if args.K:
        platform = "cpu" if args.cpu else None
        for dtype in args.dtypes.split(","):
            for K in (int(k) for k in args.K.split(",")):
                print(json.dumps(measure_multi(
                    K, batch=1024, t_size=64, hidden=16, mlp_size=16,
                    num_layers=1, platform=platform, dtype=dtype,
                    packed=args.packed)))
        return
    platform = "cpu" if args.cpu else None
    # reference-scale config (sde_gan.py:440: batch 1024, t_size 64,
    # hidden 16, mlp 16, 1 layer) and the repo example's smoke scale
    for cfg in (dict(batch=1024, t_size=64, hidden=16, mlp_size=16,
                     num_layers=1),
                dict(batch=256, t_size=32, hidden=16, mlp_size=16,
                     num_layers=1)):
        print(json.dumps(measure(platform=platform, **cfg)))
        if not args.cpu:
            # Whole-solve Pallas kernels (ops/gan_fused.py), TPU only —
            # f32 and bf16 mixed mode (VERDICT r2 item 6 A/B).
            print(json.dumps(measure(platform=platform, fused=True, **cfg)))
            print(json.dumps(measure(platform=platform, fused=True,
                                     dtype="bfloat16", **cfg)))


if __name__ == "__main__":
    main()
