"""A/B benchmark: fused whole-solve latent-SDE kernel vs the XLA scan path.

Measures (a) isolated solve fwd/grad wall-times and (b) the full flagship
train step (encoder + logqp solve + decode + SGD), both at the BENCH_NOTES
flagship config. Run on the TPU host: ``python benchmarks/latent_fused_bench.py``.
Numbers recorded in BENCH_NOTES §1a-bis.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from torchsde_tpu.core.sdeint import sdeint
from torchsde_tpu.models.latent_sde import LatentSDE, latent_sde_loss
from torchsde_tpu.ops.latent_fused import latent_logqp_solve_fused
from torchsde_tpu.utils.packing import pack_train_step

BATCH, DATA, LATENT, CTX, HIDDEN = 1024, 3, 4, 64, 128
T_SIZE, T1, DT, WINDOW = 32, 1.0, 1.0 / 128, 48


def chain_time(fn, n=32):
    s = fn(jnp.float32(0.0))
    float(s)
    t0 = time.perf_counter()
    for _ in range(n):
        s = fn(s)
    float(s)
    return (time.perf_counter() - t0) / n * 1e3


def solve_ab():
    key = jax.random.PRNGKey(0)
    ts = np.linspace(0.0, T1, T_SIZE)
    model = LatentSDE(key, DATA, LATENT, CTX, HIDDEN)
    xs = jax.random.normal(jax.random.fold_in(key, 1), (T_SIZE, BATCH, DATA))
    m = model.contextualize(ts, jax.jit(model.encode)(xs, jnp.asarray(ts)))
    z0 = jax.random.normal(jax.random.fold_in(key, 2), (BATCH, LATENT))
    nkey = jax.random.PRNGKey(7)

    xla = lambda m, z: sdeint(m, z, ts, dt=DT, logqp=True, key=nkey,  # noqa: E731
                              method="euler")
    fus = lambda m, z: latent_logqp_solve_fused(m, z, ts, nkey, DT)  # noqa: E731

    def mkloss(solver):
        def loss(m, z0):
            zs, kl = solver(m, z0)
            return jnp.sum(zs ** 2) * 1e-3 + jnp.sum(jnp.mean(kl, axis=1))
        return loss

    for name, solver in (("XLA", xla), ("fused", fus)):
        fwd = jax.jit(lambda s, solver=solver: jnp.sum(
            solver(m, z0 + 0 * s)[0]))
        grad = jax.jit(lambda s, solver=solver: jnp.sum(
            jax.grad(mkloss(solver))(m, z0 + 0 * s).f_net.layers[0].w))
        print(f"{name:5s} solve: fwd {chain_time(fwd):5.2f} ms   "
              f"grad {chain_time(grad):5.2f} ms")


def train_step_ab():
    key = jax.random.PRNGKey(0)
    ts = jnp.linspace(0.0, T1, T_SIZE)
    xs = jax.random.normal(jax.random.fold_in(key, 1), (T_SIZE, BATCH, DATA))
    model = LatentSDE(jax.random.fold_in(key, 2), DATA, LATENT, CTX, HIDDEN)

    def measure(fused):
        def loss_fn(model, xs, key):
            loss, _ = latent_sde_loss(model, xs, ts, key, dt=DT, fused=fused)
            return loss

        def train_step(model, step_idx):
            loss, grads = jax.value_and_grad(loss_fn)(
                model, xs, jax.random.fold_in(key, step_idx))
            model = jax.tree_util.tree_map(lambda p, g: p - 1e-4 * g,
                                           model, grads)
            return model, loss

        step = pack_train_step(train_step, model)
        packed = step.pack(model)
        _, loss = step(packed, jnp.int32(0))
        float(loss)
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            p = packed
            for i in range(WINDOW):
                p, loss = step(p, jnp.int32(i))
            float(loss)
            best = max(best, WINDOW / (time.perf_counter() - t0))
        return best

    print(f"train step, XLA solve  : {measure(False):6.1f} steps/s")
    print(f"train step, fused solve: {measure(True):6.1f} steps/s")


if __name__ == "__main__":
    solve_ab()
    train_step_ab()
