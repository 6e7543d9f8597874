"""Guided tour of torchsde_tpu (script form of the reference's examples/demo.ipynb).

Covers: defining SDEs, the four noise types, fixed randomness via ``bm=``,
gradients (backprop and adjoint), jit, and batch-axis sharding.

Usage: python examples/demo.py [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from torchsde_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()  # persist XLA executables across runs
    import jax.numpy as jnp

    import torchsde_tpu as tsde

    print("== 1. Define an SDE (general noise, Ito) ==")

    class GeneralSDE(tsde.BaseSDE):
        def __init__(self, key, d, m):
            super().__init__(noise_type="general", sde_type="ito")
            k1, k2 = jax.random.split(key)
            self.mu = jax.random.normal(k1, (d, d)) * 0.1
            self.sigma = jax.random.normal(k2, (d, d * m)) * 0.1
            self.d, self.m = d, m

        def f(self, t, y):
            return y @ self.mu.T

        def g(self, t, y):
            return (y @ self.sigma).reshape(y.shape[0], self.d, self.m)

    key = jax.random.PRNGKey(0)
    sde = GeneralSDE(key, d=3, m=2)
    y0 = jnp.full((32, 3), 0.1)
    ts = jnp.linspace(0.0, 1.0, 20)
    ys = tsde.sdeint(sde, y0, ts, method="euler", dt=1e-2, entropy=42)
    print("solution:", ys.shape, "final mean:", float(ys[-1].mean()))

    print("== 2. Fixed randomness via bm= ==")
    bm = tsde.BrownianInterval(t0=0.0, t1=1.0, size=(32, 2), entropy=7,
                               levy_area_approximation="space-time")
    ys_a = tsde.sdeint(sde, y0, ts, bm=bm, method="euler", dt=1e-2)
    ys_b = tsde.sdeint(sde, y0, ts, bm=bm, method="euler", dt=1e-2)
    print("same bm twice -> identical:", bool(jnp.all(ys_a == ys_b)))
    W, U = bm(0.2, 0.7, return_U=True)
    print("bm(0.2, 0.7) increment std:", float(W.std()), "(expect ~0.707)")

    print("== 3. Gradients: backprop vs adjoint ==")

    def loss_bp(sde):
        return tsde.sdeint(sde, y0, ts, bm=bm, method="euler", dt=1e-2)[-1].sum()

    def loss_adj(sde):
        return tsde.sdeint_adjoint(sde, y0, ts, bm=bm, method="euler",
                                   dt=1e-2)[-1].sum()

    g_bp = jax.grad(loss_bp)(sde)
    g_adj = jax.grad(loss_adj)(sde)
    err = max(float(jnp.abs(a - b).max())
              for a, b in zip(g_bp.parameters(), g_adj.parameters()))
    print("adjoint vs backprop param-grad max diff:", err)

    print("== 4. Everything under jit ==")
    fast = jax.jit(loss_adj)
    print("jitted loss:", float(fast(sde)))

    print("== 5. Other noise types + higher-order solvers ==")

    class DiagSDE(tsde.SDEIto):
        def __init__(self):
            super().__init__(noise_type="diagonal")

        def f(self, t, y):
            return jnp.sin(t) + 0.1 * y

        def g(self, t, y):
            return 0.3 * jax.nn.sigmoid(y)

    ys_srk = tsde.sdeint(DiagSDE(), y0, ts, method="srk", dt=1e-2, entropy=1)
    print("SRK (strong order 1.5) diagonal solve:", ys_srk.shape)

    print("== 6. Whole-solve kernel compilation (TPU) ==")
    # Declare the SDE's towers and the ENTIRE solve compiles to one Pallas
    # kernel forward + one hand-derived-backward kernel (fixed-step,
    # euler/reversible_heun, diagonal/general noise). On CPU this demo runs
    # the kernels through the Pallas interpreter.
    from torchsde_tpu.ops import fused_solve as FS
    if jax.devices()[0].platform != "tpu":
        FS._INTERPRET = True
    key = jax.random.PRNGKey(0)
    w1 = jax.random.normal(key, (3, 16), jnp.float32) * 0.2
    w2 = jax.random.normal(jax.random.fold_in(key, 1), (16, 3),
                           jnp.float32) * 0.2
    drift = FS.TowerSpec([(w1, jnp.zeros((16,), jnp.float32), "softplus"),
                          (w2, jnp.zeros((3,), jnp.float32), "linear")])
    gw = jax.random.normal(jax.random.fold_in(key, 2), (3, 3),
                           jnp.float32) * 0.2
    diffusion = FS.TowerSpec([(gw, jnp.zeros((3,), jnp.float32), "sigmoid")])
    ys_fused = FS.fused_sdeint(drift, diffusion, y0,
                               [0.0, 0.25, 0.5, 0.75, 1.0],
                               jax.random.fold_in(key, 3), 0.25)
    print("fused whole-solve kernel:", ys_fused.shape)

    print("== 7. Batch-axis data parallelism ==")
    from torchsde_tpu.parallel import mesh as pmesh
    if len(jax.devices()) > 1:
        m = pmesh.make_mesh()
        y0_sharded = pmesh.shard_batch(y0, m)
        ys_dp = tsde.sdeint(sde, y0_sharded, ts, bm=bm, method="euler", dt=1e-2)
        print(f"sharded over {len(jax.devices())} devices:", ys_dp.shape)
    else:
        print("single device; run with XLA_FLAGS=--xla_force_host_platform_device_count=8 "
              "and --cpu to see sharding")


if __name__ == "__main__":
    main()
