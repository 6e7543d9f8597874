"""Fused-Pallas vs XLA-scan SRK solve benchmark (VERDICT r1 item 7).

Times a full fixed-step srid2 solve of the ExDiagonal fixture
(geometric-Brownian-like diagonal SDE, tests/problems.py:45) at the VERDICT's
batch sizes 1024 / 16384, plus a wide-state configuration, comparing:

* ``srk_solve_xla``    — srid2 stage math under ``lax.scan`` (the framework's
                          integrate_fixed path for method='srk');
* ``srk_solve_fused``  — the whole solve in ONE Pallas kernel
                          (ops/srk_fused.py): VMEM-resident state, per-step
                          noise streamed HBM->VMEM with double buffering.

Run on the TPU: ``python benchmarks/srk_fused.py``. Results are recorded in
BENCH_NOTES.md. Timing fetches a value at the end of a data-dependent chain
(the tunneled TPU backend executes asynchronously).
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def make_problem(batch, d, dtype=jnp.float32, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    sigma = np.asarray(jax.nn.sigmoid(jax.random.normal(k1, (d,))), np.float64)
    mu = np.asarray(-sigma ** 2 - jax.nn.sigmoid(jax.random.normal(k2, (d,))),
                    np.float64)
    def f(t, y, mu_c, sigma_c):
        return mu_c * y

    def g(t, y, mu_c, sigma_c):
        return sigma_c * y

    y0 = jnp.full((batch, d), 0.1, dtype)
    params = (jnp.asarray(mu, dtype), jnp.asarray(sigma, dtype))
    return f, g, y0, params, (k3,)


def run_config(batch, d, n_steps, dtype=jnp.float32, reps=20, interpret=False):
    from torchsde_tpu.core.integrate import sample_grid_noise, build_step_grid
    from torchsde_tpu.ops.srk_fused import srk_solve_fused, srk_solve_xla

    f, g, y0, params, (key,) = make_problem(batch, d, dtype)
    dt = 1.0 / n_steps
    grid = build_step_grid(0.0, 1.0, dt)
    W, U, _ = sample_grid_noise(key, grid, (batch, d), dtype, needs_U=True)

    xla = jax.jit(lambda y0, W, U: srk_solve_xla(f, g, y0, 0.0, dt, n_steps,
                                                 W, U, params=params))
    fused = jax.jit(lambda y0, W, U: srk_solve_fused(f, g, y0, 0.0, dt, n_steps,
                                                     W, U, params=params,
                                                     interpret=interpret))

    y_xla = xla(y0, W, U)
    y_fused = fused(y0, W, U)
    err = float(jnp.max(jnp.abs(y_xla - y_fused)) / (jnp.max(jnp.abs(y_xla)) + 1e-30))

    def bench(fn):
        y = fn(y0, W, U)
        float(y[0, 0])  # force completion
        t0 = time.perf_counter()
        for _ in range(reps):
            y = fn(y, W, U)  # data-dependent chain
        float(y[0, 0])
        return (time.perf_counter() - t0) / reps

    t_xla = bench(xla)
    t_fused = bench(fused)
    return dict(batch=batch, d=d, n_steps=n_steps, dtype=str(dtype.__name__ if hasattr(dtype, '__name__') else dtype),
                rel_err=err, xla_ms=t_xla * 1e3, fused_ms=t_fused * 1e3,
                speedup=t_xla / t_fused)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true",
                    help="CPU interpreter mode (correctness only)")
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    configs = [(1024, 8, 128), (16384, 8, 128), (1024, 128, 128),
               (16384, 128, 128)]
    if args.quick or args.interpret:
        configs = [(64, 8, 16)]
    print(f"devices: {jax.devices()}")
    print(f"{'batch':>6} {'d':>4} {'steps':>5} {'rel_err':>9} "
          f"{'xla_ms':>8} {'fused_ms':>9} {'speedup':>8}")
    for batch, d, n_steps in configs:
        r = run_config(batch, d, n_steps, reps=3 if args.interpret else 20,
                       interpret=args.interpret)
        print(f"{r['batch']:>6} {r['d']:>4} {r['n_steps']:>5} "
              f"{r['rel_err']:>9.2e} {r['xla_ms']:>8.3f} {r['fused_ms']:>9.3f} "
              f"{r['speedup']:>8.2f}")


if __name__ == "__main__":
    main()
