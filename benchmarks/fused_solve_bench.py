"""Generic fused_sdeint (ops/fused_solve.py) vs the XLA sdeint scan path.

Times a representative MLP-tower SDE at several scales with both step
templates on the real TPU. Run: ``python -m benchmarks.fused_solve_bench``.
Numbers recorded in BENCH_NOTES.md §1a-ter.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import torchsde_tpu.ops.fused_solve as FS
from torchsde_tpu.core.sdeint import sdeint


def _tower(key, sizes, acts):
    layers = []
    for i, (a, b) in enumerate(zip(sizes[:-1], sizes[1:])):
        k1, key = jax.random.split(key)
        w = jax.random.normal(k1, (a, b), jnp.float32) * float(0.3 / a ** 0.5)
        layers.append((w, jnp.zeros((b,), jnp.float32), acts[i]))
    return FS.TowerSpec(layers)


def chain(fn, n=24):
    s = fn(jnp.float32(0.0))
    float(s)
    t0 = time.perf_counter()
    for _ in range(n):
        s = fn(s)
    float(s)
    return (time.perf_counter() - t0) / n * 1e3


def measure(method, B, d, hidden, n_steps):
    key = jax.random.PRNGKey(0)
    sde_type = "ito" if method == "euler" else "stratonovich"
    drift = _tower(jax.random.fold_in(key, 1), [d, hidden, d],
                   ("softplus", "linear"))
    diffusion = _tower(jax.random.fold_in(key, 2), [d, hidden, d],
                       ("lipswish", "sigmoid"))
    sde = FS.tower_sde(drift, diffusion, "diagonal", sde_type)
    y0 = jax.random.normal(jax.random.fold_in(key, 3), (B, d), jnp.float32)
    ts = np.linspace(0.0, 1.0, 9)
    dt = 1.0 / n_steps
    nkey = jax.random.fold_in(key, 4)

    def mkloss(solver):
        return jax.jit(lambda s: jnp.sum(
            jax.grad(lambda y: jnp.sum(solver(y + 0 * s) ** 2))(y0)))

    xla = lambda y: sdeint(sde, y, ts, method=method, dt=dt,  # noqa: E731
                           key=nkey)
    fus = lambda y: FS.fused_sdeint(drift, diffusion, y, ts, nkey,  # noqa: E731
                                    dt, method=method, dispatch="fused")
    auto = lambda y: FS.fused_sdeint(drift, diffusion, y, ts, nkey,  # noqa: E731
                                     dt, method=method, dispatch="auto")
    t_xla = chain(mkloss(xla))
    t_fus = chain(mkloss(fus))
    t_auto = chain(mkloss(auto))
    return dict(method=method, batch=B, d=d, hidden=hidden, steps=n_steps,
                auto_fuses=FS._auto_fuse(drift, diffusion),
                xla_grad_ms=round(t_xla, 2), fused_grad_ms=round(t_fus, 2),
                auto_grad_ms=round(t_auto, 2),
                fused_speedup=round(t_xla / t_fus, 2),
                auto_speedup=round(t_xla / t_auto, 2))


def main():
    for cfg in (dict(method="euler", B=1024, d=8, hidden=64, n_steps=128),
                dict(method="euler", B=4096, d=32, hidden=128, n_steps=128),
                dict(method="reversible_heun", B=1024, d=8, hidden=64,
                     n_steps=128),
                # near-lane-width towers: the region dispatch='auto' fuses
                dict(method="euler", B=1024, d=128, hidden=128, n_steps=128),
                dict(method="reversible_heun", B=1024, d=128, hidden=128,
                     n_steps=128)):
        print(json.dumps(measure(**cfg)), flush=True)


if __name__ == "__main__":
    main()
