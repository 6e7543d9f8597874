"""Solver-path wall time: ours vs the reference, same recipe, same session.

The second half of the reference's benchmark file
(/root/reference/benchmarks/brownian.py:131-231): an Itô diagonal SDE
``f = y``, ``g = exp(-y)``, Euler, ``ts = linspace(0, 1, 100)`` dense
outputs at the reference's default ``dt = 1e-3`` (1000 steps), timed in
three modes — plain solve, backprop-through-solver, adjoint — at the same
three shapes as the query benchmark. The query half is
``benchmarks/brownian_ab.py`` (results: BENCH_NOTES §2b).

Reference side: torchsde on host CPU (no torch TPU backend), explicit
``BrownianInterval`` noise (its fastest general sampler there) plus
``BrownianPath`` for the fwd mode (its store-everything fast path). Our
side: the jitted solve on the TPU chip, with (a) default one-pass grid
noise — the fair analogue of "the noise source the framework would pick" —
and (b) an explicit ``BrownianInterval`` (query_grid precompute path).
Pinned protocol: idle-host check + best-of-N, value-fetch timing.

Usage: python -m benchmarks.sdeint_ab [--json out.json] [--skip-ref]
       [--ours-cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SIZES = ((128, 5), (256, 128), (512, 256))
T0, T1 = 0.0, 1.0
N_OUT = 100
DT = 1e-3
OUTER = 3


def record(out, key, val):
    out[key] = val
    print(f"{key:52s} {val * 1e3:>12,.1f} ms", flush=True)


def best_of(fn, outer=OUTER):
    best = float("inf")
    for _ in range(outer):
        best = min(best, fn())
    return best


def bench_ours(cpu=False):
    import jax
    if cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import torchsde_tpu as tsde

    plat = jax.devices()[0].platform
    ts = np.linspace(T0, T1, N_OUT)

    class SDE(tsde.BaseSDE):
        def __init__(self):
            super().__init__(noise_type="diagonal", sde_type="ito")
            self.one = jnp.asarray(1.0, jnp.float32)

        def f(self, t, y):
            return self.one * y

        def g(self, t, y):
            return jnp.exp(-y)

    out = {}
    sde = SDE()
    for size in SIZES:
        y0 = jnp.zeros(size, jnp.float32)

        for noise, bm in (("default", None),
                          ("interval", tsde.BrownianInterval(
                              T0, T1, size, dtype=jnp.float32, entropy=42))):
            kw = dict(method="euler", dt=DT)
            if bm is None:
                kw["entropy"] = 42

            fwd = jax.jit(lambda y0, bm=bm, kw=kw: tsde.sdeint(
                sde, y0, ts, bm=bm, **kw))
            bp = jax.jit(jax.grad(lambda y0, bm=bm, kw=kw: jnp.sum(
                tsde.sdeint(sde, y0, ts, bm=bm, **kw))))
            adj = jax.jit(jax.grad(lambda y0, bm=bm, kw=kw: jnp.sum(
                tsde.sdeint_adjoint(sde, y0, ts, bm=bm, **kw))))

            for mode, fn in (("fwd", fwd), ("backprop", bp),
                             ("adjoint", adj)):
                float(jnp.sum(fn(y0)))  # compile + execute once

                def run(fn=fn, y0=y0):
                    t = time.perf_counter()
                    float(jnp.sum(fn(y0)))
                    return time.perf_counter() - t
                record(out,
                       f"ours-{plat}/{mode}/{noise}/{size[0]}x{size[1]}",
                       round(best_of(run), 4))
    return out


def bench_reference():
    import benchmarks._trampoline_shim  # noqa: F401
    sys.path.insert(0, "/root/reference")
    import torch
    import torchsde

    ts = torch.linspace(T0, T1, N_OUT)

    class SDE(torchsde.SDEIto):
        def __init__(self):
            super().__init__(noise_type="diagonal")

        def f(self, t, y):
            return y

        def g(self, t, y):
            return torch.exp(-y)

    out = {}
    sde = SDE()
    for size in SIZES:
        y0 = torch.zeros(*size)
        w0 = torch.zeros(*size)

        def make_interval():
            return torchsde.BrownianInterval(t0=T0, t1=T1, size=size,
                                             dtype=y0.dtype)

        def t_fwd(bm):
            t = time.perf_counter()
            with torch.no_grad():
                torchsde.sdeint(sde, y0, ts, bm=bm, method="euler", dt=DT)
            return time.perf_counter() - t

        def t_bp(bm):
            t = time.perf_counter()
            y = y0.clone().requires_grad_(True)
            ys = torchsde.sdeint(sde, y, ts, bm=bm, method="euler", dt=DT)
            ys.sum().backward()
            return time.perf_counter() - t

        def t_adj(bm):
            t = time.perf_counter()
            y = y0.clone().requires_grad_(True)
            ys = torchsde.sdeint_adjoint(sde, y, ts, bm=bm, method="euler",
                                         dt=DT)
            ys.sum().backward()
            return time.perf_counter() - t

        # BrownianPath fwd: the reference's store-everything fast path.
        bm = torchsde.BrownianPath(t0=T0, w0=w0)
        t_fwd(bm)  # warmup (populates the path)
        record(out, f"ref/fwd/path/{size[0]}x{size[1]}",
               round(best_of(lambda bm=bm: t_fwd(bm), 2), 4))

        for mode, fn in (("fwd", t_fwd), ("backprop", t_bp),
                         ("adjoint", t_adj)):
            bm = make_interval()
            fn(bm)  # warmup (fills the LRU cache)
            record(out, f"ref/{mode}/interval/{size[0]}x{size[1]}",
                   round(best_of(lambda fn=fn, bm=bm: fn(bm), 2), 4))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--json", type=str, default=None)
    p.add_argument("--skip-ref", action="store_true")
    p.add_argument("--skip-ours", action="store_true")
    p.add_argument("--ours-cpu", action="store_true")
    args = p.parse_args()
    if args.skip_ref and args.skip_ours:
        p.error("--skip-ref with --skip-ours selects no benchmarks")

    from bench import host_load_check
    load1, idle = host_load_check()
    results = {"host_load1": round(load1, 2), "host_idle": idle,
               "protocol": f"best-of-{OUTER} (ours) / best-of-2 (ref), "
                           f"euler diagonal, {N_OUT} output times, dt={DT}, "
                           "wall seconds per solve"}
    if not args.skip_ours:
        results.update(bench_ours(args.ours_cpu))
    if not args.skip_ref:
        results.update(bench_reference())
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)
    print(json.dumps({"sdeint_ab": "done", "host_idle": idle}))


if __name__ == "__main__":
    main()
