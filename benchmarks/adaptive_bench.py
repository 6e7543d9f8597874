"""Adaptive-path performance: sdeint(adaptive=True) measured head-to-head.

VERDICT r2 item 3: every committed BENCH table is fixed-step, yet adaptive
solves are first-class in the reference (srk is the Ito default method,
/root/reference/torchsde/_core/sdeint.py:147-156, and adaptive=True is a
documented mode of both entry points, sdeint.py:27-42). The open question is
the cost of the traced dyadic noise descent: each accept/reject attempt
queries the BrownianInterval at traced times, which runs an O(levels) scan
of bridge sampling per unique endpoint (brownian/interval.py:437-447;
query_pairs shares the 3 unique endpoints across the attempt's 3 intervals).

This harness measures, per (method, batch):

* adaptive solve wall time at descent depth levels=52 (the float64-exact
  default), at levels derived from dt_min (the shallowest depth that still
  separates every representable accepted step), and at a levels=8 floor
  probe — the spread IS the descent's contribution;
* the same-work fixed-step solve (dt chosen so the step count equals the
  adaptive run's accepted count, same explicit-interval noise) and the
  default-noise fixed-step solve — the fixed-vs-adaptive overhead factor;
* accuracy (RMS vs the analytical sample solution) for each row, so the
  comparison is work-at-measured-accuracy, not raw steps;
* optionally the reference torchsde on host CPU, same problem/mode/shape.

Usage: python benchmarks/adaptive_bench.py [--cpu] [--batch 1024]
           [--reps 20] [--with-reference] [--quick]
Results recorded in BENCH_NOTES.md (adaptive section).
"""

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

T0, T1 = 0.0, 2.0
N_OUT = 9           # output grid density matches diagnostics/inspection.py
DT0 = 1e-3          # reference sdeint defaults (sdeint.py:32-36)
RTOL, ATOL, DT_MIN = 1e-5, 1e-4, 1e-5
D = 3               # diagnostics/run_all.py default problem width


def dt_min_levels(span, dt_min):
    """The solver's OWN default descent depth — reuse the library formula so
    the 'levels=dt_min' row always measures what `sdeint` actually picks."""
    from torchsde_tpu.core.sdeint import adaptive_default_levels
    return adaptive_default_levels(0.0, span, dt_min)


def _drain(out):
    """Force completion of queued device work: fetch one scalar (on the async
    tunnel backend, block_until_ready alone does not guarantee the wait)."""
    import jax
    import jax.numpy as jnp
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(jnp.ravel(leaf)[:1]))


def timed(fn, reps):
    _drain(fn())  # compile + warm, fully drained
    _drain(fn())  # steady-state warm, drained so the timed window is clean
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    # device queues are in-order: draining the last rep drains them all
    _drain(out)
    return (time.perf_counter() - t0) / reps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--quick", action="store_true")
    p.add_argument("--with-reference", action="store_true",
                   help="also time torchsde from /root/reference on host CPU")
    p.add_argument("--grad", action="store_true",
                   help="gradient-path rows: backprop through the adaptive "
                        "solve, adjoint with adaptive forward, and adaptive "
                        "adjoint backward, against same-work fixed-step")
    p.add_argument("--json", type=str, default=None)
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import torchsde_tpu as tsde
    import problems

    if args.quick:
        args.reps = 3

    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind}; batch {args.batch}, d {D}, "
          f"t in [{T0},{T1}], dt0 {DT0}, rtol {RTOL} atol {ATOL} "
          f"dt_min {DT_MIN}")

    ts = np.linspace(T0, T1, N_OUT)
    span = T1 - T0
    sde = problems.ExDiagonal(d=D, sde_type="ito")
    y0 = jnp.full((args.batch, D), 0.1, jnp.float32)
    rows = []

    def make_bm(levy, levels):
        return tsde.BrownianInterval(
            t0=T0, t1=T1, size=(args.batch, D), dtype=jnp.float32,
            key=jax.random.PRNGKey(42), levy_area_approximation=levy,
            levels=levels)

    def rms_vs_analytic(ys, bm):
        ref = sde.analytical_sample(y0, ts, bm)
        return float(jnp.sqrt(jnp.mean((ys - ref) ** 2)))

    for method, levy in (("srk", "space-time"), ("milstein", "none")):
        # --- stats pass: how many steps does the adaptive controller take?
        bm52 = make_bm(levy, 52)
        ys, stats = jax.jit(lambda y, bm=bm52: tsde.sdeint(
            sde, y, ts, bm=bm, method=method, dt=DT0, adaptive=True,
            rtol=RTOL, atol=ATOL, dt_min=DT_MIN, return_stats=True))(y0)
        n_acc = int(stats["n_accepted"])
        n_rej = int(stats["n_rejected"])
        nfe = int(stats["nfe"])
        acc_err = rms_vs_analytic(ys, bm52)
        print(f"\n## {method}: adaptive accepted {n_acc} rejected {n_rej} "
              f"nfe {nfe}  rms_vs_analytic {acc_err:.2e}")

        variants = [("adaptive levels=52", 52),
                    ("adaptive levels=dt_min",
                     dt_min_levels(span, DT_MIN)),
                    ("adaptive levels=8 (floor probe)", 8)]
        for label, levels in variants:
            bm = make_bm(levy, levels)
            run = jax.jit(lambda y, bm=bm: tsde.sdeint(
                sde, y, ts, bm=bm, method=method, dt=DT0, adaptive=True,
                rtol=RTOL, atol=ATOL, dt_min=DT_MIN))
            wall = timed(lambda: run(y0), args.reps)
            err = rms_vs_analytic(run(y0), bm)
            rows.append(dict(method=method, row=label, levels=levels,
                             wall_ms=wall * 1e3, n_accepted=n_acc,
                             n_rejected=n_rej, rms=err))
            print(f"{label:36s} {wall*1e3:9.2f} ms/solve  rms {err:.2e}")

        # --- fixed-step comparisons -----------------------------------
        # same-work: step count equal to the adaptive run's accepted count,
        # same explicit interval noise (per-step in-scan descent at depth 52).
        for label, n_steps, use_bm in (
                ("fixed dt=span/n_accepted (bm)", max(n_acc, 1), True),
                ("fixed dt=dt0 (bm)", int(round(span / DT0)), True),
                ("fixed dt=dt0 (default noise)", int(round(span / DT0)),
                 False)):
            dt = span / n_steps
            if use_bm:
                bm = make_bm(levy, 52)
                run = jax.jit(lambda y, bm=bm, dt=dt: tsde.sdeint(
                    sde, y, ts, bm=bm, method=method, dt=dt))
                err_bm = bm
            else:
                run = jax.jit(lambda y, dt=dt: tsde.sdeint(
                    sde, y, ts, method=method, dt=dt,
                    key=jax.random.PRNGKey(42)))
                err_bm = make_bm(levy, 52)
            wall = timed(lambda: run(y0), args.reps)
            err = rms_vs_analytic(run(y0), err_bm) if use_bm else None
            rows.append(dict(method=method, row=label, n_steps=n_steps,
                             wall_ms=wall * 1e3, rms=err))
            err_s = f"rms {err:.2e}" if err is not None else ""
            print(f"{label:36s} {wall*1e3:9.2f} ms/solve  "
                  f"({n_steps} steps) {err_s}")

    if args.grad:
        # ------- gradient-path rows (round 3 close-out) -------------------
        # All rows: d(sum ys)/d(y0), explicit bm at levels=dt_min so noise
        # work matches the forward tables above. "same-work fixed" uses the
        # adaptive run's accepted count from the stats pass.
        lv = dt_min_levels(span, DT_MIN)
        for method, levy in (("srk", "space-time"), ("milstein", "none")):
            bm = make_bm(levy, lv)
            _, stats = jax.jit(lambda y, bm=bm: tsde.sdeint(
                sde, y, ts, bm=bm, method=method, dt=DT0, adaptive=True,
                rtol=RTOL, atol=ATOL, dt_min=DT_MIN, return_stats=True))(y0)
            n_acc = max(int(stats["n_accepted"]), 1)
            dt_same = span / n_acc
            print(f"\n## {method} gradient rows (n_accepted {n_acc})")

            def grad_of(solve):
                return jax.jit(jax.grad(lambda y: jnp.sum(solve(y))))

            cases = [
                ("bp through adaptive solve", grad_of(
                    lambda y: tsde.sdeint(sde, y, ts, bm=bm, method=method,
                                          dt=DT0, adaptive=True, rtol=RTOL,
                                          atol=ATOL, dt_min=DT_MIN))),
                ("bp adaptive, max_steps=4*n_acc", grad_of(
                    lambda y: tsde.sdeint(sde, y, ts, bm=bm, method=method,
                                          dt=DT0, adaptive=True, rtol=RTOL,
                                          atol=ATOL, dt_min=DT_MIN,
                                          max_steps=4 * n_acc))),
                ("adjoint, adaptive forward", grad_of(
                    lambda y: tsde.sdeint_adjoint(
                        sde, y, ts, bm=bm, method=method, dt=DT0,
                        adaptive=True, rtol=RTOL, atol=ATOL,
                        dt_min=DT_MIN))),
                ("adjoint, fixed fwd + adaptive bwd", grad_of(
                    lambda y: tsde.sdeint_adjoint(
                        sde, y, ts, bm=bm, method=method, dt=dt_same,
                        adjoint_adaptive=True, adjoint_rtol=RTOL,
                        adjoint_atol=ATOL))),
                ("bp fixed same-work", grad_of(
                    lambda y: tsde.sdeint(sde, y, ts, bm=bm, method=method,
                                          dt=dt_same))),
                ("adjoint fixed same-work", grad_of(
                    lambda y: tsde.sdeint_adjoint(sde, y, ts, bm=bm,
                                                  method=method,
                                                  dt=dt_same))),
            ]
            for label, fn in cases:
                try:
                    wall = timed(lambda: fn(y0), args.reps)
                except Exception as e:  # a mode unsupported for this method
                    print(f"{label:36s} unavailable: {type(e).__name__}: "
                          f"{str(e)[:120]}")
                    continue
                g = fn(y0)
                finite = bool(jnp.all(jnp.isfinite(g)))
                rows.append(dict(method=method, row=f"grad: {label}",
                                 wall_ms=wall * 1e3, n_accepted=n_acc,
                                 grad_finite=finite))
                print(f"{label:36s} {wall*1e3:9.2f} ms/grad-solve  "
                      f"finite={finite}")

    if args.with_reference:
        rows.extend(bench_reference(args, ts))

    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)
        print("wrote", args.json)


def bench_reference(args, ts_np):
    """torchsde from /root/reference, host CPU, same problem and mode."""
    import numpy as np
    sys.path.insert(0, os.path.dirname(__file__))
    import _trampoline_shim  # noqa: F401
    sys.path.insert(0, "/root/reference")
    import torch
    import torchsde as ref

    import jax
    import problems
    jsde = problems.ExDiagonal(d=D, sde_type="ito")
    mu = torch.tensor(np.asarray(jsde.mu), dtype=torch.float32)
    sigma = torch.tensor(np.asarray(jsde.sigma), dtype=torch.float32)

    class TorchExDiagonal(ref.SDEIto):
        def __init__(self):
            super().__init__(noise_type="diagonal")

        def f(self, t, y):
            return mu * y

        def g(self, t, y):
            return sigma * y

    sde = TorchExDiagonal()
    y0 = torch.full((args.batch, D), 0.1)
    ts = torch.tensor(ts_np, dtype=torch.float32)
    rows = []
    reps = max(1, args.reps // 5)
    for method in ("srk", "milstein"):
        with torch.no_grad():
            ref.sdeint(sde, y0, ts, method=method, dt=DT0, adaptive=True,
                       rtol=RTOL, atol=ATOL, dt_min=DT_MIN)  # warm
            t0 = time.perf_counter()
            for _ in range(reps):
                ref.sdeint(sde, y0, ts, method=method, dt=DT0,
                           adaptive=True, rtol=RTOL, atol=ATOL,
                           dt_min=DT_MIN)
            wall = (time.perf_counter() - t0) / reps
        rows.append(dict(method=method, row="reference torch CPU adaptive",
                         wall_ms=wall * 1e3))
        print(f"reference {method:10s} adaptive CPU {wall*1e3:9.2f} ms/solve")
    return rows


if __name__ == "__main__":
    main()
