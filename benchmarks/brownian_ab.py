"""Brownian query throughput: ours vs the reference, same session.

Closes VERDICT r3 weak #5: BENCH_NOTES §2 committed our numbers but never
ran the reference denominator. This harness times BOTH frameworks at the
reference benchmark's own shapes and access patterns
(/root/reference/benchmarks/brownian.py:27-31,60-128):

  sizes          (128, 5), (256, 128), (512, 256)
  sequential     99 consecutive intervals of linspace(0, 1, 100)
  random         99 consecutive pairs of 100 uniform draws (swapped if
                 inverted), fixed seed
  timing         3 reps x 99 queries per measurement, reported as queries/s

Reference side: torchsde BrownianPath / BrownianTree(tol=1e-5) /
BrownianInterval on host CPU (torch has no TPU backend), eager per-query
loop — exactly the reference's `_time_query`. Our side: (a) the same eager
per-query loop (apples-to-apples host-call pattern), and (b) the jitted
`query_grid` / scan bulk path, which is how a TPU solve actually consumes
noise. Pinned protocol: host load check + best-of-N outer reps (bench.py).

Usage: python -m benchmarks.brownian_ab [--cpu] [--json out.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SIZES = ((128, 5), (256, 128), (512, 256))
T0, T1 = 0.0, 1.0
STEPS = 100
REPS = 3
OUTER = 3  # best-of outer reps (pinned protocol)


def make_patterns():
    import numpy as np
    seq = np.linspace(T0, T1, STEPS)
    rng = np.random.RandomState(456789)
    rnd = rng.uniform(T0, T1, STEPS)
    def pairs(ts):
        out = []
        for ta, tb in zip(ts[:-1], ts[1:]):
            if ta > tb:
                ta, tb = tb, ta
            out.append((float(ta), float(tb)))
        return out
    return {"sequential": pairs(seq), "random": pairs(rnd)}


def make_point_sets():
    """The same two access patterns as point sets + static index pairs, for
    the designed bulk APIs (query_grid / query_pairs): identical interval
    values to make_patterns, one descent per *point* instead of two per
    *pair*."""
    import numpy as np
    seq = np.linspace(T0, T1, STEPS)
    rng = np.random.RandomState(456789)
    rnd = rng.uniform(T0, T1, STEPS)
    idx = [(i, i + 1) if rnd[i] <= rnd[i + 1] else (i + 1, i)
           for i in range(STEPS - 1)]
    return {"sequential": (seq, [(i, i + 1) for i in range(STEPS - 1)]),
            "random": (rnd, idx)}


def best_of(fn):
    best = float("inf")
    for _ in range(OUTER):
        best = min(best, fn())
    return REPS * (STEPS - 1) / best  # queries/sec


def record(out, key, val):
    out[key] = val
    print(f"{key:48s} {val:>12,.1f} q/s", flush=True)


def bench_reference():
    """Reference torchsde on host CPU, eager per-query (its own benchmark)."""
    import benchmarks._trampoline_shim  # noqa: F401
    sys.path.insert(0, "/root/reference")
    import torch
    import torchsde

    patterns = make_patterns()
    out = {}
    for size in SIZES:
        w0 = torch.zeros(*size)
        variants = {
            "BrownianPath": lambda: torchsde.BrownianPath(t0=T0, w0=w0),
            "BrownianTree": lambda: torchsde.BrownianTree(
                t0=T0, t1=T1, w0=w0, tol=1e-5),
            "BrownianInterval": lambda: torchsde.BrownianInterval(
                t0=T0, t1=T1, size=w0.shape, dtype=w0.dtype,
                device=w0.device),
        }
        for name, ctor in variants.items():
            for pat, prs in patterns.items():
                bm = ctor()  # fresh sampler per measurement (fresh cache)
                def run(bm=bm, prs=prs):
                    t = time.perf_counter()
                    for _ in range(REPS):
                        for ta, tb in prs:
                            bm(ta, tb)
                    return time.perf_counter() - t
                run()  # warmup (builds tree/cache, like the reference's
                # first rep — then best-of outer reps)
                record(out, f"ref/{name}/{size[0]}x{size[1]}/{pat}",
                       round(best_of(run), 1))
    return out


def bench_ours(cpu):
    import jax
    if cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import torchsde_tpu as tsde

    plat = jax.devices()[0].platform
    patterns = make_patterns()
    out = {}
    for size in SIZES:
        # One sampler + one compiled bulk program per size: the sampler has
        # no cache/query-order state, and the bulk path takes tpairs as an
        # argument, so both patterns legitimately share them.
        bm = tsde.BrownianInterval(t0=T0, t1=T1, size=size, entropy=45678)

        @jax.jit
        def bulk(tpairs, bm=bm):
            def body(c, tp):
                return c + bm(tp[0], tp[1]).sum(), None
            return jax.lax.scan(body, 0.0, tpairs)[0]

        for pat, prs in patterns.items():
            # (a) eager per-query loop — the reference's own call pattern.
            def run_eager(bm=bm, prs=prs):
                t = time.perf_counter()
                for _ in range(REPS):
                    s = None
                    for ta, tb in prs:
                        s = bm(ta, tb)
                    float(jnp.sum(s))  # force execution (async backend)
                return time.perf_counter() - t
            run_eager()
            record(out, f"ours-{plat}/eager/{size[0]}x{size[1]}/{pat}",
                   round(best_of(run_eager), 1))

            # (b) jitted bulk path: all 99 intervals in ONE device program —
            # how a scan-based solve actually consumes noise.
            tpairs = jnp.asarray(np.array(prs))

            def run_bulk(tpairs=tpairs):
                t = time.perf_counter()
                for _ in range(REPS):
                    float(bulk(tpairs))
                return time.perf_counter() - t
            float(bulk(tpairs))  # compile (shared across patterns per size)
            record(out, f"ours-{plat}/jit-scan/{size[0]}x{size[1]}/{pat}",
                   round(best_of(run_bulk), 1))

        # (c) the DESIGNED bulk APIs — one descent per point instead of two
        # per pair, all 99 intervals answered together: query_grid for the
        # sorted sequential grid (the fixed-step solver precompute path),
        # query_pairs (jitted) for the arbitrary interval set of the random
        # pattern (the adaptive-step path).
        points = make_point_sets()
        seq_pts, _ = points["sequential"]

        def run_qgrid(bm=bm, grid=seq_pts):
            t = time.perf_counter()
            for _ in range(REPS):
                W, _, _ = bm.query_grid(grid)
                float(jnp.sum(W))
            return time.perf_counter() - t
        run_qgrid()  # warmup (compiles the bucketed descent programs)
        record(out, f"ours-{plat}/query-grid/{size[0]}x{size[1]}/sequential",
               round(best_of(run_qgrid), 1))

        rnd_pts, rnd_idx = points["random"]

        @jax.jit
        def qpairs(pts, bm=bm, idx=tuple(rnd_idx)):
            Ws = bm.query_pairs(pts, idx)
            return sum(W.sum() for W in Ws)

        rnd_dev = jnp.asarray(rnd_pts)

        def run_qpairs(rnd_dev=rnd_dev):
            t = time.perf_counter()
            for _ in range(REPS):
                float(qpairs(rnd_dev))
            return time.perf_counter() - t
        float(qpairs(rnd_dev))  # compile
        record(out, f"ours-{plat}/query-pairs/{size[0]}x{size[1]}/random",
               round(best_of(run_qpairs), 1))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true",
                   help="run our side on host CPU instead of the TPU")
    p.add_argument("--json", type=str, default=None)
    p.add_argument("--skip-ref", action="store_true")
    p.add_argument("--ref-only", action="store_true",
                   help="only run the reference denominator (host CPU)")
    args = p.parse_args()
    if args.ref_only and args.skip_ref:
        p.error("--ref-only with --skip-ref selects no benchmarks")
    if args.ref_only and args.cpu:
        p.error("--cpu only applies to our side; meaningless with --ref-only")

    from bench import host_load_check
    load1, idle = host_load_check()
    results = {"host_load1": round(load1, 2), "host_idle": idle,
               "protocol": f"best-of-{OUTER} outer reps, {REPS}x{STEPS - 1} "
                           "queries each, queries/sec"}

    if not args.ref_only:
        results.update(bench_ours(args.cpu))
    if not args.skip_ref:
        results.update(bench_reference())
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)
    print(json.dumps({"brownian_ab": "done", "host_idle": idle}))


if __name__ == "__main__":
    main()
