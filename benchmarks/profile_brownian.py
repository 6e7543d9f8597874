"""Construction-vs-query cost profile for the Brownian samplers.

Analogue of /root/reference/benchmarks/profile_btree.py:26-58 (which profiles
BrownianTree construction/query against cache depth): here the knobs are
``levels`` for BrownianInterval (descent depth per query, zero construction
cost) and ``n`` for PrecomputedBrownian (construction cost, O(1) queries).

Usage: python -m benchmarks.profile_brownian [--cpu]
"""

import argparse
import json
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--b", type=int, default=512)
    p.add_argument("--d", type=int, default=10)
    p.add_argument("--queries", type=int, default=500)
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import torchsde_tpu as tsde

    rng = np.random.RandomState(0)
    pairs = jnp.asarray(np.sort(rng.uniform(0.0, 1.0, (args.queries, 2)), axis=1))

    def timed_queries(bm):
        f = jax.jit(lambda tp: jax.vmap(lambda a, b: bm(a, b))(tp[:, 0], tp[:, 1]).sum())
        float(f(pairs))
        t0 = time.perf_counter()
        float(f(pairs))
        return (time.perf_counter() - t0) / args.queries

    results = {}
    print(f"{args.queries} random queries, size ({args.b}, {args.d})")
    for levels in (8, 12, 16, 20, 24):
        t0 = time.perf_counter()
        bm = tsde.BrownianInterval(0.0, 1.0, (args.b, args.d), entropy=1,
                                   levels=levels)
        cons = time.perf_counter() - t0
        q = timed_queries(bm)
        results[f"interval_levels_{levels}"] = dict(construct_s=cons, query_s=q)
        print(f"BrownianInterval levels={levels:2d}: construct {cons*1e3:7.2f} ms, "
              f"query {q*1e6:8.1f} us")

    for n in (256, 1024, 4096, 16384):
        t0 = time.perf_counter()
        bm = tsde.PrecomputedBrownian(0.0, 1.0, (args.b, args.d), n=n, entropy=1)
        float(bm._cumW.sum())  # force materialisation
        cons = time.perf_counter() - t0
        q = timed_queries(bm)
        results[f"precomputed_n_{n}"] = dict(construct_s=cons, query_s=q)
        print(f"PrecomputedBrownian n={n:6d}:  construct {cons*1e3:7.2f} ms, "
              f"query {q*1e6:8.1f} us")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
