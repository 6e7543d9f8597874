"""Brownian-motion and sdeint benchmarks.

Mirror of /root/reference/benchmarks/brownian.py: times interval queries at
the reference's shapes (128x5, 256x128, 512x256; brownian.py:27-31) under
sequential and random access, and times sdeint forward / backprop / adjoint
with Euler + diagonal noise over 100 output times (brownian.py:131-231).
Prints a table + JSON instead of matplotlib plots.

Usage: python -m benchmarks.brownian [--cpu]
"""

import argparse
import json
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--steps", type=int, default=100)
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import torchsde_tpu as tsde

    sizes = ((128, 5), (256, 128), (512, 256))
    t0, t1 = 0.0, 1.0
    results = {}

    for size in sizes:
        bm = tsde.BrownianInterval(t0=t0, t1=t1, size=size, entropy=45678)
        # NOTE: on the tunneled TPU backend block_until_ready does not wait, so
        # every timed region folds the queries into one program (scan/vmap)
        # whose summed output is fetched as a host scalar.
        ts = np.linspace(t0, t1, args.steps + 1)
        rng = np.random.RandomState(0)
        pairs = np.sort(rng.uniform(t0, t1, (args.steps, 2)), axis=1)

        def timed(fn, *xs):
            float(fn(*xs))  # compile + warmup
            best = np.inf
            for _ in range(args.reps):
                start = time.perf_counter()
                float(fn(*xs))
                best = min(best, time.perf_counter() - start)
            return best

        @jax.jit
        def seq_scan(tpairs):
            def body(c, tp):
                return c + bm(tp[0], tp[1]).sum(), None
            out, _ = jax.lax.scan(body, 0.0, tpairs)
            return out

        seq_pairs = jnp.stack([jnp.asarray(ts[:-1]), jnp.asarray(ts[1:])], axis=1)
        best_seq = timed(seq_scan, seq_pairs)
        best_rand = timed(seq_scan, jnp.asarray(pairs))

        batched = jax.jit(lambda a, b: jax.vmap(lambda x, y: bm(x, y))(a, b).sum())
        best_batched = timed(batched, jnp.asarray(pairs[:, 0]), jnp.asarray(pairs[:, 1]))

        n_samples = args.steps * int(np.prod(size))
        results[str(size)] = dict(
            sequential_queries_per_sec=args.steps / best_seq,
            random_queries_per_sec=args.steps / best_rand,
            batched_queries_per_sec=args.steps / best_batched,
            batched_samples_per_sec=n_samples / best_batched,
        )
        print(f"size {size}: seq {args.steps/best_seq:9.1f} q/s   "
              f"rand {args.steps/best_rand:9.1f} q/s   "
              f"batched {args.steps/best_batched:10.1f} q/s "
              f"({n_samples/best_batched:.3e} samples/s)")

    # sdeint forward / grad / adjoint timing, Euler diagonal (reference :131-231)
    class SDE(tsde.BaseSDE):
        def __init__(self, d, key):
            super().__init__(noise_type="diagonal", sde_type="ito")
            self.w = jax.random.normal(key, (d, d)) * 0.1

        def f(self, t, y):
            return jnp.tanh(y @ self.w)

        def g(self, t, y):
            return 0.1 * jax.nn.sigmoid(y)

    for size in sizes:
        b, d = size
        sde = SDE(d, jax.random.PRNGKey(1))
        y0 = jnp.full((b, d), 0.1)
        ts = np.linspace(0.0, 1.0, args.steps)

        fwd = jax.jit(lambda s, y: tsde.sdeint(s, y, ts, method="euler",
                                               dt=0.01, entropy=5).sum())
        grad = jax.jit(jax.grad(lambda s, y: tsde.sdeint(
            s, y, ts, method="euler", dt=0.01, entropy=5).sum()))
        adj = jax.jit(jax.grad(lambda s, y: tsde.sdeint_adjoint(
            s, y, ts, method="euler", dt=0.01, entropy=5,
            adjoint_method="euler").sum()))

        out = {}
        for name, fn in (("fwd", fwd), ("backprop", grad), ("adjoint", adj)):
            def scalar(s_, y_, fn=fn):
                r = fn(s_, y_)
                leaves = jax.tree_util.tree_leaves(r)
                return float(sum(jnp.sum(l) for l in leaves))
            scalar(sde, y0)  # compile
            best = np.inf
            for _ in range(args.reps):
                start = time.perf_counter()
                scalar(sde, y0)
                best = min(best, time.perf_counter() - start)
            out[name] = best
        results[f"sdeint{size}"] = out
        print(f"sdeint {size}: fwd {out['fwd']*1e3:8.2f} ms   "
              f"backprop {out['backprop']*1e3:8.2f} ms   "
              f"adjoint {out['adjoint']*1e3:8.2f} ms")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
