"""Reference-power statistical acceptance of the Brownian sampler.

Runs the Kolmogorov-Smirnov acceptance suite at the REFERENCE's scale —
batch 131072, alpha = 1e-5 (/root/reference/tests/test_brownian_interval.py:36-41,
164-288) — against the exact-split sampler: unconditional and conditional
bridge laws for W and H at arbitrary (non-dyadic) interior points, the
pinned-endpoint BrownianTree law, and additivity / U-chain consistency.

The fast test tier scales these down for CI budget
(tests/test_brownian_interval.py); this script is the full-power run whose
results are committed to BENCH_NOTES.md once per round (VERDICT r1 item 4).

Usage: python benchmarks/stat_acceptance.py [--cpu] [--batch 131072]
"""

import argparse
import math
import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true",
                   help="force CPU (float64 KS statistics, reference parity)")
    p.add_argument("--batch", type=int, default=131072)
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np
    import numpy.random as npr
    from scipy.stats import kstest

    import torchsde_tpu as tsde

    ALPHA = 1e-5  # reference test_brownian_interval.py:41
    B = args.batch
    rng = npr.RandomState(2147483647)
    rows = []
    t_start = time.time()

    def check(name, sample, pval_only=False):
        stat, pval = kstest(np.asarray(sample), "norm")
        ok = pval >= ALPHA
        rows.append((name, pval, ok))
        status = "PASS" if ok else "FAIL"
        print(f"  {status}  p={pval:10.3e}  {name}")
        return ok

    def U_to_H(W, U, h):
        return U / h - 0.5 * W

    print(f"KS acceptance at batch {B}, alpha {ALPHA} "
          f"(reference test_brownian_interval.py:36-41)")

    # --- unconditional laws (reference :164-196) -------------------------- #
    print("[1] unconditional W / H laws at random interior points")
    for rep in range(args.reps):
        bm = tsde.BrownianInterval(0.0, 1.0, size=(B,), dtype=jnp.float64,
                                   entropy=int(rng.randint(2**31)),
                                   levy_area_approximation="space-time")
        t_ = float(rng.uniform(0.05, 0.95))
        W, U = bm(0.0, t_, return_U=True)
        check(f"rep{rep}: W(0,{t_:.4f}) / sqrt(t)", np.asarray(W) / math.sqrt(t_))
        H = U_to_H(np.asarray(W), np.asarray(U), t_)
        check(f"rep{rep}: H(0,{t_:.4f}) / sqrt(t/12)",
              H / math.sqrt(t_ / 12.0))

    # --- conditional bridge laws (reference :199-258) --------------------- #
    print("[2] conditional bridge laws at non-dyadic interior points")
    for rep in range(args.reps):
        bm = tsde.BrownianInterval(0.0, 1.0, size=(B,), dtype=jnp.float64,
                                   entropy=int(rng.randint(2**31)),
                                   levy_area_approximation="space-time")
        ta, t_, tb = sorted(rng.uniform(0.05, 0.95, size=3))
        if min(t_ - ta, tb - t_) < 0.01:
            t_ = 0.5 * (ta + tb)
        W, U = bm(ta, tb, return_U=True)
        W1, U1 = bm(ta, t_, return_U=True)
        W2, U2 = bm(t_, tb, return_U=True)
        W, U, W1, U1, W2, U2 = map(np.asarray, (W, U, W1, U1, W2, U2))

        h, h1, h2 = tb - ta, t_ - ta, tb - t_
        mean_W1 = W * h1 / h
        std_W = math.sqrt(h2 * h1 / h)
        check(f"rep{rep}: W bridge left  ({ta:.3f},{t_:.3f},{tb:.3f})",
              (W1 - mean_W1) / std_W)
        mean_W2 = W * h2 / h
        check(f"rep{rep}: W bridge right", (W2 - mean_W2) / std_W)

        # H bridge coefficients (reference :199-241)
        denom = math.sqrt(h1 ** 3 + h2 ** 3)
        a = h1 ** 3.5 * h2 ** 0.5 / (2 * h * denom)
        b = h1 ** 0.5 * h2 ** 3.5 / (2 * h * denom)
        c = math.sqrt(3) * h1 ** 1.5 * h2 ** 1.5 / (6 * denom)
        H = U_to_H(W, U, h)
        H1 = U_to_H(W1, U1, h1)
        H2 = U_to_H(W2, U2, h2)
        check(f"rep{rep}: H bridge left",
              (H1 - H * (h1 / h) ** 2) / (math.sqrt(a * a + c * c) / h1))
        check(f"rep{rep}: H bridge right",
              (H2 - H * (h2 / h) ** 2) / (math.sqrt(b * b + c * c) / h2))

    # --- pinned-endpoint BrownianTree (reference derived.py:148-153) ------ #
    print("[3] BrownianTree pinned-endpoint bridge law")
    for rep in range(2):
        w0 = jnp.zeros((B,), jnp.float64)
        w1 = jnp.full((B,), float(rng.randn()), jnp.float64)
        tree = tsde.BrownianTree(t0=0.0, w0=w0, t1=1.0, w1=w1,
                                 entropy=int(rng.randint(2**31)))
        t_ = float(rng.uniform(0.1, 0.9))
        Wt = np.asarray(tree(0.0, t_))
        mean = np.asarray(w1 - w0) * t_
        std = math.sqrt(t_ * (1 - t_))
        check(f"rep{rep}: pinned tree W(0,{t_:.4f})", (Wt - mean) / std)

    # --- consistency at fine, sub-round-1-leaf widths --------------------- #
    print("[4] additivity / U-chain at widths below the round-1 leaf (1e-9)")
    bm = tsde.BrownianInterval(0.0, 1.0, size=(B,), dtype=jnp.float64,
                               entropy=int(rng.randint(2**31)),
                               levy_area_approximation="space-time")
    t = 0.123456789
    wdt = 1e-9
    W1, U1 = bm(t, t + wdt, return_U=True)
    W2, U2 = bm(t + wdt, t + 2 * wdt, return_U=True)
    Wf, Uf = bm(t, t + 2 * wdt, return_U=True)
    add_err = float(np.abs(np.asarray(W1 + W2 - Wf)).max())
    u_err = float(np.abs(np.asarray(U1 + U2 + wdt * W1 - Uf)).max())
    print(f"  additivity max err {add_err:.2e}; U-chain max err {u_err:.2e}")
    rows.append(("fine additivity", add_err, add_err < 1e-12))
    rows.append(("fine U-chain", u_err, u_err < 1e-15))
    check("fine-width W / sqrt(w)", np.asarray(W1) / math.sqrt(wdt))

    n_fail = sum(1 for (_, _, ok) in rows if not ok)
    print(f"\n{len(rows)} checks, {n_fail} failures, "
          f"{time.time() - t_start:.1f}s, batch {B}, alpha {ALPHA}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
