"""Run every (sde_type x noise_type) strong-order convergence check.

Port of /root/reference/diagnostics/run_all.py:15-21 + the 8 per-combination
scripts (ito_{diagonal,scalar,additive,general}, stratonovich_*), collapsed
into one parameterised driver. Problems and method lists match the reference
scripts; the Ex* problems use exact analytical sample solutions, Neural* use
a fine-step reference solve.

Usage:  python -m diagnostics.run_all [--batch 4096] [--cpu]
"""

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Acceptance bands: (strong_order_min, weak_order_min) per (combo, method).
# The reference's diagnostics print slopes but assert nothing
# (/root/reference/diagnostics/inspection.py:114-122); here a regression in
# either slope fails the run loudly (exit 1). Lower bounds are cut ~0.3-0.8
# below the committed TPU b1024 slopes (results_tpu_b1024.json) — wide enough
# for MC noise across batch sizes/backends, tight enough that a broken solver
# (e.g. Milstein degrading to Euler's 0.5, or a biased weak error) trips them.
# Theoretical orders: euler.py:26, milstein.py:23, srk.py:32, heun.py:32,
# midpoint.py:26, reversible_heun.py:55, log_ode.py:36 in the reference.
ORDER_BANDS = {
    "ito_diagonal": {
        "euler": (0.35, 0.45), "milstein": (0.80, 0.65),
        "milstein_grad_free": (0.80, 0.65), "srk": (1.25, 0.70),
    },
    "ito_scalar": {
        "euler": (0.35, 0.50), "milstein": (0.80, 0.60),
        "milstein_grad_free": (0.80, 0.60), "srk": (1.10, 1.00),
    },
    "ito_additive": {
        "euler": (0.85, 0.60), "milstein": (0.85, 0.60),
        "milstein_grad_free": (0.85, 0.60), "srk": (1.40, 1.20),
    },
    "ito_general": {"euler": (0.45, 0.50)},
    "stratonovich_diagonal": {
        "euler_heun": (0.80, 0.80), "heun": (0.80, 0.70),
        "midpoint": (0.80, 0.70), "reversible_heun": (0.45, 0.70),
        "milstein": (0.80, 0.80), "milstein_grad_free": (0.80, 0.80),
        "log_ode": (0.80, 0.70),
    },
    "stratonovich_scalar": {
        "euler_heun": (0.60, 0.50), "heun": (0.60, 0.50),
        "midpoint": (0.70, 0.50), "reversible_heun": (0.45, 0.50),
        "milstein": (0.80, 0.60), "milstein_grad_free": (0.50, 0.60),
        "log_ode": (0.70, 0.50),
    },
    "stratonovich_additive": {
        "euler_heun": (0.85, 0.60), "heun": (1.40, 1.20),
        "midpoint": (1.40, 1.20), "reversible_heun": (1.20, 1.20),
        "milstein": (0.85, 0.60), "milstein_grad_free": (0.85, 0.60),
        "log_ode": (1.40, 1.20),
    },
    "stratonovich_general": {
        "euler_heun": (0.70, 0.50), "heun": (0.70, 0.80),
        "midpoint": (0.70, 0.80), "reversible_heun": (0.45, 0.80),
        "log_ode": (0.70, 0.80),
    },
}


def check_bands(all_results):
    """Returns a list of human-readable violations against ORDER_BANDS."""
    violations = []
    for combo, methods in all_results.items():
        for label, r in methods.items():
            band = ORDER_BANDS.get(combo, {}).get(label)
            if band is None:
                continue
            strong_min, weak_min = band
            if r["strong_order"] < strong_min:
                violations.append(
                    f"{combo}/{label}: strong_order {r['strong_order']:.3f}"
                    f" < band minimum {strong_min}")
            if r["weak_order"] < weak_min:
                violations.append(
                    f"{combo}/{label}: weak_order {r['weak_order']:.3f}"
                    f" < band minimum {weak_min}")
    return violations


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=4096)
    parser.add_argument("--d", type=int, default=3)
    parser.add_argument("--m", type=int, default=5)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--dt-true", type=float, default=2 ** -11)
    parser.add_argument("--json", type=str, default=None)
    parser.add_argument("--only", type=str, default=None,
                        help="run a single sde_type_noise combination")
    parser.add_argument("--no-check", action="store_true",
                        help="skip the ORDER_BANDS acceptance check")
    args = parser.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import problems
    from diagnostics.harness import inspect_orders, print_orders

    t0, t1 = 0.0, 2.0
    dts = tuple(2.0 ** -i for i in range(1, 7))
    b, d, m = args.batch, args.d, args.m

    ito_methods = ("euler", "milstein", "milstein_grad_free", "srk")
    ito_options = (None, None, dict(grad_free=True), None)
    strat_methods = ("euler_heun", "heun", "midpoint", "reversible_heun",
                     "milstein", "milstein_grad_free", "log_ode")
    strat_options = (None, None, None, None, None, dict(grad_free=True), None)
    strat_general_methods = ("euler_heun", "heun", "midpoint", "reversible_heun", "log_ode")
    strat_general_options = (None,) * 5

    def meth(ms, opts, drop=()):
        keep = [(m_, o) for m_, o in zip(ms, opts) if m_ not in drop]
        methods = tuple("milstein" if m_ == "milstein_grad_free" else m_ for m_, _ in keep)
        options = tuple(o for _, o in keep)
        labels = tuple(m_ for m_, _ in keep)
        return methods, options, labels

    configs = []
    for sde_type in ("ito", "stratonovich"):
        if sde_type == "ito":
            ms, os_, ls = meth(ito_methods, ito_options)
            ms_gen, os_gen, ls_gen = ("euler",), (None,), ("euler",)
        else:
            ms, os_, ls = meth(strat_methods, strat_options)
            ms_gen, os_gen, ls_gen = strat_general_methods, strat_general_options, strat_general_methods
        configs += [
            (f"{sde_type}_diagonal", problems.ExDiagonal(d=d, sde_type=sde_type), d, ms, os_, ls),
            (f"{sde_type}_scalar", problems.ExScalar(d=d, sde_type=sde_type), 1, ms, os_, ls),
            (f"{sde_type}_additive", problems.ExAdditive(d=d, m=m, sde_type=sde_type), m, ms, os_, ls),
            (f"{sde_type}_general", problems.NeuralGeneral(d=d, m=m, sde_type=sde_type), m,
             ms_gen, os_gen, ls_gen),
        ]

    all_results = {}
    for name, sde, noise_size, methods, options, labels in configs:
        if args.only is not None and name != args.only:
            continue
        y0 = jnp.full((b, d), 0.1, jnp.float64)
        results = inspect_orders(sde, y0, t0, t1, dts, methods, options, labels,
                                 noise_size=noise_size, dt_true=args.dt_true)
        print_orders(name, results)
        all_results[name] = {k: {"strong_order": v["strong_order"],
                                 "weak_order": v["weak_order"],
                                 "mses": v["mses"]} for k, v in results.items()}

    if args.json:
        with open(args.json, "w") as f:
            json.dump(all_results, f, indent=2)

    if not args.no_check:
        violations = check_bands(all_results)
        if violations:
            print("ORDER-BAND VIOLATIONS:")
            for v in violations:
                print("  " + v)
            sys.exit(1)
        n = sum(len(m) for m in all_results.values())
        print(f"order bands: {n} method slopes within acceptance bands")
    return all_results


if __name__ == "__main__":
    main()
