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
    return all_results


if __name__ == "__main__":
    main()
