"""Sample-path inspection: visual comparison of solver trajectories.

Analogue of /root/reference/diagnostics/inspection.py:30-68
(``inspect_samples``): solve the same SDE with several methods on the same
Brownian path, plus a fine-step "true" solve, and plot one state dimension per
sample. Saves matplotlib PNGs when available, always returns the arrays.
``inspect_orders`` lives in diagnostics/harness.py.
"""

import os

import numpy as np

from torchsde_tpu import PrecomputedBrownian, sdeint
from torchsde_tpu.settings import LEVY_AREA_APPROXIMATIONS, SDE_TYPES


def inspect_samples(sde, y0, ts, dt, methods, options=None, labels=None,
                    noise_size=None, img_dir=None, vis_dim=0, dt_true=2 ** -10,
                    entropy=0):
    if options is None:
        options = (None,) * len(methods)
    if labels is None:
        labels = list(methods)

    t0, t1 = float(ts[0]), float(ts[-1])
    n_fine = int(round((t1 - t0) / dt_true))
    bm = PrecomputedBrownian(t0=t0, t1=t1, size=(y0.shape[0], noise_size),
                             n=n_fine, dtype=y0.dtype, entropy=entropy,
                             levy_area_approximation=LEVY_AREA_APPROXIMATIONS.foster)

    solns = [np.asarray(sdeint(sde, y0, ts, bm, method=m, dt=dt, options=o))
             for m, o in zip(methods, options)]
    method_for_true = "euler" if sde.sde_type == SDE_TYPES.ito else "midpoint"
    true = np.asarray(sdeint(sde, y0, ts, bm, method=method_for_true, dt=dt_true))
    solns.append(true)
    labels = list(labels) + ["true"]

    if img_dir is not None:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            os.makedirs(img_dir, exist_ok=True)
            ts_np = np.asarray(ts)
            for i in range(min(y0.shape[0], 8)):
                plt.figure(figsize=(6, 4))
                for soln, label in zip(solns, labels):
                    plt.plot(ts_np, soln[:, i, vis_dim], marker="x", label=label)
                plt.legend()
                plt.tight_layout()
                plt.savefig(os.path.join(img_dir, f"{i}.png"), dpi=100)
                plt.close()
        except Exception as e:  # plotting is best-effort
            print(f"# plotting skipped: {e}")

    return dict(zip(labels, solns))
