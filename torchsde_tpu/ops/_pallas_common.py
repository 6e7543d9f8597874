"""Shared helpers for the whole-solve Pallas kernel modules
(ops/latent_fused.py, ops/gan_fused.py): lane padding, compiler params, and
the optional-Pallas import guard, kept in one place so VMEM-limit or
padding-policy changes happen once.
"""

import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl                   # noqa: F401
    from jax.experimental.pallas import tpu as pltpu            # noqa: F401
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    pl = pltpu = None
    HAVE_PALLAS = False

LANE = 128
_VMEM_LIMIT = 100 * 1024 * 1024


def pad2(w, rows=LANE, cols=LANE):
    """Zero-pad a 2-D weight to (rows, cols)."""
    return jnp.pad(w, ((0, rows - w.shape[0]), (0, cols - w.shape[1])))


def pad1(b, cols=LANE):
    """Zero-pad a bias to one (1, cols) row."""
    return jnp.pad(b, (0, cols - b.shape[0])).reshape(1, cols)


def cparams():
    return (pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
            if HAVE_PALLAS else None)
