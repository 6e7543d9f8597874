"""torchsde_tpu: a TPU-native (JAX/XLA/Pallas) differentiable SDE framework.

Capability parity with google-research/torchsde v0.2.6 (the reference at
/root/reference), redesigned TPU-first: `lax.scan`/`lax.while_loop` stepping,
counter-based on-device virtual Brownian motion, `jax.custom_vjp` stochastic
adjoint, and batch-axis sharding via `jax.sharding`.

Public API mirrors /root/reference/torchsde/__init__.py:15-19.
"""

from .brownian.base import BaseBrownian
from .brownian.derived import BrownianPath, BrownianTree, ReverseBrownian
from .brownian.interval import BrownianInterval, brownian_interval_like
from .brownian.precomputed import PrecomputedBrownian
from .core.adjoint import sdeint_adjoint
from .core.base_sde import BaseSDE, SDEIto, SDEStratonovich
from .core.sdeint import sdeint
from .settings import (LEVY_AREA_APPROXIMATIONS, METHOD_OPTIONS, METHODS,
                       NOISE_TYPES, SDE_TYPES)
from .utils.module import Module

__version__ = "0.1.0"

__all__ = [
    "BaseBrownian", "BaseSDE", "BrownianInterval", "BrownianPath", "BrownianTree",
    "PrecomputedBrownian", "ReverseBrownian", "SDEIto", "SDEStratonovich", "Module",
    "brownian_interval_like", "sdeint", "sdeint_adjoint",
    "LEVY_AREA_APPROXIMATIONS", "METHOD_OPTIONS", "METHODS", "NOISE_TYPES",
    "SDE_TYPES", "__version__",
]
