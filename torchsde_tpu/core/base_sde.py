"""SDE base classes and the capability-dispatch wrapper.

TPU-native counterpart of /root/reference/torchsde/_core/base_sde.py. The
reference resolves which user-provided spellings (``f``/``g``/``f_and_g``/
``g_prod``/``f_and_g_prod``) to use by assigning bound methods once at
construction (base_sde.py:51-73). Here the SDE is a *pytree* (so it can flow
through ``jit``/``scan``/``grad``) and capability resolution happens on static
strings at trace time — identical zero-per-step-cost dispatch, but in a form
XLA can inline and fuse.

Derivative-based capabilities (``g_prod_and_gdg_prod`` for Milstein,
``dg_ga_jvp_column_sum`` for the log-ODE scheme) use ``jax.vjp``/``jax.jvp``
instead of ``torch.autograd.grad`` (reference base_sde.py:127-206).
"""

import jax
import jax.numpy as jnp

from ..settings import NOISE_TYPES, SDE_TYPES
from ..utils import misc
from ..utils.module import Module


class BaseSDE(Module):
    """Base class for all SDEs; validates the noise/sde trait strings
    (reference base_sde.py:25-39)."""

    def __init__(self, noise_type, sde_type):
        if noise_type not in NOISE_TYPES:
            raise ValueError(f"Expected noise type in {NOISE_TYPES}, but found {noise_type}")
        if sde_type not in SDE_TYPES:
            raise ValueError(f"Expected sde type in {SDE_TYPES}, but found {sde_type}")
        self.noise_type = noise_type
        self.sde_type = sde_type


class SDEIto(BaseSDE):
    def __init__(self, noise_type):
        super().__init__(noise_type=noise_type, sde_type=SDE_TYPES.ito)


class SDEStratonovich(BaseSDE):
    def __init__(self, noise_type):
        super().__init__(noise_type=noise_type, sde_type=SDE_TYPES.stratonovich)


_CAPABILITIES = ("f", "g", "h", "f_and_g", "g_prod", "f_and_g_prod")


def sde_has_method(sde, name):
    """Does `sde` provide capability `name`? Wrappers may override via
    a `has_method` hook so renamed/augmented methods report correctly."""
    hook = getattr(type(sde), "has_method", None)
    if hook is not None:
        return sde.has_method(name)
    return callable(getattr(sde, name, None))


class RenameMethodsSDE(BaseSDE):
    """Adapter for SDEs whose drift/diffusion live under different method names
    (reference base_sde.py:212-224)."""

    _KEYS = {"drift": "f", "diffusion": "g", "prior_drift": "h",
             "diffusion_prod": "g_prod", "drift_and_diffusion": "f_and_g",
             "drift_and_diffusion_prod": "f_and_g_prod"}

    def __init__(self, sde, drift="f", diffusion="g", prior_drift="h",
                 diffusion_prod="g_prod", drift_and_diffusion="f_and_g",
                 drift_and_diffusion_prod="f_and_g_prod"):
        super().__init__(noise_type=sde.noise_type, sde_type=sde.sde_type)
        self._base_sde = sde
        self._name_map = (("f", drift), ("g", diffusion), ("h", prior_drift),
                          ("g_prod", diffusion_prod), ("f_and_g", drift_and_diffusion),
                          ("f_and_g_prod", drift_and_diffusion_prod))

    def _target(self, name):
        return dict(self._name_map).get(name, name)

    def has_method(self, name):
        return sde_has_method(self._base_sde, self._target(name))

    def f(self, t, y):
        return getattr(self._base_sde, self._target("f"))(t, y)

    def g(self, t, y):
        return getattr(self._base_sde, self._target("g"))(t, y)

    def h(self, t, y):
        return getattr(self._base_sde, self._target("h"))(t, y)

    def g_prod(self, t, y, v):
        return getattr(self._base_sde, self._target("g_prod"))(t, y, v)

    def f_and_g(self, t, y):
        return getattr(self._base_sde, self._target("f_and_g"))(t, y)

    def f_and_g_prod(self, t, y, v):
        return getattr(self._base_sde, self._target("f_and_g_prod"))(t, y, v)


class ForwardSDE(BaseSDE):
    """Capability-complete view of a user SDE.

    Exposes ``f``, ``g``, ``f_and_g``, ``g_prod``, ``f_and_g_prod``, ``prod``,
    ``g_prod_and_gdg_prod`` and ``dg_ga_jvp_column_sum`` regardless of which
    subset the user defined, synthesising the rest (reference base_sde.py:42-206).
    All dispatch conditions are static, so they vanish under ``jit``.
    """

    def __init__(self, sde, fast_dg_ga_jvp_column_sum=False):
        super().__init__(noise_type=sde.noise_type, sde_type=sde.sde_type)
        self._base_sde = sde
        self._has = tuple(name for name in _CAPABILITIES if sde_has_method(sde, name))
        self._fast_dg_ga = bool(fast_dg_ga_jvp_column_sum)

    def has_method(self, name):
        return True  # ForwardSDE synthesises every capability.

    # -- primitive redirections ----------------------------------------- #

    def f(self, t, y):
        if "f" in self._has:
            return self._base_sde.f(t, y)
        if "f_and_g" in self._has:
            return self._base_sde.f_and_g(t, y)[0]
        raise RuntimeError("Method `f` has not been provided, but is required "
                           "for this method.")

    def g(self, t, y):
        if "g" in self._has:
            return self._base_sde.g(t, y)
        if "f_and_g" in self._has:
            return self._base_sde.f_and_g(t, y)[1]
        raise RuntimeError("Method `g` has not been provided, but is required "
                           "for this method.")

    def h(self, t, y):
        if "h" in self._has:
            return self._base_sde.h(t, y)
        raise RuntimeError("Method `h` has not been provided, but is required "
                           "for this method.")

    def f_and_g(self, t, y):
        if "f_and_g" in self._has:
            return self._base_sde.f_and_g(t, y)
        return self.f(t, y), self.g(t, y)

    def prod(self, g, v):
        """Diffusion-vector product given a materialised diffusion."""
        if self.noise_type == NOISE_TYPES.diagonal:
            return jax.tree_util.tree_map(lambda g_: g_ * v, g)
        return jax.tree_util.tree_map(lambda g_: misc.batch_mvp(g_, v), g)

    def g_prod(self, t, y, v):
        if "g_prod" in self._has:
            return self._base_sde.g_prod(t, y, v)
        return self.prod(self.g(t, y), v)

    def f_and_g_prod(self, t, y, v):
        if "f_and_g_prod" in self._has:
            return self._base_sde.f_and_g_prod(t, y, v)
        if "f" in self._has and "g_prod" in self._has:
            return self._base_sde.f(t, y), self._base_sde.g_prod(t, y, v)
        f, g = self.f_and_g(t, y)
        return f, self.prod(g, v)

    # -- derivative-based capabilities ----------------------------------- #

    def g_prod_and_gdg_prod(self, t, y, v1, v2):
        """Returns ``(g @ v1, sum_{j,l} g_{jl} dg_{jl}/dy_i v2_l)`` — the
        Milstein correction pair (reference base_sde.py:127-158)."""
        noise_type = self.noise_type
        if noise_type == NOISE_TYPES.additive:
            return self.g_prod(t, y, v1), 0.0
        g_fn = lambda y_: self.g(t, y_)
        g, vjp_fn = jax.vjp(g_fn, y)
        if noise_type == NOISE_TYPES.diagonal:
            cotangent = g * v2
        else:  # scalar (and general, for completeness): broadcast v2 over columns
            cotangent = g * v2[..., None, :]
        vg_dg_vjp, = vjp_fn(cotangent)
        return self.prod(g, v1), vg_dg_vjp

    def dg_ga_jvp_column_sum(self, t, y, a):
        """Log-ODE Levy-area correction
        ``sum_{j,k,l} (dg_{il}/dy_j) g_{jk} A_{kl}`` (reference base_sde.py:165-206).
        ``None`` columns loop (v1) vs batched jvp (v2) collapse to a single
        ``vmap`` of ``jax.jvp`` over noise columns here."""
        if self.noise_type != NOISE_TYPES.general:
            return 0.0
        g_fn = lambda y_: self.g(t, y_)
        g = g_fn(y)
        ga = jnp.einsum("...dm,...mk->...dk", g, a)
        m = g.shape[-1]

        def col_jvp(col_idx):
            tangent = ga[..., col_idx]
            _, dg = jax.jvp(g_fn, (y,), (tangent,))
            return dg[..., col_idx]

        cols = jax.vmap(col_jvp)(jnp.arange(m))
        return jnp.sum(cols, axis=0)


# --- logqp support (reference base_sde.py:240-307) ------------------------- #

class SDELogqp(BaseSDE):
    """Augments the state with one channel integrating the KL between the
    posterior (drift ``f``) and prior (drift ``h``) path measures:
    ``u = g^{-1}(f - h)``, KL integrand ``0.5 |u|^2``."""

    def __init__(self, sde):
        super().__init__(noise_type=sde.noise_type, sde_type=sde.sde_type)
        for name in ("f", "g", "h"):
            if not sde_has_method(sde, name):
                raise AttributeError("If using logqp then drift, diffusion and "
                                     "prior drift must all be specified.")
        self._base_sde = sde

    def has_method(self, name):
        return name in ("f", "g", "f_and_g")

    def _f_g_h(self, t, y):
        # TPU-native extension beyond the reference: an SDE may provide a
        # fused `f_and_h(t, y) -> (f, h)` evaluating both drift towers in one
        # batched program (e.g. stacked-weight einsums). On latency-bound
        # solves every step saves half its drift kernel launches.
        f_and_h = getattr(self._base_sde, "f_and_h", None)
        if callable(f_and_h):
            f, h = f_and_h(t, y)
        else:
            f, h = self._base_sde.f(t, y), self._base_sde.h(t, y)
        return f, self._base_sde.g(t, y), h

    def f_and_g(self, t, y):
        y = y[:, :-1]
        f, g, h = self._f_g_h(t, y)
        if self.noise_type == NOISE_TYPES.diagonal:
            u = misc.stable_division(f - h, g)
            g_logqp = jnp.zeros((y.shape[0], 1), y.dtype)
        else:
            u = misc.batch_mvp(jnp.linalg.pinv(g), f - h)
            g_logqp = jnp.zeros((g.shape[0], 1, g.shape[-1]), y.dtype)
        f_logqp = 0.5 * jnp.sum(jnp.square(u), axis=1, keepdims=True)
        return (jnp.concatenate([f, f_logqp], axis=1),
                jnp.concatenate([g, g_logqp], axis=1))

    def f(self, t, y):
        return self.f_and_g(t, y)[0]

    def g(self, t, y):
        y_ = y[:, :-1]
        g = self._base_sde.g(t, y_)
        if self.noise_type == NOISE_TYPES.diagonal:
            g_logqp = jnp.zeros((y_.shape[0], 1), y_.dtype)
        else:
            g_logqp = jnp.zeros((g.shape[0], 1, g.shape[-1]), y_.dtype)
        return jnp.concatenate([g, g_logqp], axis=1)
