"""The adjoint SDE: drift/diffusion are vjps of the forward vector fields.

Counterpart of /root/reference/torchsde/_core/adjoint_sde.py. The reference
flattens the augmented state ``[y, adj_y, adj_params]`` into one ``(1, N)``
row so its 2-D solvers accept it (adjoint.py:75-79); here the augmented state
stays a *pytree* ``(y, adj_y, adj_sde)`` — our solver steps are tree-linear —
and "params" are simply the array leaves of the forward-SDE pytree, so
``adj_sde`` is a cotangent tree with the same structure.

Sign/time conventions mirror the reference exactly: the backward solve runs on
*negated, increasing* time; the adjoint vector fields evaluate the forward SDE
at ``-t`` and return negated outputs, and ``ReverseBrownian`` maps
``(ta, tb) -> base(-tb, -ta)`` without negating statistics
(reference adjoint_sde.py:236-323, derived.py:22-30).

Trait mapping (reference adjoint_sde.py:29-38): the adjoint of an
additive-noise SDE has *general* noise (its diffusion is linear in adj_y);
diagonal and scalar stay themselves.

Ito corrections: the adjoint of an Ito SDE is integrated as the Stratonovich
SDE with the double-Stratonovich-corrected drift
``f - sum_l (dg_l/dy) g_l`` plus Ito-conversion vjp terms
(reference adjoint_sde.py:130-216). In JAX both appear as compositions of
``jax.vjp`` / ``jax.jvp`` over pure functions, so higher-order terms
differentiate for free.
"""

import jax
import jax.numpy as jnp

from ..settings import NOISE_TYPES, SDE_TYPES
from ..utils.misc import tree_lc
from ..utils.module import Module


def _neg_first(triple):
    """Negate only the state-like slot: the reference returns
    ``(-f, *vjps)`` / ``(-g_prod, *vjps)`` — the vjp components enter the
    augmented dynamics with POSITIVE sign on the reversed clock
    (reference adjoint_sde.py:128, :230)."""
    first, vjp_y, vjp_sde = triple
    return (-first, vjp_y, vjp_sde)


class AdjointSDE(Module):
    is_adjoint_sde = True

    def __init__(self, forward_sde):
        sde_type = forward_sde.sde_type
        noise_type = {
            NOISE_TYPES.general: NOISE_TYPES.general,
            NOISE_TYPES.additive: NOISE_TYPES.general,
            NOISE_TYPES.scalar: NOISE_TYPES.scalar,
            NOISE_TYPES.diagonal: NOISE_TYPES.diagonal,
        }[forward_sde.noise_type]
        self.sde_type = sde_type
        self.noise_type = noise_type
        self.forward_sde = forward_sde
        # Static dispatch keys (resolved at trace time, reference adjoint_sde.py:48-68).
        self._fwd_noise = forward_sde.noise_type
        self._corrected = (forward_sde.sde_type == SDE_TYPES.ito and
                           forward_sde.noise_type != NOISE_TYPES.additive)

    def has_method(self, name):
        return name in ("f", "g_prod", "f_and_g_prod", "g_prod_and_gdg_prod")

    # ------------------------------------------------------------------ #
    #  Corrected / uncorrected drift as a pure function of (y, sde)      #
    # ------------------------------------------------------------------ #

    def _drift_fn(self, t):
        """Returns drift(y, sde) -> f evaluated at forward time -t, including
        the double-Stratonovich correction for Ito SDEs. Expressing the
        correction inside the function means a single jax.vjp differentiates
        through it, matching the reference's create_graph=True jvp
        (adjoint_sde.py:130-216)."""
        fwd_noise = self._fwd_noise
        corrected = self._corrected

        def drift(y, sde):
            f = sde.f(-t, y)
            if not corrected:
                return f
            g_fn = lambda y_: sde.g(-t, y_)
            if fwd_noise == NOISE_TYPES.diagonal:
                g, g_vjp = jax.vjp(g_fn, y)
                g_dg, = g_vjp(g)  # sum_i g_i dg_i/dy (elementwise structure)
                return f - g_dg
            else:  # scalar / general: sum over columns of (dg_l/dy) g_l
                g = g_fn(y)
                m = g.shape[-1]

                def col_jvp(col_idx):
                    tangent = g[..., col_idx]
                    _, dg = jax.jvp(g_fn, (y,), (tangent,))
                    return dg[..., col_idx]

                dg_g = jnp.sum(jax.vmap(col_jvp)(jnp.arange(m)), axis=0)
                return f - dg_g

        return drift

    def _ito_conversion_vjps(self, t, y, adj_y):
        """Extra vjp terms converting the adjoint Stratonovich SDE to Ito form
        (reference adjoint_sde.py:151-171, 195-212). Returns a (vjp_y, vjp_sde)
        pair to be *added* to the drift vjps."""
        sde = self.forward_sde
        g_fn_y = lambda y_: sde.g(-t, y_)
        g_fn_both = lambda y_, s_: s_.g(-t, y_)
        if self._fwd_noise == NOISE_TYPES.diagonal:
            _, g_vjp_y = jax.vjp(g_fn_y, y)
            a_dg, = g_vjp_y(adj_y)
            _, g_vjp_both = jax.vjp(g_fn_both, y, sde)
            return g_vjp_both(a_dg)
        else:  # scalar / general
            g, g_vjp_y = jax.vjp(g_fn_y, y)
            m = g.shape[-1]

            def col_cotangent(col_idx):
                ct = jnp.zeros_like(g).at[..., col_idx].set(adj_y)
                a_dg_col, = g_vjp_y(ct)
                return a_dg_col

            a_dgs = jax.vmap(col_cotangent)(jnp.arange(m))  # (m, B, d)
            # sum_l vjp(g_col_l, (y, sde), a_dg_l) == one vjp of g with the
            # stacked cotangent, by linearity of vjps in the cotangent.
            stacked_ct = jnp.moveaxis(a_dgs, 0, -1)  # (B, d, m)
            _, g_vjp_both = jax.vjp(g_fn_both, y, sde)
            return g_vjp_both(stacked_ct)

    # ------------------------------------------------------------------ #
    #  Capability interface on the augmented state                       #
    # ------------------------------------------------------------------ #

    def f(self, t, y_aug):
        y, adj_y, adj_sde = y_aug
        sde = self.forward_sde
        drift = self._drift_fn(t)
        f, drift_vjp = jax.vjp(drift, y, sde)
        vjp_y, vjp_sde = drift_vjp(adj_y)
        if self._corrected:
            extra_y, extra_sde = self._ito_conversion_vjps(t, y, adj_y)
            vjp_y = vjp_y + extra_y
            vjp_sde = tree_lc((1.0, vjp_sde), (1.0, extra_sde))
        return _neg_first((f, vjp_y, vjp_sde))

    def g_prod(self, t, y_aug, v):
        y, adj_y, adj_sde = y_aug
        sde = self.forward_sde
        gp_fn = lambda y_, s_: s_.g_prod(-t, y_, v)
        g_prod, gp_vjp = jax.vjp(gp_fn, y, sde)
        vjp_y, vjp_sde = gp_vjp(adj_y)
        return _neg_first((g_prod, vjp_y, vjp_sde))

    def f_and_g_prod(self, t, y_aug, v):
        return self.f(t, y_aug), self.g_prod(t, y_aug, v)

    def g_prod_and_gdg_prod(self, t, y_aug, v1, v2):
        """Adjoint Milstein correction pair, diagonal noise only
        (reference adjoint_sde.py:332-377)."""
        if self._fwd_noise != NOISE_TYPES.diagonal:
            raise NotImplementedError(
                "Adjoint Milstein is only available for diagonal-noise forward SDEs.")
        y, adj_y, adj_sde = y_aug
        sde = self.forward_sde
        g_fn_y = lambda y_: sde.g(-t, y_)
        g_fn_both = lambda y_, s_: s_.g(-t, y_)

        g, g_vjp_y = jax.vjp(g_fn_y, y)
        g_prod_out = self.g_prod(t, y_aug, v1)

        # vg_dg = vjp_y(g, cotangent = v2 * g): the forward Milstein bracket.
        vg_dg, = g_vjp_y(v2 * g)

        # prod-partials term: vjp over (y, params) with cotangent adj_y*v2*dgdy,
        # where dgdy = vjp_y(g, ones).
        dgdy, = g_vjp_y(jnp.ones_like(g))
        _, g_vjp_both = jax.vjp(g_fn_both, y, sde)
        pp_y, pp_sde = g_vjp_both(adj_y * v2 * dgdy)

        # mixed-partials term: grad over (y, params) of
        # sum( vjp_y(g)(stop_grad(adj_y*v2*g)) ).
        ct = jax.lax.stop_gradient(adj_y * v2 * g)

        def mixed_sum(y_, s_):
            g_inner_fn = lambda yy: s_.g(-t, yy)
            _, inner_vjp = jax.vjp(g_inner_fn, y_)
            avg_dg, = inner_vjp(ct)
            return jnp.sum(avg_dg)

        mp_y, mp_sde = jax.grad(mixed_sum, argnums=(0, 1))(y, sde)

        vjp_y = pp_y - mp_y
        vjp_sde = tree_lc((1.0, pp_sde), (-1.0, mp_sde))
        gdg_out = (vg_dg, vjp_y, vjp_sde)
        return g_prod_out, gdg_out
