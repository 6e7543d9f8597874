"""Fused whole-solve SDE-GAN kernels (ops/gan_fused.py) vs the XLA path.

Runs the Pallas kernels through the interpreter on CPU; asserts the fused
generator (reversible-Heun, general noise) and critic-CDE solves match
`sdeint` and its autodiff gradients. Reference semantics: reversible Heun
(/root/reference/torchsde/_core/methods/reversible_heun.py:48-73) and the
sde_gan workload (/root/reference/examples/sde_gan.py:129-130, 183-185).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchsde_tpu.ops.gan_fused as GF
from torchsde_tpu.core.sdeint import sdeint
from torchsde_tpu.models import sde_gan as G


# Integration tier: whole-solve fused-kernel equivalence via the Pallas
# interpreter (~1-2 CPU-min per module) — run with `-m heavy` or `-m ""`.
pytestmark = pytest.mark.heavy


@pytest.fixture(scope="module", autouse=True)
def _interpret_mode():
    old = GF._INTERPRET
    GF._INTERPRET = True
    yield
    GF._INTERPRET = old


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    B, T = 8, 6
    ts = np.linspace(0.0, T - 1, T)
    gen = G.Generator(jax.random.fold_in(key, 2), 1, 5, 3, 16, 16, 1)
    disc = G.Discriminator(jax.random.fold_in(key, 3), 1, 16, 16, 1)
    _, data = G.get_ou_data(jax.random.fold_in(key, 1), B, T)
    real = jnp.asarray(data[:B], jnp.float32)
    return key, B, ts, gen, disc, real


def _max_tree_diff(a_tree, b_tree):
    aa = jax.tree_util.tree_leaves(a_tree)
    bb = jax.tree_util.tree_leaves(b_tree)
    return max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(aa, bb))


def test_generator_solve_matches_xla(setup):
    key, B, ts, gen, _, _ = setup
    x0 = jax.random.normal(jax.random.fold_in(key, 5), (B, 16), jnp.float32)
    k2 = jax.random.fold_in(key, 6)
    xs_ref = sdeint(gen.func, x0, ts, method="reversible_heun", dt=1.0,
                    key=k2)
    xs_f = GF.generator_solve_fused(gen.func, x0, ts, k2, 1.0)
    np.testing.assert_allclose(xs_f, xs_ref, atol=1e-5)

    def loss_ref(func, x0):
        return jnp.sum(sdeint(func, x0, ts, method="reversible_heun",
                              dt=1.0, key=k2) ** 2)

    def loss_fus(func, x0):
        return jnp.sum(GF.generator_solve_fused(func, x0, ts, k2, 1.0) ** 2)

    gr_f, gr_x = jax.grad(loss_ref, argnums=(0, 1))(gen.func, x0)
    gf_f, gf_x = jax.grad(loss_fus, argnums=(0, 1))(gen.func, x0)
    np.testing.assert_allclose(gf_x, gr_x, atol=1e-4)
    assert _max_tree_diff(gr_f, gf_f) < 1e-3  # weight grads, scale ~1e2


def test_cde_solve_matches_xla(setup):
    key, B, ts, _, disc, real = setup
    h0 = disc.initial(real[:, 0])
    func = disc.func.evolve(_path_ts=jnp.asarray(ts, jnp.float32),
                            _path_ys=real)
    hs_ref = sdeint(func, h0, ts, method="reversible_heun", dt=1.0,
                    entropy=0)
    h_f = GF.cde_final_state_fused(func, h0, ts, 1.0)
    np.testing.assert_allclose(h_f, hs_ref[-1], atol=1e-5)

    def loss_ref(ys, h0):
        f = func.evolve(_path_ys=ys)
        return jnp.sum(sdeint(f, h0, ts, method="reversible_heun", dt=1.0,
                              entropy=0)[-1] ** 2)

    def loss_fus(ys, h0):
        f = func.evolve(_path_ys=ys)
        return jnp.sum(GF.cde_final_state_fused(f, h0, ts, 1.0) ** 2)

    gr_y, gr_h = jax.grad(loss_ref, argnums=(0, 1))(real, h0)
    gf_y, gf_h = jax.grad(loss_fus, argnums=(0, 1))(real, h0)
    np.testing.assert_allclose(gf_h, gr_h, atol=1e-4)
    # gradients through the control-path knot VALUES must match
    np.testing.assert_allclose(gf_y, gr_y, atol=1e-4)


def test_gan_loss_fused_grads_match(setup):
    key, _, ts, gen, disc, real = setup
    k = jax.random.fold_in(key, 4)
    lr, (ggr, gdr) = jax.value_and_grad(G.gan_loss, argnums=(0, 1))(
        gen, disc, k, ts, real, 1.0, False, False)
    lf, (ggf, gdf) = jax.value_and_grad(jax.jit(
        lambda g_, d_: G.gan_loss(g_, d_, k, ts, real, 1.0, False, True)),
        argnums=(0, 1))(gen, disc)
    np.testing.assert_allclose(lf, lr, atol=1e-5)
    assert _max_tree_diff(ggr, ggf) < 1e-5
    assert _max_tree_diff(gdr, gdf) < 1e-5


def test_cde_knot_time_guard(setup):
    key, B, ts, _, disc, real = setup
    h0 = disc.initial(real[:, 0])
    bad = disc.func.evolve(
        _path_ts=jnp.asarray(ts, jnp.float32) * 2.0, _path_ys=real)
    with pytest.raises(ValueError):
        GF.cde_final_state_fused(bad, h0, ts, 1.0)


def test_gen_solve_full_vjp_including_noise(setup):
    """VJP of the raw fused solve vs a plain-XLA lax.scan of the SAME
    recurrence, for ALL inputs — including the noise cotangent, which the
    gan_loss tests never exercise (noise is key-derived there). Catches
    stream-indexing bugs that interpret mode can hide (e.g. the r1
    out-of-bounds g_n block map)."""
    key, B, ts, gen, _, _ = setup
    func = gen.func
    S, m = 16, 3
    N = len(ts) - 1
    x0 = jax.random.normal(jax.random.fold_in(key, 7), (B, S), jnp.float32)
    noise = jax.random.normal(jax.random.fold_in(key, 8), (N, B, m),
                              jnp.float32)
    t1s = jnp.asarray(ts[1:], jnp.float32)
    dts = jnp.asarray(np.diff(ts), jnp.float32)
    weights = GF.pack_gen_weights(func)
    f0, g0 = func.f_and_g(jnp.float32(ts[0]), x0)
    g0 = g0.reshape(B, S * m)

    def xla_ref(weights, x0, f0, g0, noise, t1s, dts):
        def towers(t, z):
            zin = jnp.concatenate(
                [jnp.full((B, 1), t), z,
                 jnp.zeros((B, GF._LANE - 1 - S), z.dtype)], axis=1)
            f, _, _ = GF._tower_fwd(zin, weights["W1f"], weights["b1f"],
                                    weights["W2f"], weights["b2f"])
            g, _, _ = GF._tower_fwd(zin, weights["W1g"], weights["b1g"],
                                    weights["W2g"], weights["b2g"])
            return f[:, :S], g[:, :S * m]

        def step(carry, inp):
            x, z, f0c, g0c = carry
            dW, t1, dt = inp
            g0dW = jnp.einsum("bij,bj->bi", g0c.reshape(B, S, m), dW)
            z1 = 2 * x - z + dt * f0c + g0dW
            f1, g1 = towers(t1, z1)
            gsum = (g0c + g1).reshape(B, S, m)
            x1 = (x + 0.5 * dt * (f0c + f1)
                  + 0.5 * jnp.einsum("bij,bj->bi", gsum, dW))
            return (x1, z1, f1, g1), x1

        _, ys = jax.lax.scan(step, (x0, x0, f0, g0), (noise, t1s, dts))
        return ys

    args = (weights, x0, f0, g0, noise, t1s, dts)
    ys_f, vjp_f = jax.vjp(GF._gen_solve, *args)
    ys_r, vjp_r = jax.vjp(xla_ref, *args)
    np.testing.assert_allclose(ys_f, ys_r, atol=1e-5)

    gy = jax.random.normal(jax.random.fold_in(key, 9), ys_r.shape,
                           jnp.float32)
    cots_f = vjp_f(gy)
    cots_r = vjp_r(gy)
    names = ("weights", "x0", "f0", "g0", "noise", "t1s", "dts")
    for name, cf, cr in zip(names, cots_f, cots_r):
        if name in ("t1s", "dts"):
            continue  # declared non-differentiable in the fused path
        d = _max_tree_diff(cf, cr)
        scale = max((float(jnp.max(jnp.abs(x)))
                     for x in jax.tree_util.tree_leaves(cr)), default=0.0)
        assert d <= max(1e-4, 1e-5 * max(scale, 1.0)), (name, d, scale)


def test_bf16_mixed_mode_matches_xla_bf16():
    """bf16 mixed-precision fused GAN kernels (VERDICT r2 item 6, the scheme
    ported from latent_fused): bf16 weights/noise-streams/matmuls with f32
    state carries and f32 gradient accumulators. The acceptance oracle is
    the XLA path run at the SAME bf16 weights — the two share weight/noise
    rounding, so they must agree closely even though both differ from f32
    at bf16 scale."""
    import math
    key = jax.random.PRNGKey(0)
    B, T = 8, 6
    ts = np.linspace(0.0, T - 1, T)
    gen = G.Generator(jax.random.fold_in(key, 2), 1, 5, 3, 16, 16, 1,
                      dtype=jnp.bfloat16)
    disc = G.Discriminator(jax.random.fold_in(key, 3), 1, 16, 16, 1,
                           dtype=jnp.bfloat16)
    _, data = G.get_ou_data(jax.random.fold_in(key, 1), B, T)
    real = jnp.asarray(data[:B], jnp.bfloat16)
    k = jax.random.fold_in(key, 4)

    def run(fused):
        loss, (gg, gd) = jax.value_and_grad(G.gan_loss, argnums=(0, 1))(
            gen, disc, k, ts, real, 1.0, False, fused)
        leaves = [jnp.asarray(x, jnp.float32)
                  for x in jax.tree_util.tree_leaves((gg, gd))]
        return float(loss), leaves, (gg, gd)

    l_xla, g_xla, _ = run(False)
    l_fus, g_fus, (gg_f, gd_f) = run(True)
    # The Wasserstein loss is a mean-score DIFFERENCE near zero (massive
    # cancellation), and the XLA oracle carries bf16 state while mixed mode
    # carries f32 — so compare absolutely at the bf16 resolution of the O(1)
    # critic scores, not relatively against the cancelled value.
    assert abs(l_fus - l_xla) < 2e-2, (l_fus, l_xla)
    num = sum(float(jnp.sum(a * b)) for a, b in zip(g_xla, g_fus))
    na = math.sqrt(sum(float(jnp.sum(a * a)) for a in g_xla))
    nb = math.sqrt(sum(float(jnp.sum(b * b)) for b in g_fus))
    assert num / (na * nb) > 0.999, num / (na * nb)
    # Cotangents keep the weights' dtype (custom_vjp contract after the f32
    # accumulator cast-back).
    for leaf in jax.tree_util.tree_leaves((gg_f, gd_f)):
        assert leaf.dtype == jnp.bfloat16
