"""Fused whole-solve latent-SDE kernel (ops/latent_fused.py) vs the XLA path.

Runs the Pallas kernels through the interpreter on CPU; asserts the fused
forward and hand-derived backward match `sdeint(..., logqp=True)` and its
autodiff gradients. Reference semantics: SDELogqp augmentation
(/root/reference/torchsde/_core/base_sde.py:240-307) + parse_return
(/root/reference/torchsde/_core/sdeint.py:284-300).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchsde_tpu.ops.latent_fused as LF
from torchsde_tpu.core.sdeint import sdeint
from torchsde_tpu.models.latent_sde import LatentSDE, latent_sde_loss


# Integration tier: whole-solve fused-kernel equivalence via the Pallas
# interpreter (~1-2 CPU-min per module) — run with `-m heavy` or `-m ""`.
pytestmark = pytest.mark.heavy


@pytest.fixture(scope="module", autouse=True)
def _interpret_mode():
    old = LF._INTERPRET
    LF._INTERPRET = True
    yield
    LF._INTERPRET = old


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    B, DATA, L, C, H, T = 8, 3, 4, 16, 32, 6
    model = LatentSDE(key, DATA, L, C, H)
    ts = np.linspace(0.0, 1.0, T)
    # Float32 end-to-end (the flagship config): the noise stream is
    # dtype-dependent, so the fused/XLA comparison needs matching dtypes.
    xs = jax.random.normal(jax.random.fold_in(key, 1), (T, B, DATA),
                           jnp.float32)
    ctx = model.encode(xs, jnp.asarray(ts, jnp.float32))
    m = model.contextualize(ts, ctx)
    z0 = jax.random.normal(jax.random.fold_in(key, 2), (B, L), jnp.float32)
    return m, model, z0, ts, xs, jax.random.PRNGKey(7), 1.0 / 32


def test_forward_matches_xla(setup):
    m, _, z0, ts, _, nkey, dt = setup
    zs_ref, kl_ref = sdeint(m, z0, ts, dt=dt, logqp=True, key=nkey,
                            method="euler")
    zs_f, kl_f = LF.latent_logqp_solve_fused(m, z0, ts, nkey, dt)
    assert zs_f.shape == zs_ref.shape and kl_f.shape == kl_ref.shape
    np.testing.assert_allclose(zs_f, zs_ref, atol=1e-5)
    np.testing.assert_allclose(kl_f, kl_ref, atol=1e-5)


def test_gradients_match_xla(setup):
    m, _, z0, ts, _, nkey, dt = setup

    def loss_xla(m, z0):
        zs, kl = sdeint(m, z0, ts, dt=dt, logqp=True, key=nkey,
                        method="euler")
        return jnp.sum(zs ** 2) + jnp.sum(jnp.mean(kl, axis=1))

    def loss_fused(m, z0):
        zs, kl = LF.latent_logqp_solve_fused(m, z0, ts, nkey, dt)
        return jnp.sum(zs ** 2) + jnp.sum(jnp.mean(kl, axis=1))

    g_ref_m, g_ref_z = jax.grad(loss_xla, argnums=(0, 1))(m, z0)
    g_f_m, g_f_z = jax.grad(loss_fused, argnums=(0, 1))(m, z0)
    np.testing.assert_allclose(g_f_z, g_ref_z, atol=1e-4)
    for name in ("f_net", "h_net", "g_nets", "_ctx"):
        ref = jax.tree_util.tree_leaves(getattr(g_ref_m, name))
        got = jax.tree_util.tree_leaves(getattr(g_f_m, name))
        scale = max(float(jnp.max(jnp.abs(r))) for r in ref) + 1e-12
        for r, g in zip(ref, got):
            np.testing.assert_allclose(g, r, atol=max(1e-4, 3e-5 * scale))


def test_latent_sde_loss_fused_flag(setup):
    _, model, _, ts, xs, nkey, dt = setup
    l_ref, _ = latent_sde_loss(model, xs, ts, nkey, dt=dt)
    l_f, _ = latent_sde_loss(model, xs, ts, nkey, dt=dt, fused=True)
    np.testing.assert_allclose(l_f, l_ref, rtol=1e-4)
    with pytest.raises(ValueError):
        latent_sde_loss(model, xs, ts, nkey, dt=dt, fused=True, adjoint=True)
    with pytest.raises(ValueError):
        latent_sde_loss(model, xs, ts, nkey, dt=dt, fused=True,
                        method="milstein")


def test_gradients_match_with_saturated_diffusion(setup):
    """When g <= stable_division's epsilon (saturated sigmoid), only the
    u-path gradient is clamped; the state-update term dz*dW must survive.
    Regression test for the fused backward masking the ENTIRE diffusion
    cotangent (code-review r4 finding)."""
    m, _, z0, ts, _, nkey, dt = setup
    w1, b1, w2, b2 = m.g_nets
    m_sat = m.evolve(g_nets=(w1, b1, w2, b2 - 25.0))  # sigmoid ~ 1e-11

    def loss(solver, model, z0):
        zs, kl = solver(model, z0)
        return jnp.sum(zs ** 2) + jnp.sum(jnp.mean(kl, axis=1))

    xla = lambda model, z0: sdeint(model, z0, ts, dt=dt, logqp=True,  # noqa: E731
                                   key=nkey, method="euler")
    fus = lambda model, z0: LF.latent_logqp_solve_fused(  # noqa: E731
        model, z0, ts, nkey, dt)
    g_ref = jax.grad(lambda mm: loss(xla, mm, z0))(m_sat)
    g_f = jax.grad(lambda mm: loss(fus, mm, z0))(m_sat)
    ref_leaves = jax.tree_util.tree_leaves(g_ref.g_nets)
    got_leaves = jax.tree_util.tree_leaves(g_f.g_nets)
    # the diffusion-net gradient must be nonzero (dz*dW path) and match
    assert any(float(jnp.max(jnp.abs(r))) > 0 for r in ref_leaves)
    for r, g in zip(ref_leaves, got_leaves):
        np.testing.assert_allclose(g, r, atol=1e-5)


def test_variant_architecture_rejected(setup):
    """pack_weights must fail loudly on architectures the kernels don't
    implement (code-review r4: a tanh f_net previously got silently wrong
    softplus towers from the fused path)."""
    _, model, _, ts, xs, nkey, dt = setup
    bad = model.evolve(f_net=model.f_net.evolve(activation="tanh"))
    with pytest.raises(ValueError):
        latent_sde_loss(bad, xs, ts, nkey, dt=dt, fused=True)


def test_bf16_mixed_mode_matches_xla_bf16():
    """bf16 mixed-precision fused kernels (VERDICT r1 weak item 1): bf16
    weights/streams/matmuls with f32 state and gradient accumulators. The
    acceptance oracle is the XLA path run at the SAME bf16 weights — the two
    share weight/noise rounding, so they must agree closely even though both
    differ from f32 at bf16 scale."""
    import math
    key = jax.random.PRNGKey(0)
    ts = jnp.linspace(0.0, 1.0, 4)
    xs32 = jax.random.normal(jax.random.fold_in(key, 9), (4, 8, 3))

    def run(fused):
        model = LatentSDE(key, 3, 4, 16, 32, dtype=jnp.bfloat16)
        xs = jnp.asarray(xs32, jnp.bfloat16)
        (loss, _), g = jax.value_and_grad(lambda m: latent_sde_loss(
            m, xs, ts, key, dt=0.25, fused=fused), has_aux=True)(model)
        leaves = [jnp.asarray(l, jnp.float32)
                  for l in jax.tree_util.tree_leaves(g)]
        return float(loss), leaves

    l_xla, g_xla = run(False)
    l_fus, g_fus = run(True)
    assert abs(l_fus - l_xla) / abs(l_xla) < 5e-3, (l_fus, l_xla)
    num = sum(float(jnp.sum(a * b)) for a, b in zip(g_xla, g_fus))
    na = math.sqrt(sum(float(jnp.sum(a * a)) for a in g_xla))
    nb = math.sqrt(sum(float(jnp.sum(b * b)) for b in g_fus))
    assert num / (na * nb) > 0.999, num / (na * nb)


def test_steps_per_block_unroll_matches(setup):
    """S solver steps per kernel grid step (perf knob) must not change
    values or gradients."""
    m, _, z0, ts, _, nkey, dt = setup
    zs_1, kl_1 = LF.latent_logqp_solve_fused(m, z0, ts, nkey, dt)

    def loss(mm):
        zs, kl = LF.latent_logqp_solve_fused(mm, z0, ts, nkey, dt)
        return jnp.sum(zs ** 2) + jnp.sum(kl)

    g_1 = jax.grad(loss)(m)
    old = LF._STEPS_PER_BLOCK
    try:
        LF._STEPS_PER_BLOCK = 4          # n=32 steps -> 8 grid steps
        zs_4, kl_4 = LF.latent_logqp_solve_fused(m, z0, ts, nkey, dt)
        g_4 = jax.grad(loss)(m)
    finally:
        LF._STEPS_PER_BLOCK = old
    np.testing.assert_allclose(zs_4, zs_1, atol=1e-7)
    np.testing.assert_allclose(kl_4, kl_1, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(g_1),
                    jax.tree_util.tree_leaves(g_4)):
        np.testing.assert_allclose(b, a, atol=1e-6)
    with pytest.raises(ValueError):
        try:
            LF._STEPS_PER_BLOCK = 5      # does not divide 32
            LF.latent_logqp_solve_fused(m, z0, ts, nkey, dt)
        finally:
            LF._STEPS_PER_BLOCK = old


# --------------------------------------------------------------------------- #
#  Multi-replica kernels (K solves in one pallas_call)                        #
# --------------------------------------------------------------------------- #


@pytest.fixture(scope="module")
def multi_setup():
    from torchsde_tpu.models.latent_sde import latent_sde_loss_multi  # noqa: F401
    key = jax.random.PRNGKey(3)
    K, B, DATA, L, C, H, T = 2, 8, 3, 4, 16, 32, 6
    keys = jax.random.split(key, K)
    models = jax.vmap(
        lambda k: LatentSDE(k, DATA, L, C, H))(keys)
    ts = np.linspace(0.0, 1.0, T)
    xs = jax.random.normal(jax.random.fold_in(key, 1), (T, B, DATA),
                           jnp.float32)
    skeys = jax.vmap(lambda k: jax.random.fold_in(k, 7))(keys)
    return models, keys, skeys, ts, xs, 1.0 / 32


def _replica(tree, k):
    return jax.tree_util.tree_map(lambda a: a[k], tree)


def test_multi_solve_matches_per_replica(multi_setup):
    """The K-unrolled kernel must reproduce K single-replica fused solves
    exactly (same per-replica noise keys, same math)."""
    models, _, skeys, ts, xs, dt = multi_setup
    K = skeys.shape[0]
    tsf = jnp.asarray(ts, jnp.float32)

    def prep(model, key):
        ctx = model.encode(xs, tsf)
        m = model.contextualize(ts, ctx)
        z0, _, _ = m.posterior_z0(ctx[0], key)
        return m, z0

    ms, z0 = jax.vmap(prep)(models, skeys)
    zs_m, lr_m = LF.latent_logqp_solve_fused_multi(ms, z0, ts, skeys, dt)
    assert zs_m.shape[0] == K and lr_m.shape[0] == K
    for k in range(K):
        zs_1, lr_1 = LF.latent_logqp_solve_fused(
            _replica(ms, k), z0[k], ts, skeys[k], dt)
        np.testing.assert_allclose(zs_m[k], zs_1, atol=1e-6)
        np.testing.assert_allclose(lr_m[k], lr_1, atol=1e-6)


def test_multi_loss_and_grads_match_per_replica(multi_setup):
    """latent_sde_loss_multi == stacked latent_sde_loss(fused=True), for
    values AND gradients of every replica's weights."""
    from torchsde_tpu.models.latent_sde import latent_sde_loss_multi
    models, keys, _, ts, xs, dt = multi_setup
    K = keys.shape[0]

    (total, losses), g_multi = jax.value_and_grad(
        lambda m: latent_sde_loss_multi(m, xs, ts, keys, dt=dt, fused=True),
        has_aux=True)(models)
    np.testing.assert_allclose(total, float(jnp.sum(losses)), rtol=1e-6)

    for k in range(K):
        l_1, _ = latent_sde_loss(_replica(models, k), xs, ts, keys[k],
                                 dt=dt, fused=True)
        np.testing.assert_allclose(losses[k], l_1, rtol=1e-5)
        g_1 = jax.grad(lambda m: latent_sde_loss(
            m, xs, ts, keys[k], dt=dt, fused=True)[0])(_replica(models, k))
        ref_leaves = jax.tree_util.tree_leaves(g_1)
        got_leaves = [l[k] for l in jax.tree_util.tree_leaves(g_multi)]
        for r, g in zip(ref_leaves, got_leaves):
            scale = float(jnp.max(jnp.abs(r))) + 1e-12
            np.testing.assert_allclose(g, r, atol=max(1e-5, 1e-5 * scale))


def test_multi_loss_per_replica_xs(multi_setup):
    """Per-replica data (K, T, B, D) is accepted and routes each replica its
    own xs."""
    from torchsde_tpu.models.latent_sde import latent_sde_loss_multi
    models, keys, _, ts, xs, dt = multi_setup
    K = keys.shape[0]
    xs_k = jnp.stack([xs + k for k in range(K)])
    _, losses = latent_sde_loss_multi(models, xs_k, ts, keys, dt=dt,
                                      fused=True)
    for k in range(K):
        l_1, _ = latent_sde_loss(_replica(models, k), xs + k, ts, keys[k],
                                 dt=dt, fused=True)
        np.testing.assert_allclose(losses[k], l_1, rtol=1e-5)


def test_multi_loss_default_xla_path(multi_setup):
    """fused=False (the default, measured-fastest multi-replica path) is a
    vmap of the per-replica XLA loss."""
    from torchsde_tpu.models.latent_sde import latent_sde_loss_multi
    models, keys, _, ts, xs, dt = multi_setup
    total, losses = latent_sde_loss_multi(models, xs, ts, keys, dt=dt)
    np.testing.assert_allclose(total, float(jnp.sum(losses)), rtol=1e-6)
    for k in range(keys.shape[0]):
        l_1, _ = latent_sde_loss(_replica(models, k), xs, ts, keys[k], dt=dt)
        np.testing.assert_allclose(losses[k], l_1, rtol=1e-5)
