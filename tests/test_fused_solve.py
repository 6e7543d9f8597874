"""Generic whole-solve fused kernels (ops/fused_solve.py) vs sdeint.

Interpret-mode validation that `fused_sdeint` — the declarative
"compile your MLP-SDE to one TPU kernel" API — matches `sdeint` values and
gradients for both step templates and both noise structures. Reference
step algebra: euler.py:19-37 and reversible_heun.py:48-73.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchsde_tpu.ops.fused_solve as FS
from torchsde_tpu.core.sdeint import sdeint


@pytest.fixture(scope="module", autouse=True)
def _interpret_mode():
    old = FS._INTERPRET
    FS._INTERPRET = True
    yield
    FS._INTERPRET = old


def _init_tower(key, sizes, acts, scale=0.3, dtype=jnp.float32):
    layers = []
    for i, (a, b) in enumerate(zip(sizes[:-1], sizes[1:])):
        k1, k2, key = jax.random.split(key, 3)
        # float(...) factors: a np.float64 scalar would silently promote the
        # f32 weights to f64 under jax_enable_x64
        w = jax.random.normal(k1, (a, b), jnp.float32) * float(
            scale / np.sqrt(a))
        bb = jax.random.normal(k2, (b,), jnp.float32) * 0.05
        layers.append((jnp.asarray(w, dtype), jnp.asarray(bb, dtype),
                       acts[i]))
    return FS.TowerSpec(layers)


def _apply_tower(spec, x):
    h = x
    for (w, b, act) in spec.layers:
        h = FS._apply_act(h @ w + b, act)
    return h


CASES = [
    # (method, sde_type, noise_type, d, m, with_time, depth)
    ("euler", "ito", "diagonal", 4, 4, False, 2),
    ("euler", "ito", "general", 3, 2, True, 3),
    ("reversible_heun", "stratonovich", "diagonal", 4, 4, False, 2),
    ("reversible_heun", "stratonovich", "general", 3, 2, True, 2),
    # exact lane width: no padding columns at all (zero-width-concat
    # regression — Mosaic rejects zero-size vectors; round-2 fix)
    ("euler", "ito", "diagonal", 128, 128, False, 2),
]


@pytest.mark.heavy  # ~10-14 s per cell (interpreter-mode whole-solve vjps)
@pytest.mark.parametrize("method,sde_type,noise_type,d,m,with_time,depth",
                         CASES)
def test_fused_sdeint_matches_sdeint(method, sde_type, noise_type, d, m,
                                     with_time, depth):
    import zlib
    key = jax.random.PRNGKey(
        zlib.crc32(f"{method}/{noise_type}/{d}".encode()) % 2 ** 31)
    B, T = 8, 5
    ts = np.linspace(0.0, 1.0, T)
    dt = 0.25 / 2  # grid lands exactly on ts
    in_size = d + (1 if with_time else 0)
    gout = d if noise_type == "diagonal" else d * m
    facts = tuple(["softplus"] * (depth - 1) + ["linear"])
    gacts = tuple(["lipswish"] * (depth - 1) + ["sigmoid"])
    drift = _init_tower(jax.random.fold_in(key, 1),
                        [in_size] + [16] * (depth - 1) + [d], facts)
    diffusion = _init_tower(jax.random.fold_in(key, 2),
                            [in_size] + [16] * (depth - 1) + [gout], gacts)
    sde = FS.tower_sde(drift, diffusion, noise_type, sde_type,
                       with_time=with_time)
    y0 = jax.random.normal(jax.random.fold_in(key, 3), (B, d), jnp.float32)
    nkey = jax.random.fold_in(key, 4)

    ys_ref = sdeint(sde, y0, ts, method=method, dt=dt, key=nkey)
    ys_f = FS.fused_sdeint(drift, diffusion, y0, ts, nkey, dt, method=method,
                           noise_type=noise_type, with_time=with_time,
                           dispatch="fused")
    np.testing.assert_allclose(ys_f, ys_ref, atol=2e-5)

    # gradients w.r.t. tower weights and y0 via both paths (weights only —
    # the activation strings are static)
    def respec(params, acts):
        return FS.TowerSpec([(w, b, a) for (w, b), a in zip(params, acts)])

    def loss_ref(drift_p, diff_p, y0):
        s = FS.tower_sde(respec(drift_p, facts), respec(diff_p, gacts),
                         noise_type, sde_type, with_time=with_time)
        return jnp.sum(sdeint(s, y0, ts, method=method, dt=dt, key=nkey) ** 2)

    def loss_fus(drift_p, diff_p, y0):
        return jnp.sum(FS.fused_sdeint(
            respec(drift_p, facts), respec(diff_p, gacts), y0, ts, nkey, dt,
            method=method, noise_type=noise_type, with_time=with_time,
            dispatch="fused") ** 2)

    args = ([(w, b) for (w, b, _) in drift.layers],
            [(w, b) for (w, b, _) in diffusion.layers], y0)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(*args)
    gf = jax.grad(loss_fus, argnums=(0, 1, 2))(*args)
    for r_tree, f_tree in zip(gr, gf):
        rl = jax.tree_util.tree_leaves(r_tree)
        fl = jax.tree_util.tree_leaves(f_tree)
        scale = max((float(jnp.max(jnp.abs(x))) for x in rl), default=0.0)
        for r, f in zip(rl, fl):
            np.testing.assert_allclose(
                f, r, atol=max(1e-4, 1e-5 * max(scale, 1.0)))


def test_tower_spec_validation():
    w = jnp.zeros((4, 4))
    b = jnp.zeros((4,))
    with pytest.raises(ValueError):
        FS.TowerSpec([(w, b, "relu")])  # unsupported activation
    with pytest.raises(ValueError):
        FS.TowerSpec([(jnp.zeros((4, 200)), jnp.zeros((200,)), "tanh")])
    with pytest.raises(ValueError, match="bias width"):
        FS.TowerSpec([(w, jnp.zeros((3,)), "tanh")])
    with pytest.raises(ValueError, match="chain"):
        FS.TowerSpec([(w, b, "tanh"), (jnp.zeros((5, 4)), b, "linear")])


def test_fused_sdeint_grid_guard():
    drift = FS.TowerSpec([(jnp.zeros((2, 2)), jnp.zeros((2,)), "linear")])
    diffusion = FS.TowerSpec([(jnp.zeros((2, 2)), jnp.zeros((2,)),
                               "sigmoid")])
    y0 = jnp.zeros((4, 2))
    # ts not on the dt grid raises on EVERY dispatch path — validation runs
    # before the dispatch decision, so 'auto' is purely a performance choice
    # (code-review r2).
    for dispatch in ("fused", "xla", "auto"):
        with pytest.raises(ValueError):
            FS.fused_sdeint(drift, diffusion, y0, [0.0, 0.3, 1.0],
                            jax.random.PRNGKey(0), 0.25, dispatch=dispatch)


def test_dispatch_dtype_contract():
    """Both usable dispatch paths compute in the towers' dtype: bf16 towers
    + f32 y0 return bf16 states (previously the XLA fallback silently
    returned f32 — the output dtype flipped on a width heuristic). The
    generic kernels are f32-only, so 'auto' routes bf16 towers to XLA and
    'fused' rejects them with a clear error."""
    key = jax.random.PRNGKey(11)
    d = 3
    drift = _init_tower(jax.random.fold_in(key, 1), [d, 8, d],
                        ("softplus", "linear"), dtype=jnp.bfloat16)
    diffusion = _init_tower(jax.random.fold_in(key, 2), [d, 8, d],
                            ("lipswish", "sigmoid"), dtype=jnp.bfloat16)
    y0 = jnp.zeros((4, d), jnp.float32)
    for dispatch in ("xla", "auto"):
        ys = FS.fused_sdeint(drift, diffusion, y0, np.linspace(0., 1., 3),
                             jax.random.fold_in(key, 3), 0.5,
                             dispatch=dispatch)
        assert ys.dtype == jnp.bfloat16, (dispatch, ys.dtype)
    with pytest.raises(ValueError, match="float32-only"):
        FS.fused_sdeint(drift, diffusion, y0, np.linspace(0., 1., 3),
                        jax.random.fold_in(key, 3), 0.5, dispatch="fused")


def test_grad_of_jit():
    """grad(jit(fused_sdeint)) — regression for the tile-matrix tracer leak
    (constants created inside an active trace must not be cached by the
    solver factories)."""
    key = jax.random.PRNGKey(11)
    d, B = 3, 4
    drift = _init_tower(jax.random.fold_in(key, 1), [d, 8, d],
                        ("softplus", "linear"))
    diffusion = _init_tower(jax.random.fold_in(key, 2), [d, 8, d],
                            ("lipswish", "sigmoid"))
    y0 = jax.random.normal(jax.random.fold_in(key, 3), (B, d), jnp.float32)
    ts = np.linspace(0.0, 1.0, 3)

    jf = jax.jit(lambda y0: FS.fused_sdeint(
        drift, diffusion, y0, ts, jax.random.PRNGKey(9), 0.5,
        dispatch="fused"))
    g = jax.grad(lambda y0: jnp.sum(jf(y0) ** 2))(y0)
    assert bool(jnp.all(jnp.isfinite(g))) and float(jnp.max(jnp.abs(g))) > 0


@pytest.mark.parametrize("with_time,gact", [
    (False, "sigmoid"), (True, "sigmoid"),
    # Negative-capable diffusion finals exercise the sign-preserving
    # stable_division clamp in the logqp kernels (ADVICE r1 high finding:
    # a positive-only clamp silently corrupted u = (f-h)/g when g < 0).
    (False, "linear"), (True, "tanh"),
])
@pytest.mark.heavy
def test_fused_logqp_matches_sdeint(with_time, gact):
    key = jax.random.PRNGKey(21 + with_time)
    B, d, T = 8, 4, 5
    ts = np.linspace(0.0, 1.0, T)
    dt = 0.125
    ins = d + (1 if with_time else 0)
    drift = _init_tower(jax.random.fold_in(key, 1), [ins, 16, d],
                        ("softplus", "linear"))
    prior = _init_tower(jax.random.fold_in(key, 2), [ins, 16, d],
                        ("softplus", "linear"))
    if gact == "sigmoid":
        diffusion = _init_tower(jax.random.fold_in(key, 3), [ins, d],
                                ("sigmoid",))
    else:
        # Depth-2 tower with random signs: g takes both signs across the batch.
        diffusion = _init_tower(jax.random.fold_in(key, 3), [ins, 8, d],
                                ("lipswish", gact), scale=0.8)
    sde = FS.tower_sde(drift, diffusion, "diagonal", "ito",
                       with_time=with_time, prior=prior)
    y0 = jax.random.normal(jax.random.fold_in(key, 4), (B, d), jnp.float32)
    nkey = jax.random.fold_in(key, 5)

    ys_ref, kl_ref = sdeint(sde, y0, ts, method="euler", dt=dt, key=nkey,
                            logqp=True)
    ys_f, kl_f = FS.fused_sdeint_logqp(drift, prior, diffusion, y0, ts,
                                       nkey, dt, with_time=with_time,
                                       dispatch="fused")
    np.testing.assert_allclose(ys_f, ys_ref, atol=2e-5)
    # Near-zero g amplifies fp op-order differences in u = (f-h)/g: the KL
    # integrand itself is O(1/g^2), so compare relatively.
    np.testing.assert_allclose(kl_f, kl_ref, rtol=3e-3, atol=2e-5)

    def respec(params, acts):
        return FS.TowerSpec([(w, b, a) for (w, b), a in zip(params, acts)])

    facts = drift.acts
    hacts = prior.acts
    gacts = diffusion.acts

    def loss_ref(fp, hp, gp, y0):
        s = FS.tower_sde(respec(fp, facts), respec(gp, gacts),
                         "diagonal", "ito", with_time=with_time,
                         prior=respec(hp, hacts))
        ys, kl = sdeint(s, y0, ts, method="euler", dt=dt, key=nkey,
                        logqp=True)
        return jnp.sum(ys ** 2) + jnp.sum(jnp.mean(kl, axis=1))

    def loss_fus(fp, hp, gp, y0):
        ys, kl = FS.fused_sdeint_logqp(
            respec(fp, facts), respec(hp, hacts), respec(gp, gacts), y0, ts,
            nkey, dt, with_time=with_time, dispatch="fused")
        return jnp.sum(ys ** 2) + jnp.sum(jnp.mean(kl, axis=1))

    args = ([(w, b) for (w, b, _) in drift.layers],
            [(w, b) for (w, b, _) in prior.layers],
            [(w, b) for (w, b, _) in diffusion.layers], y0)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    gf = jax.grad(loss_fus, argnums=(0, 1, 2, 3))(*args)
    for r_tree, f_tree in zip(gr, gf):
        rl = jax.tree_util.tree_leaves(r_tree)
        fl = jax.tree_util.tree_leaves(f_tree)
        scale = max((float(jnp.max(jnp.abs(x))) for x in rl), default=0.0)
        for r, f in zip(rl, fl):
            # rtol absorbs the 1/g^2 fp amplification near g = 0 (the guarded
            # failure mode — a wrong-sign clamp — is orders of magnitude off).
            np.testing.assert_allclose(
                f, r, rtol=5e-3, atol=max(1e-4, 1e-5 * max(scale, 1.0)))


def test_auto_dispatch_falls_back_identically():
    """VERDICT r1 item 6: narrow towers auto-fall-back to the XLA scan (never
    a slowdown) and the result is identical to sdeint — same key, bitwise
    noise stream."""
    key = jax.random.PRNGKey(3)
    d = 3
    drift = _init_tower(jax.random.fold_in(key, 1), [d, 8, d],
                        ("softplus", "linear"))
    diffusion = _init_tower(jax.random.fold_in(key, 2), [d, 8, d],
                            ("lipswish", "sigmoid"))
    assert not FS._auto_fuse(drift, diffusion)  # 128-lane padding >> 2x
    y0 = jax.random.normal(jax.random.fold_in(key, 3), (4, d), jnp.float32)
    ts = np.linspace(0.0, 1.0, 3)
    nkey = jax.random.fold_in(key, 4)
    ys_auto = FS.fused_sdeint(drift, diffusion, y0, ts, nkey, 0.5)
    sde = FS.tower_sde(drift, diffusion, "diagonal", "ito")
    ys_ref = sdeint(sde, y0, ts, method="euler", dt=0.5, key=nkey)
    assert np.array_equal(np.asarray(ys_auto), np.asarray(ys_ref))

    # near-lane-width towers stay on the kernel path
    wide_f = _init_tower(jax.random.fold_in(key, 5), [128, 128, 128],
                         ("softplus", "linear"))
    wide_g = _init_tower(jax.random.fold_in(key, 6), [128, 128, 128],
                         ("lipswish", "sigmoid"))
    assert FS._auto_fuse(wide_f, wide_g)

    # logqp fallback parity
    prior = _init_tower(jax.random.fold_in(key, 7), [d, 8, d],
                        ("softplus", "linear"))
    ys_a, kl_a = FS.fused_sdeint_logqp(drift, prior, diffusion, y0, ts,
                                       nkey, 0.5)
    sde_q = FS.tower_sde(drift, diffusion, "diagonal", "ito", prior=prior)
    ys_r, kl_r = sdeint(sde_q, y0, ts, method="euler", dt=0.5, key=nkey,
                        logqp=True)
    assert np.array_equal(np.asarray(ys_a), np.asarray(ys_r))
    assert np.array_equal(np.asarray(kl_a), np.asarray(kl_r))
