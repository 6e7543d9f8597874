"""Data-parallel execution over a virtual 8-device CPU mesh.

The solver core must be communication-free per shard (SURVEY.md §2.8/§5.8):
sharding the batch axis must reproduce the single-device result (up to
reassociation-level float differences; partitionable threefry keeps the
noise identical per shard), and a full DP training step
(loss + adjoint gradients + update) must compile and run with the model
replicated and the batch sharded.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchsde_tpu as tsde
from torchsde_tpu.parallel import mesh as pmesh

import problems

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


def test_sharded_solve_matches_single_device():
    sde = problems.NeuralDiagonal(d=3, sde_type="stratonovich")
    y0 = jnp.full((16, 3), 0.1, jnp.float64)
    ts = [0.0, 0.2, 0.4]
    bm = tsde.BrownianInterval(0.0, 0.4, (16, 3), dtype=jnp.float64, entropy=5,
                               levels=8)

    solve = jax.jit(lambda s, y: tsde.sdeint(s, y, ts, bm=bm, method="midpoint",
                                             dt=0.05))
    ys_single = solve(sde, y0)

    m = pmesh.make_mesh()
    y0_sharded = pmesh.shard_batch(y0, m)
    sde_repl = pmesh.replicate(sde, m)
    ys_sharded = solve(sde_repl, y0_sharded)
    np.testing.assert_allclose(np.asarray(ys_single), np.asarray(ys_sharded),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.heavy
def test_dp_train_step():
    from torchsde_tpu.models.latent_sde import LatentSDE, latent_sde_loss

    key = jax.random.PRNGKey(0)
    T, B = 4, 16
    ts = jnp.linspace(0.0, 0.3, T)
    xs = jax.random.normal(jax.random.fold_in(key, 1), (T, B, 3), jnp.float32)
    model = LatentSDE(jax.random.fold_in(key, 2), data_size=3, latent_size=2,
                      context_size=4, hidden_size=8)

    m = pmesh.make_mesh()
    xs = jax.device_put(xs, pmesh.batch_sharding(m, batch_axis=1))
    model = pmesh.replicate(model, m)

    @jax.jit
    def step(model, xs, key):
        def lf(mm):
            loss, _ = latent_sde_loss(mm, xs, ts, key, dt=0.1)
            return loss
        loss, grads = jax.value_and_grad(lf)(model)
        model = jax.tree_util.tree_map(lambda p, g: p - 1e-4 * g, model, grads)
        return model, loss

    model, loss = step(model, xs, jax.random.fold_in(key, 3))
    assert bool(jnp.isfinite(loss))
    # Parameters stay replicated (gradient psum happened under the hood).
    w = model.projector.w
    assert not w.is_fully_addressable or w.sharding.is_fully_replicated


@pytest.mark.heavy
def test_dp_train_step_cont_ddpm():
    """DP training step for the second workload family (VERDICT r4 item 2):
    the conv U-Net score-matching objective with the image batch sharded over
    the 8-device mesh and the model replicated must (a) run, (b) match the
    unsharded loss and gradients (partitionable threefry keeps the stratified
    time draws and conditional samples identical per example; only the
    batch-mean reduction reassociates), and (c) keep parameters replicated
    through the update."""
    from torchsde_tpu.models.cont_ddpm import ScoreMatchingSDE
    from torchsde_tpu.models.unet import UNet

    key = jax.random.PRNGKey(0)
    H, B = 8, 16
    denoiser = UNet(jax.random.fold_in(key, 1), in_ch=1, base_ch=8,
                    ch_mults=(1, 2))
    sde = ScoreMatchingSDE(denoiser, input_size=(1, H, H))
    x = jax.random.uniform(jax.random.fold_in(key, 2), (B, 1, H, H),
                           jnp.float32) * 2 - 1

    @jax.jit
    def step(sde, x, key):
        def lf(s):
            return jnp.mean(s.loss(key, x, partitions=1))
        loss, grads = jax.value_and_grad(lf)(sde)
        sde = jax.tree_util.tree_map(lambda p, g: p - 1e-4 * g, sde, grads)
        return sde, loss

    skey = jax.random.fold_in(key, 3)
    sde_ref, loss_ref = step(sde, x, skey)

    m = pmesh.make_mesh()
    x_sh = pmesh.shard_batch(x, m)
    sde_sh = pmesh.replicate(sde, m)
    sde_out, loss_sh = step(sde_sh, x_sh, skey)

    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(sde_out),
                    jax.tree_util.tree_leaves(sde_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    # gradients psummed under the hood; parameters stay replicated
    w = sde_out.denoiser.conv_in.w
    assert not w.is_fully_addressable or w.sharding.is_fully_replicated


@pytest.mark.heavy
def test_dp_train_step_sde_gan():
    """DP training step for the third workload family (VERDICT r4 item 2):
    one generator+critic Wasserstein update — reversible-Heun generator solve,
    CDE critic solve at 2x batch, both through the adjoint — with the real
    paths sharded over the 8-device mesh. Loss and the updated parameters
    must match the unsharded step (the generator's noise is keyed per
    example, so sharding only reassociates the two batch means)."""
    from torchsde_tpu.models.sde_gan import (Discriminator, Generator,
                                             gan_grads, get_ou_data)

    key = jax.random.PRNGKey(5)
    B, t_size = 16, 4
    gen = Generator(jax.random.fold_in(key, 1), data_size=1,
                    initial_noise_size=3, noise_size=2, hidden_size=4,
                    mlp_size=8, num_layers=1)
    disc = Discriminator(jax.random.fold_in(key, 2), data_size=1,
                         hidden_size=4, mlp_size=8, num_layers=1)
    ts, paths = get_ou_data(jax.random.fold_in(key, 3), B, t_size)
    ts = np.asarray(ts)

    @jax.jit
    def step(gen, disc, paths, key):
        loss, g_gen, g_disc = gan_grads(gen, disc, key, ts, paths, dt=1.0,
                                        adjoint=True)
        gen = jax.tree_util.tree_map(lambda p, g: p - 1e-3 * g, gen, g_gen)
        disc = jax.tree_util.tree_map(lambda p, g: p - 1e-3 * g, disc, g_disc)
        return gen, disc.clip_weights(), loss

    skey = jax.random.fold_in(key, 4)
    gen_ref, disc_ref, loss_ref = step(gen, disc, paths, skey)

    m = pmesh.make_mesh()
    paths_sh = pmesh.shard_batch(paths, m)
    gen_sh = pmesh.replicate(gen, m)
    disc_sh = pmesh.replicate(disc, m)
    gen_out, disc_out, loss_sh = step(gen_sh, disc_sh, paths_sh, skey)

    np.testing.assert_allclose(float(loss_sh), float(loss_ref),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves((gen_out, disc_out)),
                    jax.tree_util.tree_leaves((gen_ref, disc_ref))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    w = gen_out.readout.w
    assert not w.is_fully_addressable or w.sharding.is_fully_replicated


@pytest.mark.heavy
def test_tp_dp_2d_mesh_train_step():
    """2-D (data x model) mesh: batch sharded over 'data', the drift MLPs
    Megatron-sharded over 'model'. Loss must match the unsharded run (GSPMD
    only repartitions; the program is identical up to reassociation)."""
    from torchsde_tpu.models.latent_sde import LatentSDE, latent_sde_loss

    key = jax.random.PRNGKey(0)
    T, B = 4, 16
    ts = jnp.linspace(0.0, 0.3, T)
    xs = jax.random.normal(jax.random.fold_in(key, 1), (T, B, 3), jnp.float32)
    model = LatentSDE(jax.random.fold_in(key, 2), data_size=3, latent_size=4,
                      context_size=8, hidden_size=16)

    def loss_fn(model, xs, key):
        loss, _ = latent_sde_loss(model, xs, ts, key, dt=0.1)
        return loss

    base = float(jax.jit(loss_fn)(model, xs, key))

    m2 = pmesh.make_mesh_2d(n_model=2)
    assert dict(m2.shape) == {"data": 4, "model": 2}
    xs_sh = pmesh.shard_batch(xs, m2, batch_axis=1)
    model_sh = pmesh.shard_latent_sde_tp(model, m2)

    # verify the TP placement actually sharded the hidden dimension
    l0 = model_sh.f_net.layers[0].w.sharding
    assert l0.spec == jax.sharding.PartitionSpec(None, "model"), l0

    def train_step(model, xs, key):
        loss, grads = jax.value_and_grad(loss_fn)(model, xs, key)
        model = jax.tree_util.tree_map(lambda p, g: p - 1e-3 * g, model, grads)
        return model, loss

    model_out, loss = jax.jit(train_step)(model_sh, xs_sh, key)
    assert np.isfinite(float(loss))
    np.testing.assert_allclose(float(loss), base, rtol=1e-4)
    # parameters keep their TP sharding through the update
    w_out = model_out.f_net.layers[0].w
    assert w_out.sharding.spec == jax.sharding.PartitionSpec(None, "model")


def test_fused_latent_solve_under_shard_map():
    """The whole-solve Pallas kernels (ops/latent_fused.py) compose with DP
    via jax.shard_map: each shard runs the kernel on its batch slice with a
    shard-local noise key (fold_in on axis_index — SURVEY §2.8's
    'shard-local by construction' commitment). Interpret mode on the virtual
    CPU mesh; the driver's real-mesh path is dryrun_multichip."""
    import torchsde_tpu.ops.latent_fused as LF
    from torchsde_tpu.models.latent_sde import LatentSDE
    from jax.sharding import Mesh, PartitionSpec as P

    old = LF._INTERPRET
    LF._INTERPRET = True
    try:
        key = jax.random.PRNGKey(0)
        B, T = 16, 6
        model = LatentSDE(key, 3, 4, 16, 32)
        ts = np.linspace(0.0, 1.0, T)
        xs = jax.random.normal(jax.random.fold_in(key, 1), (T, B, 3),
                               jnp.float32)
        m = model.contextualize(ts, model.encode(xs, jnp.asarray(ts,
                                                                 jnp.float32)))
        z0 = jax.random.normal(jax.random.fold_in(key, 2), (B, 4),
                               jnp.float32)
        nkey = jax.random.PRNGKey(7)
        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))

        def solve_shard(ctx, z0s):
            shard_key = jax.random.fold_in(nkey, jax.lax.axis_index("data"))
            mm = m.evolve(_ctx=ctx)
            return LF.latent_logqp_solve_fused(mm, z0s, ts, shard_key,
                                               1.0 / 32)

        sharded = jax.shard_map(solve_shard, mesh=mesh,
                                in_specs=(P(None, "data", None),
                                          P("data", None)),
                                out_specs=(P(None, "data", None),
                                           P(None, "data")),
                                check_vma=False)
        zs, kl = jax.jit(sharded)(m._ctx, z0)
        assert zs.shape == (T, B, 4) and kl.shape == (T - 1, B)
        assert bool(jnp.all(jnp.isfinite(zs)))
        # shard-local keys: different shards see different noise, so their
        # trajectories from identical initial states must differ
        z0_same = jnp.tile(z0[:2], (8, 1))
        zs2, _ = jax.jit(sharded)(jnp.tile(m._ctx[:, :2], (1, 8, 1)), z0_same)
        assert not bool(jnp.allclose(zs2[-1, 0], zs2[-1, 2]))
    finally:
        LF._INTERPRET = old


def test_tp_fallback_warns():
    """VERDICT r1 weak item 6: replicating a non-divisible dim must warn, not
    silently leave a "TP" model fully replicated."""
    import warnings as _w
    from torchsde_tpu.models.layers import MLP
    mesh = pmesh.make_mesh_2d(n_model=2, devices=jax.devices()[:4])
    key = jax.random.PRNGKey(0)
    mlp = MLP(key, sizes=[4, 5, 3])  # hidden width 5 % 2 != 0 -> fallback
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        pmesh.shard_mlp_tp(mlp, mesh)
    assert any("fallback" in str(r.message) for r in rec)

    # divisible widths shard silently
    mlp2 = MLP(key, sizes=[4, 8, 4])
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        pmesh.shard_mlp_tp(mlp2, mesh)
    assert not any("fallback" in str(r.message) for r in rec)


@pytest.mark.heavy
def test_stacked_replicas_match_independent_training():
    """parallel.replicas: K models trained in ONE vmapped program must equal
    the same K models trained one-by-one (exact interleaving of independent
    chains — the capability behind the multi-solve throughput harness)."""
    from torchsde_tpu.models.latent_sde import LatentSDE, latent_sde_loss
    from torchsde_tpu.parallel import replicas as R

    key = jax.random.PRNGKey(3)
    T, B, DATA = 4, 8, 3
    ts = jnp.linspace(0.0, 1.0, T)
    xs = jax.random.normal(jax.random.fold_in(key, 1), (T, B, DATA))

    def make(k):
        return LatentSDE(k, DATA, 2, 8, 16)

    def loss_fn(model, batch, k):
        loss, _ = latent_sde_loss(model, batch, ts, k, dt=0.25)
        return loss

    K = 3
    mkeys = jax.random.split(jax.random.fold_in(key, 2), K)
    skeys = jax.random.split(jax.random.fold_in(key, 4), K)
    batches = jnp.broadcast_to(xs, (K,) + xs.shape)

    models = R.stack_replicas(make, mkeys)
    step = R.replica_train_step(loss_fn, lr=1e-6)
    models2, losses = step(models, batches, skeys)
    models3, losses2 = step(models2, batches, skeys)

    # one-by-one reference
    for i in range(K):
        m = make(mkeys[i])
        l1, g = jax.value_and_grad(loss_fn)(m, xs, skeys[i])
        m = jax.tree_util.tree_map(lambda p, gg: p - 1e-6 * gg, m, g)
        np.testing.assert_allclose(float(losses[i]), float(l1), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(
                R.unstack_replica(models2, i)), jax.tree_util.tree_leaves(m)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-6)
    assert bool(jnp.all(jnp.isfinite(losses2)))


@pytest.mark.heavy
def test_replica_dp_2d_mesh():
    """Replica x DP composition (VERDICT r2 item 8): K replicas on one mesh
    axis, each data-parallel over the other axis on its batch dimension, in
    ONE program — and it must equal per-replica single-device training (the
    replica axis is communication-free; the data axis psums per-replica
    gradients only)."""
    from torchsde_tpu.models.latent_sde import LatentSDE, latent_sde_loss
    from torchsde_tpu.parallel import replicas as R
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    key = jax.random.PRNGKey(11)
    T, B, DATA, K = 4, 8, 3, 4
    ts = jnp.linspace(0.0, 1.0, T)

    def make(k):
        return LatentSDE(k, DATA, 2, 8, 16)

    def loss_fn(model, batch, k):
        loss, _ = latent_sde_loss(model, batch, ts, k, dt=0.25)
        return loss

    mkeys = jax.random.split(jax.random.fold_in(key, 2), K)
    skeys = jax.random.split(jax.random.fold_in(key, 4), K)
    batches = jax.random.normal(jax.random.fold_in(key, 1), (K, T, B, DATA))

    models = R.stack_replicas(make, mkeys)
    step = R.replica_train_step(loss_fn, lr=1e-6)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(K, 2),
                ("replica", "data"))
    models_sh = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("replica"))),
        models)
    batches_sh = jax.device_put(
        batches, NamedSharding(mesh, P("replica", None, "data")))
    skeys_sh = jax.device_put(skeys, NamedSharding(mesh, P("replica")))
    models2, losses_sh = step(models_sh, batches_sh, skeys_sh)

    # per-replica single-device reference
    for i in range(K):
        m = make(mkeys[i])
        l1, g = jax.value_and_grad(loss_fn)(m, batches[i], skeys[i])
        np.testing.assert_allclose(float(losses_sh[i]), float(l1), rtol=1e-5)
        m = jax.tree_util.tree_map(lambda p, gg: p - 1e-6 * gg, m, g)
        for a, b in zip(jax.tree_util.tree_leaves(
                R.unstack_replica(models2, i)), jax.tree_util.tree_leaves(m)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-6)
    # The replica axis stays partitioned through the update.
    assert not models2.projector.w.sharding.is_fully_replicated


@pytest.mark.heavy
def test_two_slice_mesh_dp_across_dcn():
    """Simulated 2-slice pod (2 slices x 4 chips): following make_mesh_2d's
    DCN guidance, the data axis spans slices (gradient psums tolerate DCN
    latency) and the model axis stays within a slice (per-matmul TP
    collectives need ICI). Checks the device layout the helper produces
    matches that guidance, then runs a DPxTP training step on it."""
    from torchsde_tpu.models.latent_sde import LatentSDE, latent_sde_loss

    devices = jax.devices()[:8]
    slice0, slice1 = devices[:4], devices[4:]
    m2 = pmesh.make_mesh_2d(n_model=4, devices=devices)
    assert dict(m2.shape) == {"data": 2, "model": 4}
    # data index 0 -> slice 0, data index 1 -> slice 1: each model row
    # (fast TP collectives) lives entirely within one simulated slice.
    assert list(m2.devices[0]) == slice0 and list(m2.devices[1]) == slice1

    key = jax.random.PRNGKey(0)
    T, B = 4, 16
    ts = jnp.linspace(0.0, 0.3, T)
    xs = jax.random.normal(jax.random.fold_in(key, 1), (T, B, 3), jnp.float32)
    model = LatentSDE(jax.random.fold_in(key, 2), data_size=3, latent_size=4,
                      context_size=8, hidden_size=16)

    def loss_fn(model, xs, key):
        loss, _ = latent_sde_loss(model, xs, ts, key, dt=0.1)
        return loss

    base = float(jax.jit(loss_fn)(model, xs, key))
    xs_sh = pmesh.shard_batch(xs, m2, batch_axis=1)
    model_sh = pmesh.shard_latent_sde_tp(model, m2)
    loss = float(jax.jit(loss_fn)(model_sh, xs_sh, key))
    np.testing.assert_allclose(loss, base, rtol=1e-4)


@pytest.mark.heavy
def test_replicas_sharded_over_mesh():
    """Replica-axis parallelism: the stacked-replica training step with the
    K axis sharded over the 8-device mesh must match the single-device
    vmapped run (independent chains — no cross-replica communication, so
    GSPMD runs each device's replicas locally). This is the compile+run
    validation behind 'multi-chip scales the aggregate multi-replica
    throughput' (BENCH_NOTES §8)."""
    from torchsde_tpu.models.latent_sde import LatentSDE, latent_sde_loss
    from torchsde_tpu.parallel import replicas as R

    key = jax.random.PRNGKey(9)
    T, B, DATA, K = 4, 8, 3, 8
    ts = jnp.linspace(0.0, 1.0, T)
    xs = jax.random.normal(jax.random.fold_in(key, 1), (T, B, DATA))

    def make(k):
        return LatentSDE(k, DATA, 2, 8, 16)

    def loss_fn(model, batch, k):
        loss, _ = latent_sde_loss(model, batch, ts, k, dt=0.25)
        return loss

    mkeys = jax.random.split(jax.random.fold_in(key, 2), K)
    skeys = jax.random.split(jax.random.fold_in(key, 4), K)
    batches = jnp.broadcast_to(xs, (K,) + xs.shape)

    models = R.stack_replicas(make, mkeys)
    step = R.replica_train_step(loss_fn, lr=1e-6)
    _, losses_single = step(models, batches, skeys)

    m = pmesh.make_mesh()
    models_sh = pmesh.shard_batch(models, m)       # replica axis over devices
    batches_sh = pmesh.shard_batch(batches, m)
    skeys_sh = pmesh.shard_batch(skeys, m)
    models2, losses_sh = step(models_sh, batches_sh, skeys_sh)

    np.testing.assert_allclose(np.asarray(losses_sh),
                               np.asarray(losses_single), rtol=1e-6)
    # The updated models keep the replica axis partitioned (no silent
    # all-gather of independent replicas).
    w = models2.projector.w
    if not w.is_fully_addressable or len(jax.devices()) >= 8:
        assert not w.sharding.is_fully_replicated
