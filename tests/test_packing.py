"""Packed-training-state utility: packed loop must match the pytree loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchsde_tpu.models.latent_sde import LatentSDE, latent_sde_loss
from torchsde_tpu.utils.packing import pack_train_step


@pytest.mark.heavy
def test_packed_step_matches_unpacked():
    key = jax.random.PRNGKey(0)
    ts = jnp.linspace(0.0, 1.0, 5)
    xs = jax.random.normal(jax.random.fold_in(key, 1), (5, 4, 3))
    model = LatentSDE(jax.random.fold_in(key, 2), 3, 4, 8, 16)

    def train_step(m, i):
        loss, grads = jax.value_and_grad(
            lambda mm: latent_sde_loss(mm, xs, ts, jax.random.fold_in(key, i),
                                       dt=0.25)[0])(m)
        return jax.tree_util.tree_map(lambda p, g: p - 1e-4 * g, m, grads), loss

    # reference: plain pytree loop
    m_ref = model
    losses_ref = []
    jstep = jax.jit(train_step)
    for i in range(3):
        m_ref, loss = jstep(m_ref, jnp.int32(i))
        losses_ref.append(float(loss))

    # packed loop
    step = pack_train_step(train_step, model)
    packed = step.pack(model)
    losses_p = []
    for i in range(3):
        packed, loss = step(packed, jnp.int32(i))
        losses_p.append(float(loss))
    m_p = step.unpack(packed)

    np.testing.assert_allclose(losses_p, losses_ref, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(m_p),
                    jax.tree_util.tree_leaves(m_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=1e-8)


def test_packed_step_shape_mismatch_raises():
    model = LatentSDE(jax.random.PRNGKey(0), 3, 4, 8, 16)
    other = LatentSDE(jax.random.PRNGKey(1), 3, 4, 8, 32)
    step = pack_train_step(lambda m, i: (m, jnp.float32(0)), model)
    with pytest.raises(ValueError, match="packs to"):
        step.pack(other)


def test_packed_step_multi():
    """PackedStep.multi(k): k sequential steps per dispatch, step index
    base*k + j, same trajectory as k single calls."""
    import jax
    import jax.numpy as jnp
    from torchsde_tpu.utils.packing import pack_train_step

    def stepfn(x, i):
        return x * 0.9 + 0.1 * i, jnp.sum(x)

    step = pack_train_step(stepfn, jnp.ones((4,)))
    p0 = step.pack(jnp.ones((4,)))

    p_single = p0
    singles = []
    for i in range(6):
        p_single, aux = step(p_single, jnp.int32(i))
        singles.append(aux)

    m = step.multi(3)
    p_multi, aux0 = m(p0, jnp.int32(0))
    p_multi, aux1 = m(p_multi, jnp.int32(1))
    assert jnp.allclose(p_multi, p_single)
    assert jnp.allclose(jnp.concatenate([aux0, aux1]), jnp.stack(singles))
