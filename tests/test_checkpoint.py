"""Checkpoint/resume coverage (SURVEY §5.4).

The reference's library-level resume hook is ``extra_solver_state`` in/out
(reference sdeint.py:41,73-78,108-110); its examples checkpoint with
``torch.save`` (latent_sde.py:332-339). Counterparts here:

* ``utils.checkpoint.save_pytree``/``load_pytree`` round-trip Module pytrees
  (orbax when available, npz otherwise);
* a solve split at an output time and resumed from ``(y_mid, extra)`` with
  the same BrownianInterval reproduces the unbroken solve bitwise (the
  resumed step grid's intervals coincide with the full solve's);
* training interrupted by a save/load round-trip continues to the same
  parameters as an uninterrupted run.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchsde_tpu as tsde
from torchsde_tpu.utils import checkpoint as ckpt

import problems

b, d = 8, 3
DTYPE = jnp.float64


def test_save_load_roundtrip(tmp_path):
    sde = problems.NeuralDiagonal(sde_type="stratonovich", d=d)
    path = os.path.join(str(tmp_path), "model")
    saved = ckpt.save_pytree(path, sde)
    like = problems.NeuralDiagonal(sde_type="stratonovich", d=d)  # fresh init
    restored = ckpt.load_pytree(saved, like)
    assert (jax.tree_util.tree_structure(restored)
            == jax.tree_util.tree_structure(sde))
    for x, y in zip(jax.tree_util.tree_leaves(restored),
                    jax.tree_util.tree_leaves(sde)):
        assert x.dtype == y.dtype
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("method,sde_type", [("euler", "ito"),
                                             ("reversible_heun",
                                              "stratonovich")])
def test_solve_split_resume_bitwise(method, sde_type):
    """Solving [0, 0.4] in one call equals solving to 0.2, capturing
    ``(y, extra_solver_state)``, and resuming — with the same bm, the resumed
    grid's intervals are exactly the full grid's, so noise and states match
    bitwise. reversible_heun exercises a real (f, g, z) extra state."""
    sde = problems.ExDiagonal(d=d, sde_type=sde_type)
    bm = tsde.BrownianInterval(0.0, 0.4, (b, d), dtype=DTYPE, entropy=11)
    y0 = jnp.full((b, d), 0.1, DTYPE)
    ts_full = [0.0, 0.1, 0.2, 0.3, 0.4]
    dt = 0.025

    full = tsde.sdeint(sde, y0, ts_full, bm=bm, method=method, dt=dt)

    first, extra_mid = tsde.sdeint(sde, y0, [0.0, 0.1, 0.2], bm=bm,
                                   method=method, dt=dt, extra=True)
    second = tsde.sdeint(sde, first[-1], [0.2, 0.3, 0.4], bm=bm,
                         method=method, dt=dt,
                         extra_solver_state=extra_mid)
    np.testing.assert_array_equal(np.asarray(first), np.asarray(full[:3]))
    np.testing.assert_array_equal(np.asarray(second[1:]), np.asarray(full[3:]))


def test_training_checkpoint_resume(tmp_path):
    """Interrupting training with a save/load round-trip yields the same
    final parameters as an uninterrupted run (same key-derived noise per
    step, SGD updates)."""
    lr = 1e-2
    y0 = jnp.full((b, d), 0.1, DTYPE)
    ts = [0.0, 0.2, 0.4]

    def loss(sde_, key_):
        ys = tsde.sdeint(sde_, y0, ts, method="midpoint", dt=0.05, key=key_)
        return jnp.sum(ys ** 2)

    @jax.jit
    def step(sde_, key_):
        g = jax.grad(loss)(sde_, key_)
        return jax.tree_util.tree_map(lambda p, gp: p - lr * gp, sde_, g)

    def train(sde_, start, stop):
        for i in range(start, stop):
            sde_ = step(sde_, jax.random.fold_in(jax.random.PRNGKey(0), i))
        return sde_

    base = problems.NeuralDiagonal(sde_type="stratonovich", d=d)
    uninterrupted = train(base, 0, 4)

    half = train(base, 0, 2)
    path = ckpt.save_pytree(os.path.join(str(tmp_path), "mid"), half)
    restored = ckpt.load_pytree(
        path, problems.NeuralDiagonal(sde_type="stratonovich", d=d))
    resumed = train(restored, 2, 4)

    for x, y in zip(jax.tree_util.tree_leaves(resumed),
                    jax.tree_util.tree_leaves(uninterrupted)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
