"""Batch-axis data parallelism over a device mesh.

The reference has no distributed layer (SURVEY.md §2.8): its only parallel
axis is the batch dimension, which is first-class in the API contract
(``y0`` is ``(batch, d)``, reference sdeint.py:138-139). Here that axis shards
over ICI via ``jax.sharding``:

* the solver core is communication-free (pure per-shard scan/vmap), so
  parallelism lives entirely in the partitioner;
* noise is shard-local by construction: JAX's partitionable threefry makes
  ``jax.random.normal`` on a sharded shape generate each shard's slice
  locally with no cross-chip traffic;
* collectives (psum of gradients) appear only where training loops reduce —
  inserted automatically by XLA from the sharding annotations.

Multi-chip validation runs on a virtual CPU mesh
(``--xla_force_host_platform_device_count``); see ``__graft_entry__.py``.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name="data"):
    """A 1-D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh, batch_axis=0, axis_name="data"):
    """NamedSharding that splits ``batch_axis`` across the mesh."""
    spec = [None] * batch_axis + [axis_name]
    return NamedSharding(mesh, P(*spec))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh, batch_axis=0, axis_name="data"):
    """Place every leaf with the batch dimension sharded across the mesh."""
    sh = batch_sharding(mesh, batch_axis, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def replicate(tree, mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def data_parallel_train_step(loss_fn, optimizer_update):
    """Build a jitted DP training step.

    ``loss_fn(model, batch, key) -> (loss, aux)``;
    ``optimizer_update(grads, opt_state, model) -> (updates, opt_state)``.
    With the model replicated and the batch sharded, XLA turns the gradient
    reduction into a psum over ICI — no explicit collectives in user code.
    """

    @jax.jit
    def step(model, opt_state, batch, key):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            model, batch, key)
        updates, opt_state = optimizer_update(grads, opt_state, model)
        model = jax.tree_util.tree_map(
            lambda p, u: p + u if u is not None else p, model, updates)
        return model, opt_state, loss, aux

    return step
