"""Stacked independent replicas: fill the chip past the latency plateau.

Small-state SDE training is latency-bound — wall clock scales with solver
depth, not FLOPs, so a single solve leaves the chip mostly idle
(BENCH_NOTES.md §5). The remedy is batching INDEPENDENT work per dispatch:
K replicas (independent models, e.g. an ensemble, a seed sweep, or a
hyperparameter sweep) train inside ONE jitted program via ``jax.vmap`` of
the whole train step, so the K sequential solver chains interleave on the
chip and aggregate throughput scales with K until compute saturates.

The reference has no counterpart (single-model, single-process); this layer
composes with the mesh utilities in :mod:`torchsde_tpu.parallel.mesh` —
shard the replica or batch axis over devices for replicas x DP.
"""

import jax
import jax.numpy as jnp


def stack_replicas(make_fn, keys):
    """Construct K independent models with stacked leaves.

    ``make_fn(key) -> model`` is the single-model constructor;
    ``keys`` is a ``(K, ...)`` PRNG key array (e.g. ``jax.random.split``).
    Returns one pytree whose every array leaf has a leading replica axis.
    """
    return jax.vmap(make_fn)(keys)


def unstack_replica(models, i):
    """Extract replica ``i`` from a stacked model pytree."""
    return jax.tree_util.tree_map(lambda x: x[i], models)


def replica_train_step(loss_fn, lr=None, optimizer_update=None):
    """Build a jitted K-replica training step.

    ``loss_fn(model, batch, key) -> loss`` is the SINGLE-replica loss; the
    returned ``step(models, batches, keys) -> (models, losses)`` maps it over
    the stacked replica axis of every argument in one compiled program.

    Exactly one of ``lr`` (plain SGD) or ``optimizer_update(grads, model) ->
    updates`` must be given; both apply per replica.
    """
    if (lr is None) == (optimizer_update is None):
        raise ValueError("pass exactly one of lr= or optimizer_update=")

    def one(model, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(model, batch, key)
        if optimizer_update is not None:
            updates = optimizer_update(grads, model)
        else:
            updates = jax.tree_util.tree_map(
                lambda g: -jnp.asarray(lr, g.dtype) * g, grads)
        model = jax.tree_util.tree_map(lambda p, u: p + u, model, updates)
        return model, loss

    @jax.jit
    def step(models, batches, keys):
        return jax.vmap(one)(models, batches, keys)

    return step
