"""Checkpoint/resume helpers for Module pytrees.

The reference ships no library-level checkpointing (examples use
``torch.save``, reference latent_sde.py:332-339); the solver-level hook is
``extra_solver_state`` (supported by sdeint/sdeint_adjoint here too, so a
solve can be resumed or reversed exactly). These helpers give the examples an
orbax-backed analogue of ``torch.save``/``load`` for model/optimizer pytrees.
"""

import os

import jax
import numpy as np


def save_pytree(path, tree):
    """Save the array leaves of a pytree (orbax if available, else npz)."""
    path = os.path.abspath(path)
    try:
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]
        ckptr.save(path, leaves, force=True)
        ckptr.wait_until_finished()
        return path
    except Exception:
        leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]
        np.savez(path if path.endswith(".npz") else path + ".npz",
                 *leaves)
        return path if path.endswith(".npz") else path + ".npz"


def load_pytree(path, like):
    """Restore a pytree saved with save_pytree; ``like`` supplies structure."""
    treedef = jax.tree_util.tree_structure(like)
    like_leaves = jax.tree_util.tree_leaves(like)
    if os.path.isdir(path):
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        leaves = ckptr.restore(path)
    else:
        npz = np.load(path if path.endswith(".npz") else path + ".npz")
        leaves = [npz[k] for k in npz.files]
    leaves = [jax.numpy.asarray(l, getattr(ref, "dtype", None))
              for l, ref in zip(leaves, like_leaves)]
    return jax.tree_util.tree_unflatten(treedef, leaves)
