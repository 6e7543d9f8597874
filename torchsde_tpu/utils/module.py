"""A minimal pytree module system.

The reference represents SDEs as ``torch.nn.Module`` subclasses whose ``f``/``g``
methods close over learnable parameters (/root/reference/torchsde/_core/base_sde.py:25).
In JAX, anything passed through ``jit``/``grad``/``scan`` must be a pytree, so we
provide ``Module``: a base class whose instances are registered as pytrees.

Attribute partitioning rule: an instance attribute is a *dynamic* (traced) leaf
subtree if it contains any array-like leaf (jax/numpy array, or a ``Module``);
everything else (strings, ints, bools, callables, ...) is static metadata baked
into the treedef. This gives the equinox-style "model as pytree" idiom with zero
dependencies: ``jax.grad`` differentiates straight through module parameters and
``sdeint_adjoint`` can collect them with ``.parameters()``.
"""

import jax
import jax.numpy as jnp
import numpy as np


def _is_array(x):
    return isinstance(x, (jax.Array, np.ndarray)) or hasattr(x, "shape") and hasattr(x, "dtype")


def _contains_dynamic(value):
    if isinstance(value, Module):
        return True
    leaves = jax.tree_util.tree_leaves(value)
    return any(isinstance(leaf, (jax.Array, np.ndarray, Module)) or _is_array(leaf) for leaf in leaves)


class _Static:
    """Hashable wrapper for the static attribute dict (goes into the treedef)."""

    __slots__ = ("items",)

    def __init__(self, items):
        self.items = items  # tuple of (name, value)

    def __eq__(self, other):
        return type(other) is _Static and self.items == other.items

    def __hash__(self):
        try:
            return hash(self.items)
        except TypeError:
            return hash(tuple(name for name, _ in self.items))

    def __repr__(self):
        return f"_Static({self.items!r})"


class Module:
    """Pytree base class. Subclasses are automatically registered."""

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        jax.tree_util.register_pytree_node(cls, _flatten_module, _make_unflatten(cls))

    # -- pytree plumbing ----------------------------------------------------

    def parameters(self):
        """All array leaves of this module (analogue of nn.Module.parameters())."""
        return [leaf for leaf in jax.tree_util.tree_leaves(self)
                if isinstance(leaf, (jax.Array, np.ndarray))]

    def __repr__(self):
        names = sorted(vars(self))
        return f"{type(self).__name__}({', '.join(names)})"


def _flatten_module(mod):
    dyn_names, dyn_vals, static_items = [], [], []
    for name in sorted(vars(mod)):
        value = vars(mod)[name]
        if _contains_dynamic(value):
            dyn_names.append(name)
            dyn_vals.append(value)
        else:
            static_items.append((name, value))
    aux = (tuple(dyn_names), _Static(tuple(static_items)))
    return tuple(dyn_vals), aux


def _make_unflatten(cls):
    def unflatten(aux, children):
        dyn_names, static = aux
        mod = object.__new__(cls)
        for name, value in zip(dyn_names, children):
            object.__setattr__(mod, name, value)
        for name, value in static.items:
            object.__setattr__(mod, name, value)
        return mod

    return unflatten


def tree_parameters(tree):
    """Array leaves of an arbitrary pytree."""
    return [leaf for leaf in jax.tree_util.tree_leaves(tree)
            if isinstance(leaf, (jax.Array, np.ndarray))]
