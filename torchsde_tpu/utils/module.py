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

    def evolve(self, **changes):
        """Functional update: returns a copy with the given attributes replaced
        and the cached dynamic/static partition reset (so newly-added array
        attributes become pytree leaves)."""
        mod = object.__new__(type(self))
        d = dict(vars(self))
        d.pop("_dyn_names_", None)
        d.update(changes)
        for k, v in d.items():
            object.__setattr__(mod, k, v)
        return mod

    def __repr__(self):
        names = sorted(n for n in vars(self) if n != "_dyn_names_")
        return f"{type(self).__name__}({', '.join(names)})"


def _flatten_module(mod):
    """Partition attributes into dynamic (pytree children) and static (aux).

    The partition must be *structure-stable*: JAX transforms routinely
    unflatten a module with placeholder leaves (tracers, sentinels) and
    flatten it again, and the roundtrip must reproduce the same treedef. So
    the dynamic-name set is computed from values only on the first flatten of
    a user-constructed module, and thereafter carried through unflatten via
    the hidden ``_dyn_names_`` attribute.
    """
    d = vars(mod)
    dyn_names = d.get("_dyn_names_")
    if dyn_names is None:
        dyn_names = tuple(sorted(n for n in d if _contains_dynamic(d[n])))
    dyn_vals = tuple(d[n] for n in dyn_names)
    static_items = tuple((n, d[n]) for n in sorted(d)
                         if n not in dyn_names and n != "_dyn_names_")
    aux = (dyn_names, _Static(static_items))
    return dyn_vals, aux


def _make_unflatten(cls):
    def unflatten(aux, children):
        dyn_names, static = aux
        mod = object.__new__(cls)
        object.__setattr__(mod, "_dyn_names_", dyn_names)
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
