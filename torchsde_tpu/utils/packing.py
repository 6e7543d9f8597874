"""Packed training state: run a pytree train step through ONE flat buffer.

Every jitted call pays host-side cost per pytree leaf (flatten, argument
handles, output futures) — on a tunneled/async TPU backend this is ~25 us per
leaf per step, which for a ~35-leaf model dwarfs the device time of a
latency-bound SDE train step (BENCH_NOTES §1a). The reference has no
analogue (torch mutates parameters in place); the TPU-native idiom is to
keep the training state device-resident as a single packed vector and
unravel it *inside* the jitted step, so each iteration moves exactly two
host handles (packed state in, packed state out).

Usage::

    step = pack_train_step(train_step_fn, model)   # (model, *args) -> (model, aux)
    packed = step.pack(model)
    for i in range(n):
        packed, aux = step(packed, jnp.int32(i))
    model = step.unpack(packed)
"""

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree


class PackedStep:
    """Wraps ``step_fn(state, *args) -> (state, aux)`` so the state crosses
    the host/device boundary as one flat vector. The returned callable is
    jitted; ``pack``/``unpack`` convert between the pytree and the buffer."""

    def __init__(self, step_fn, example_state, jit=True):
        flat0, unravel = ravel_pytree(example_state)
        self._unravel = unravel
        self._n = flat0.shape[0]
        self._dtype = flat0.dtype

        def packed_fn(flat, *args):
            state = unravel(flat)
            state, aux = step_fn(state, *args)
            return ravel_pytree(state)[0], aux

        self._fn = jax.jit(packed_fn) if jit else packed_fn

    def pack(self, state):
        flat, _ = ravel_pytree(state)
        if flat.shape[0] != self._n:
            raise ValueError(
                f"state packs to {flat.shape[0]} elements, expected {self._n} "
                f"(structure must match the example_state)")
        return flat

    def unpack(self, flat):
        return self._unravel(flat)

    def __call__(self, flat, *args):
        return self._fn(flat, *args)

    def multi(self, k):
        """A jitted ``(flat, base) -> (flat, auxs)`` that runs ``k``
        sequential steps per dispatch via ``lax.scan``, passing
        ``base*k + j`` as the step's argument (j = 0..k-1). Amortises
        per-dispatch host/tunnel overhead when single steps are only a few
        ms (BENCH_NOTES §5)."""
        fn = self._fn

        def multi_fn(flat, base):
            def body(p, j):
                return fn(p, base * k + j)
            return jax.lax.scan(body, flat,
                                jnp.arange(k, dtype=jnp.int32))

        return jax.jit(multi_fn)


def pack_train_step(step_fn, example_state, jit=True):
    """Build a :class:`PackedStep` for ``step_fn(state, *args) -> (state, aux)``."""
    return PackedStep(step_fn, example_state, jit=jit)
