"""Minimal stand-in for the `trampoline` PyPI package (a dependency of the
reference implementation, not installed in this image). Implements the
generator-trampoline protocol the reference's BrownianInterval uses
(brownian_interval.py:183, :275-315): generators yield sub-generators to
evaluate, raise TailCall(gen) to tail-call, and return results via
StopIteration. Used only by bench.py to run the reference as a baseline.
"""

import sys
import types


class TailCall(Exception):
    def __init__(self, gen):
        self.gen = gen


def trampoline(gen):
    stack = [gen]
    result = None
    while stack:
        top = stack[-1]
        try:
            yielded = top.send(result)
        except StopIteration as e:
            stack.pop()
            result = e.value
            continue
        except TailCall as tc:
            stack.pop()
            stack.append(tc.gen)
            result = None
            continue
        stack.append(yielded)
        result = None
    return result


_mod = types.ModuleType("trampoline")
_mod.TailCall = TailCall
_mod.trampoline = _mod.trampoline = trampoline
sys.modules.setdefault("trampoline", _mod)
