"""Placeholder: stochastic adjoint (built in a later milestone this round)."""


def sdeint_adjoint(*args, **kwargs):
    raise NotImplementedError("sdeint_adjoint is implemented in milestone M4.")
