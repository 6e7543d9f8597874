"""Abstract Brownian motion interface.

API parity with /root/reference/torchsde/_brownian/brownian_base.py:18-50:
``bm(ta, tb, return_U=..., return_A=...)`` returns the increment W(tb)-W(ta)
(optionally with space-time Levy area U and full Levy area A), and exposes
shape/dtype/levy_area_approximation properties.
"""

import abc

from ..utils.module import Module


class BaseBrownian(Module, metaclass=abc.ABCMeta):

    @abc.abstractmethod
    def __call__(self, ta, tb=None, return_U=False, return_A=False):
        raise NotImplementedError

    @property
    @abc.abstractmethod
    def dtype(self):
        raise NotImplementedError

    @property
    @abc.abstractmethod
    def shape(self):
        raise NotImplementedError

    @property
    @abc.abstractmethod
    def levy_area_approximation(self):
        raise NotImplementedError

    def size(self):
        return self.shape
