"""Type aliases (parity with /root/reference/torchsde/types.py)."""

from typing import Any, Callable, Dict, Optional, Sequence, Tuple, Union

import jax
import numpy as np

Array = jax.Array
Tensor = jax.Array  # reference-compatible name
Scalar = Union[float, int, jax.Array]
Vector = Union[Sequence[float], np.ndarray, jax.Array]
Tensors = Sequence[jax.Array]
TensorOrTensors = Union[jax.Array, Sequence[jax.Array]]
Module = Any
PyTree = Any

__all__ = ["Any", "Array", "Callable", "Dict", "Module", "Optional", "PyTree",
           "Scalar", "Sequence", "Tensor", "TensorOrTensors", "Tensors",
           "Tuple", "Union", "Vector"]
