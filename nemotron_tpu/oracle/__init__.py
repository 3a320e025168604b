"""Numpy test oracle.

Plays the role of the reference's naive pure-C++ model
(reference src/reference/*.cpp): a slow, obviously-correct implementation of
every module, used ONLY by tests as the differential ground truth for the
JAX/TPU implementation. It consumes raw weight dicts in the reference's
PyTorch-order naming (docs/TENSOR_SHAPES.md), a deliberately separate code
path from nemotron_tpu.params.
"""

from .model import OracleModel, OracleStream  # noqa: F401
from .preprocessor import OraclePreprocessor  # noqa: F401
