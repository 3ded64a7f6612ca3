"""Core numerical ops: initializers, NN primitives, losses, fused kernels."""

from . import init  # noqa: F401
from . import loss  # noqa: F401
from . import nn  # noqa: F401
from . import pallas_pool  # noqa: F401
