"""Driver utilities: stats persistence, weight/activation introspection,
heatmap writers, metric plots, profiling, optional TensorBoard logging."""

from . import helpers  # noqa: F401
from . import plots  # noqa: F401
from . import profiling  # noqa: F401
from . import tb  # noqa: F401
