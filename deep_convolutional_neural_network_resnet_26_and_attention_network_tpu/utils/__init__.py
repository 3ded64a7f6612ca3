"""Driver utilities: stats persistence, weight/activation introspection,
heatmap writers, and the metric plot suite."""

from . import helpers, plots  # noqa: F401
