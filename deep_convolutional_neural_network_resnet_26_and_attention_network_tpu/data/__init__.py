"""Data layer: whole-slide IO, tiling + tissue filtering, on-device tile
transforms, bag datasets, and prefetching loaders."""

from . import (  # noqa: F401
    accessors,
    gan_dataset,
    loader,
    roibuilder,
    slide_io,
    stain,
    tissue,
    transforms,
)

# dataset (scikit-learn) and cell_datasets (matplotlib via utils.helpers)
# import lazily so the base install needs only jax/numpy/optax
