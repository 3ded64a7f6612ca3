"""Data layer: whole-slide IO, tiling + tissue filtering, on-device tile
transforms, bag datasets, and prefetching loaders."""

from . import (  # noqa: F401
    accessors,
    dataset,
    gan_dataset,
    loader,
    roibuilder,
    slide_io,
    stain,
    tissue,
    transforms,
)

# cell_datasets imports lazily (it pulls in matplotlib via utils.helpers)
