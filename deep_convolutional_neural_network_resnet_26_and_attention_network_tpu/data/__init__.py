"""Data layer: whole-slide IO, tiling + tissue filtering, on-device tile
transforms, bag datasets, and prefetching loaders."""

from . import accessors, dataset, loader, roibuilder, slide_io, tissue, transforms  # noqa: F401
