"""Device-mesh construction for bag-of-tiles workloads.

The reference's only parallelism is single-host ``nn.DataParallel`` over 4
GPUs, scattering the tile axis of each bag through the ResNet extractor
(reference: gbm/model.py:132-135). The TPU-native equivalent is a 2D
``jax.sharding.Mesh``:

  * axis "slides" — data parallelism over bags (slides) in a batch,
  * axis "tiles"  — the DataParallel replacement: tiles of one bag spread
    across chips; all tile-axis reductions (attention L1 normalizer, pooled
    A^T B, per-bag batch-norm stats) become XLA collectives over ICI,
    inserted automatically by GSPMD from the sharding annotations.

Because MIL attention pooling is a linear reduction over tiles, tile-axis
sharding is exact — no ring/blockwise approximation is needed (SURVEY.md §5).
"""

import math

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SLIDES_AXIS = "slides"
TILES_AXIS = "tiles"


def make_mesh(n_devices: int | None = None, *, slides: int | None = None,
              devices=None) -> Mesh:
    """Build a (slides, tiles) mesh over the first n_devices devices.

    If ``slides`` is not given, picks the largest power-of-two slide axis
    <= sqrt(n) so the tile axis (the hot reduction) gets at least half the
    chips.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(f"requested a {n_devices}-device mesh but only "
                         f"{len(devices)} devices are available")
    devices = devices[:n_devices]
    if slides is None:
        slides = 1
        while slides * 2 <= int(math.isqrt(n_devices)) and n_devices % (slides * 2) == 0:
            slides *= 2
        if n_devices % slides != 0:
            slides = 1
    tiles = n_devices // slides
    grid = np.asarray(devices).reshape(slides, tiles)
    return Mesh(grid, (SLIDES_AXIS, TILES_AXIS))


def bag_batch_sharding(mesh: Mesh) -> NamedSharding:
    """[B, T, H, W, C] batches: slides over 'slides', tiles over 'tiles'."""
    return NamedSharding(mesh, P(SLIDES_AXIS, TILES_AXIS))


def mask_sharding(mesh: Mesh) -> NamedSharding:
    """[B, T] masks follow the bag sharding."""
    return NamedSharding(mesh, P(SLIDES_AXIS, TILES_AXIS))


def label_sharding(mesh: Mesh) -> NamedSharding:
    """[B] labels shard over slides only."""
    return NamedSharding(mesh, P(SLIDES_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Parameters/optimizer state are replicated (model is ~1-2M params)."""
    return NamedSharding(mesh, P())


DATA_AXIS = "data"


def data_mesh(n_devices: int | None = None, *, devices=None) -> Mesh:
    """1-axis mesh for plain batch data parallelism — the GAN trainer's
    replacement for the reference's 4-GPU ``nn.DataParallel(G/D)``
    (reference: style-based-gan-pytorch-master-512/train.py:267-274).
    Per-sample losses shard over the batch; GSPMD inserts the gradient
    all-reduce over ICI that DataParallel did with a gather."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        # validate HERE, not per caller: devices[:n] would silently hand
        # back a narrower mesh than requested, and every divisibility
        # check keyed on the requested width would then disagree with it
        raise ValueError(f"requested a {n_devices}-device mesh but only "
                         f"{len(devices)} devices are available")
    return Mesh(np.asarray(devices[:n_devices]), (DATA_AXIS,))


def data_batch_sharding(mesh: Mesh) -> NamedSharding:
    """[B, ...] batches shard over 'data' on the leading axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def style_batch_sharding(mesh: Mesh) -> NamedSharding:
    """[n_styles, B, code] latent stacks: batch is axis 1."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def tile_stream_sharding(mesh: Mesh) -> NamedSharding:
    """[T, H, W, C] single-slide tile chunks: the tile axis spreads over
    EVERY device (both mesh axes) — used by the streaming slide pipeline,
    where one slide at a time owns the whole mesh."""
    return NamedSharding(mesh, P((SLIDES_AXIS, TILES_AXIS)))
