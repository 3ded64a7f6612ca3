"""On-device batched tile transforms.

The reference augments tiles one-by-one on CPU inside DataLoader worker
processes with torchvision (reference: RoiBuilder.py:193-210):

  train: ToPILImage -> Pad(100) -> RandomCrop(roi) -> Resize(res)
         -> RandomHFlip(.5) -> RandomVFlip(.5) -> ToTensor -> Normalize(.5,.5)
  eval:  ToPILImage -> Resize(res) -> ToTensor -> Normalize(.5,.5)

Here the whole bag transforms as one jit-compiled batched program on the
accelerator: uint8 tiles stream to the device, the pad/crop/flip run as
vectorized gathers, the 1200->res bilinear resize (the FLOPs-heavy part)
runs anti-aliased on the VPU, and the normalized float tensor lands already
device-resident for the extractor — no per-tile Python, no host round trip.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

MEAN = 0.5
STD = 0.5


def _normalize(x_f32_01):
    return (x_f32_01 - MEAN) / STD


def _resize_bilinear(x, resolution):
    """[N, H, W, C] float -> [N, res, res, C], anti-aliased like PIL."""
    n, h, w, c = x.shape
    if h == resolution and w == resolution:
        # identity resize: the separable bilinear contraction is NOT free
        # at equal size (two [res,res] weight contractions per image), and
        # prebuilt caches already at network resolution hit this every tile
        return x
    return jax.image.resize(x, (n, resolution, resolution, c), "bilinear",
                            antialias=True)


@partial(jax.jit, static_argnames=("resolution",))
def resize_u8(tiles_u8, *, resolution: int):
    """[N, H, W, 3] uint8 -> [N, res, res, 3] uint8, same anti-aliased
    bilinear as the eval transform (used to prebuild GAN stores)."""
    x = tiles_u8.astype(jnp.float32)
    x = _resize_bilinear(x, resolution)
    return jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint8)


@jax.jit
def normalize_u8(tiles_u8):
    """[N, H, W, 3] uint8 -> float32 in [-1, 1] (no resize)."""
    return _normalize(tiles_u8.astype(jnp.float32) / 255.0)


@partial(jax.jit, static_argnames=("resolution", "pad", "roi_size"))
def train_transform(tiles_u8, rng, *, roi_size: int, resolution: int,
                    pad: int = 100):
    """[N, roi, roi, 3] uint8 -> [N, res, res, 3] float32 in [-1, 1]."""
    n = tiles_u8.shape[0]
    k_crop, k_h, k_v = jax.random.split(rng, 3)

    padded = jnp.pad(tiles_u8, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    offsets = jax.random.randint(k_crop, (n, 2), 0, 2 * pad + 1)

    def crop_one(img, off):
        return jax.lax.dynamic_slice(
            img, (off[0], off[1], 0), (roi_size, roi_size, 3))

    cropped = jax.vmap(crop_one)(padded, offsets)

    flip_h = jax.random.bernoulli(k_h, 0.5, (n, 1, 1, 1))
    flip_v = jax.random.bernoulli(k_v, 0.5, (n, 1, 1, 1))
    cropped = jnp.where(flip_h, cropped[:, :, ::-1, :], cropped)
    cropped = jnp.where(flip_v, cropped[:, ::-1, :, :], cropped)

    x = cropped.astype(jnp.float32) / 255.0
    return _normalize(_resize_bilinear(x, resolution))


@partial(jax.jit, static_argnames=("resolution",))
def eval_transform(tiles_u8, *, resolution: int):
    """[N, H, W, 3] uint8 -> [N, res, res, 3] float32 in [-1, 1]."""
    x = tiles_u8.astype(jnp.float32) / 255.0
    return _normalize(_resize_bilinear(x, resolution))


def apply_chunked(fn, tiles_u8: np.ndarray, *, chunk: int = 64, rng=None,
                  **kwargs) -> jax.Array:
    """Run a jitted transform over a large stack in fixed-size chunks.

    Fixed chunk shapes keep one compiled program; the ragged tail is padded
    to ``chunk`` and trimmed after. Keeps peak device memory bounded at
    chunk x roi^2 while the copies/compute pipeline across chunks.
    """
    n = tiles_u8.shape[0]
    if n == 0:
        raise ValueError("empty tile stack")
    if n < chunk:
        # a stack smaller than the chunk must not pad (and transfer) up to
        # it — clamp to the power-of-two bucket covering n, so program
        # shapes stay on a small cached ladder
        from .loader import bucket_for

        chunk = min(chunk, bucket_for(n, buckets=(8, 16, 32, 64)))
    outs = []
    for start in range(0, n, chunk):
        part = tiles_u8[start:start + chunk]
        valid = part.shape[0]
        if valid < chunk:
            padding = [(0, chunk - valid)] + [(0, 0)] * (part.ndim - 1)
            part = np.pad(part, padding)
        if rng is not None:
            rng, sub = jax.random.split(rng)
            out = fn(jnp.asarray(part), sub, **kwargs)
        else:
            out = fn(jnp.asarray(part), **kwargs)
        outs.append(out[:valid])
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
