"""NHWC NN primitives with a bf16 compute-dtype policy.

Everything here is a pure function over explicit parameters so that it
composes with jit/vmap/shardings. Conv and matmul cast operands to the
requested ``compute_dtype`` (bfloat16 on TPU for MXU throughput); the MXU
accumulates bf16 operands in f32 internally, but OUTPUTS stay in the
compute dtype (no ``preferred_element_type`` — see the note in conv2d:
forcing f32 results doubles inter-op HBM traffic and breaks the conv VJP
under mixed bf16/f32 cotangents) and biases are cast to the output dtype
at the add. Reductions/normalizations in the model run in float32.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

LEAKY_SLOPE = 0.1  # reference uses LeakyReLU(0.1) everywhere (gbm/model.py:25)


def leaky_relu(x, negative_slope: float = LEAKY_SLOPE):
    return jnp.where(x >= 0, x, negative_slope * x)


def conv2d(x, w, b=None, *, stride=1, padding=0, compute_dtype=None):
    """2D convolution, x: [N,H,W,C], w: [kh,kw,cin,cout] (HWIO).

    Matches torch.nn.Conv2d(stride=stride, padding=padding) numerics
    (cross-correlation; torch 'convolution' is also cross-correlation).
    """
    if compute_dtype is not None:
        xc, wc = x.astype(compute_dtype), w.astype(compute_dtype)
    else:
        xc, wc = x, w
    s = (stride, stride) if isinstance(stride, int) else stride
    p = [(padding, padding)] * 2 if isinstance(padding, int) else padding
    # Output stays in the compute dtype: TPU MXU accumulates bf16 operands in
    # f32 internally, and a bf16 result keeps inter-op HBM traffic halved.
    # (Forcing preferred_element_type=f32 also breaks the conv VJP under
    # mixed bf16 kernel / f32 cotangent dtypes.)
    out = lax.conv_general_dilated(
        xc, wc, window_strides=s, padding=p,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def max_pool(x, *, window=3, stride=2, padding=1):
    """Max pool over H,W of [N,H,W,C], -inf padding (torch semantics)."""
    # init must be a Python scalar so lax recognizes the max monoid and the
    # call lowers to the differentiable reduce_window_max primitive.
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=[(0, 0), (padding, padding), (padding, padding), (0, 0)],
    )


def global_avg_pool(x):
    """AdaptiveAvgPool2d((1,1)) + flatten: [N,H,W,C] -> [N,C]."""
    return jnp.mean(x, axis=(1, 2))


def linear(x, w, b=None, *, compute_dtype=None):
    """x: [..., in] @ w: [in, out] (+ b)."""
    if compute_dtype is not None:
        xc, wc = x.astype(compute_dtype), w.astype(compute_dtype)
    else:
        xc, wc = x, w
    out = jnp.dot(xc, wc)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def masked_mean(x, mask=None, axis=0, keepdims=False):
    """Mean over `axis`, counting only mask>0 rows. mask broadcasts on axis."""
    if mask is None:
        return jnp.mean(x, axis=axis, keepdims=keepdims)
    shape = [1] * x.ndim
    shape[axis] = x.shape[axis]
    m = mask.reshape(shape).astype(x.dtype)
    n = jnp.maximum(jnp.sum(m, axis=axis, keepdims=keepdims), 1.0)
    return jnp.sum(x * m, axis=axis, keepdims=keepdims) / n


def batch_norm_tiles(x, gamma, beta, *, mask=None, eps=1e-5):
    """BatchNorm1d(track_running_stats=False) over the tile axis (axis 0).

    The reference's ContextLayer normalizes per-bag batch statistics
    (reference: gbm/model.py:105,109); with no running stats, torch uses
    batch stats in BOTH train and eval, with biased variance. `mask`
    restricts the statistics to valid (un-padded) tiles.
    """
    mu = masked_mean(x, mask, axis=0, keepdims=True)
    var = masked_mean((x - mu) ** 2, mask, axis=0, keepdims=True)
    xhat = (x - mu) * lax.rsqrt(var + eps)
    return xhat * gamma + beta


def dropout(x, rate, rng, *, train: bool):
    """torch.nn.Dropout: zero with prob `rate`, scale kept by 1/(1-rate)."""
    if not train or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def l1_normalize(x, axis=0, eps=1e-12):
    """F.normalize(p=1): x / max(sum|x|, eps) along axis."""
    denom = jnp.maximum(jnp.sum(jnp.abs(x), axis=axis, keepdims=True), eps)
    return x / denom


def l2_normalize(x, axis=0, eps=1e-12):
    """F.normalize(p=2): x / max(||x||_2, eps) along axis."""
    denom = jnp.maximum(
        jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True)), eps
    )
    return x / denom


def softplus(x):
    return jax.nn.softplus(x)
