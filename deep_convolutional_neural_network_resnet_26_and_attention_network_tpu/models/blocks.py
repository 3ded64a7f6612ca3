"""Misc building blocks from the reference's nnBlocks / gbm.model toolbox.

Functional JAX rebuilds of the pieces not already absorbed by the core
model files (resnet/attention_mil carry BasicResBlock and the loss;
stylegan.py carries the EqualLR/Fused/Blur/AdaIN family):

  TinyExtractor      small CNN tile embedder (reference: nnBlocks.py:15-44)
  ZeroDropout        unscaled Bernoulli dropout (reference: nnBlocks.py:140-155)
  ConvBlock          conv pair with 4 downsample variants
                     (reference: nnBlocks.py:397-466)
  ConvToChannelOnly  1x1 + full-size SELU convs (reference: nnBlocks.py:498-512)
  rgb_to_he_res      fixed-weight H&E stain round-trip (reference:
                     nnBlocks.py:281-293)
  linear_norm        PixelNorm duplicate (reference: nnBlocks.py:303-308)
  MLClassifier       3 channel-wise linear heads (reference: gbm/model.py:63-85)
  reset_linear       tanh-kaiming re-init of every linear leaf
                     (reference: gbm/model.py:183-187)
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops import init as I
from ..ops import nn as N


# ----------------------------------------------------------- ZeroDropout
def zero_dropout(x, p, rng, *, train: bool):
    """Bernoulli zeroing WITHOUT the 1/(1-p) rescale (reference:
    nnBlocks.py:140-155 multiplies by the raw keep mask)."""
    if not train or p <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - p, x.shape)
    return x * keep.astype(x.dtype)


# ------------------------------------------------------------ RBGtoHEres
# The reference's hardcoded 3x3 stain matrix, copied value-for-value
# (reference: nnBlocks.py:283-287). Despite the reference's variable name
# ('w_rgb_from_hed') it is NOT skimage's rgb_from_hed — numerically it is
# closest to an H-DAB deconvolution (skimage hdx_from_rgb, transposed) and
# is unrelated to data/stain.py's standard HED matrices.
# Kept as numpy so importing the package performs zero device ops: a
# module-level jnp.array would materialize on the default backend at import
# time and break CPU-only dry runs on hosts with an unhealthy TPU stack.
_RGB_FROM_HED = np.array([
    [1.8874, 0.2780, -1.5554],
    [-1.4174, 0.8393, 1.1682],
    [-0.1583, -0.4823, 1.6774]], np.float32)


def rgb_to_he_res(x):
    """H&E stain-space round-trip residual transform. x: [N, H, W, 3].

    out = -10^-( (-(log10(x+2))) @ M ) + 2  (reference: nnBlocks.py:288-293,
    a fixed 3x3 1x1-conv in log-stain space).
    """
    out = -jnp.log10(x + 2.0)
    out = jnp.einsum("nhwc,co->nhwo", out, _RGB_FROM_HED.T)
    return -jnp.power(10.0, -out) + 2.0


def linear_norm(x, eps=1e-8):
    """x / sqrt(mean(x^2, channel)) — nnBlocks' PixelNorm/LinearNorm pair
    (reference: nnBlocks.py:296-308). Channel axis is last (NHWC)."""
    return x * lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)


# -------------------------------------------------------------- ConvBlock
def init_conv_block(key, cin, cout, kernel, *, kernel2=None,
                    downsample=False, fused=False, max2d=False, fast=False):
    k1, k2 = jax.random.split(key)
    k2nd = kernel2 or kernel
    if downsample and fast:
        k2nd = 2
    elif downsample and not (fused or max2d):
        k2nd = 2
    p = {"conv1": {"w": I.conv_kernel(k1, kernel, kernel, cin, cout),
                   "b": I.zeros((cout,))}}
    if downsample and fused:
        # FusedDownsample weight raw N(0,1) (stylegan family init)
        p["conv2"] = {"w": jax.random.normal(k2, (k2nd, k2nd, cout, cout)),
                      "b": I.zeros((cout,))}
    else:
        p["conv2"] = {"w": I.conv_kernel(k2, k2nd, k2nd, cout, cout),
                      "b": I.zeros((cout,))}
    return p


def apply_conv_block(p, x, *, padding, padding2=None, downsample=False,
                     fused=False, max2d=False, fast=False):
    """conv+lrelu(0.1) then one of: fused downsample / conv+maxpool /
    stride-2 conv (+maxpool if fast) / plain conv
    (reference: nnBlocks.py:397-466)."""
    from . import stylegan as sg

    pad2 = padding if padding2 is None else padding2
    out = N.leaky_relu(N.conv2d(x, p["conv1"]["w"], p["conv1"]["b"],
                                stride=1, padding=padding))
    if downsample and fused:
        out = N.leaky_relu(sg.fused_downsample(out, p["conv2"]["w"],
                                               p["conv2"]["b"], padding=pad2))
    elif downsample and max2d:
        out = N.conv2d(out, p["conv2"]["w"], p["conv2"]["b"], padding=pad2)
        out = N.max_pool(out, window=2, stride=2, padding=0)
        out = N.leaky_relu(out)
    elif downsample and fast:
        out = N.conv2d(out, p["conv2"]["w"], p["conv2"]["b"], stride=2,
                       padding=0)
        out = N.max_pool(out, window=2, stride=2, padding=0)
        out = N.leaky_relu(out)
    elif downsample:
        out = N.leaky_relu(N.conv2d(out, p["conv2"]["w"], p["conv2"]["b"],
                                    stride=2, padding=0))
    else:
        out = N.leaky_relu(N.conv2d(out, p["conv2"]["w"], p["conv2"]["b"],
                                    padding=pad2))
    return out


# -------------------------------------------------------- TinyExtractor
TINY_SPECS = [
    # (cin, cout, downsample) with kernel 3 pad 0 (reference: nnBlocks.py:25-33)
    (32, 32, False), (32, 64, False), (64, 64, True),
    (64, 128, False), (128, 128, False), (128, None, True),
]


def init_tiny_extractor(key, channels_out: int):
    keys = jax.random.split(key, len(TINY_SPECS) + 2)
    stem = {"w": I.conv_kernel(keys[0], 7, 7, 3, 32)}  # bias=False stem
    blocks = []
    for k, (cin, cout, down) in zip(keys[1:-1], TINY_SPECS):
        blocks.append(init_conv_block(k, cin, cout or channels_out, 3,
                                      downsample=down, max2d=down))
    fc = {"w": I.linear_kaiming_fan_in(keys[-1], channels_out, channels_out,
                                       I.leaky_relu_gain(0.1)),
          "b": I.zeros((channels_out,))}
    return {"stem": stem, "blocks": blocks, "fc": fc}


def apply_tiny_extractor(params, x, channels_out: int):
    """x: [N, H, W, 3] -> [N, channels_out] (reference: nnBlocks.py:38-44;
    note the reference stem uses ReLU, the blocks LeakyReLU(0.1))."""
    h = N.conv2d(x, params["stem"]["w"], stride=2, padding=3)
    h = jnp.maximum(h, 0.0)
    h = N.max_pool(h, window=3, stride=2, padding=1)
    for p, (cin, cout, down) in zip(params["blocks"], TINY_SPECS):
        h = apply_conv_block(p, h, padding=0, downsample=down, max2d=down)
    h = N.global_avg_pool(h)
    return N.linear(h, params["fc"]["w"], params["fc"]["b"])


# ---------------------------------------------------- ConvToChannelOnly
def init_conv_to_channel_only(key, cin, cout, input_dim_size):
    k1, k2 = jax.random.split(key)
    return {
        "conv1": {"w": I.conv_kernel(k1, 1, 1, cin, cout),
                  "b": I.zeros((cout,))},
        "conv2": {"w": I.conv_kernel(k2, input_dim_size, input_dim_size,
                                     cout, cout),
                  "b": I.zeros((cout,))},
    }


def apply_conv_to_channel_only(p, x):
    """1x1 conv -> SELU -> full-spatial conv -> SELU: collapses [N,S,S,Cin]
    to [N,1,1,Cout] (reference: nnBlocks.py:498-512)."""
    out = jax.nn.selu(N.conv2d(x, p["conv1"]["w"], p["conv1"]["b"],
                               padding=0))
    return jax.nn.selu(N.conv2d(out, p["conv2"]["w"], p["conv2"]["b"],
                                padding=0))


# ----------------------------------------------------------- MLClassifier
def init_ml_classifier(key, features: int):
    keys = jax.random.split(key, 3)
    return [{"w": I.linear_xavier_normal(k, features, 1),
             "b": I.zeros((1,))} for k in keys]


def apply_ml_classifier(params, x):
    """x: [3, O] -> [1, 3] logits via 3 per-channel linear heads
    (reference: gbm/model.py:63-85)."""
    outs = [N.linear(x[i], p["w"], p["b"]) for i, p in enumerate(params)]
    return jnp.stack(outs).reshape(1, 3)


# ------------------------------------------------------------ reset_linear
def reset_linear(params, key):
    """Re-initialize every 2-D (linear) leaf with kaiming-tanh fan_in and
    zero the matching biases (reference: gbm/model.py:183-187; called by the
    legacy driver at gbm/classify.py:383). Conv kernels (4-D) are untouched.
    """
    counter = {"i": 0}
    n_keys = len(jax.tree_util.tree_leaves(params))
    keys = jax.random.split(key, max(n_keys, 1))

    def visit(node):
        if isinstance(node, dict):
            w = node.get("w")
            if w is not None and getattr(w, "ndim", 0) == 2:
                k = keys[counter["i"] % len(keys)]
                counter["i"] += 1
                out = dict(node)
                out["w"] = I.linear_kaiming_fan_in(k, w.shape[0], w.shape[1],
                                                   I.TANH_GAIN)
                if "b" in node:
                    out["b"] = jnp.zeros_like(node["b"])
                return out
            return {k_: visit(v) for k_, v in node.items()}
        if isinstance(node, list):
            return [visit(v) for v in node]
        if isinstance(node, tuple):
            return tuple(visit(v) for v in node)
        return node

    return visit(params)
