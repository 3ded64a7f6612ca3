"""Wasserstein-autoencoder pieces (conv Encoder / Decoder / MLP latent
Discriminator) — rebuild of the reference's WAEGAN experiment models
(reference: WAEGAN.py:112-194) with the shared DownConv/UpConv/BottleConv
helpers (reference: WAEGAN.py:40-111).

Normalization note: the torch originals apply BatchNorm2d after each conv;
functionally we use batch statistics (track_running_stats semantics), with
an optional mask-free per-batch normalization identical in train mode.
"""

import jax
import jax.numpy as jnp

from ..ops import init as I
from ..ops import nn as N

ENCODER_CHANNELS = ((3, 16), (16, 40), (40, 60), (60, 150), (150, 250),
                    (250, 100))  # reference: WAEGAN.py:118
DECODER_CHANNELS = ((3, 16), (16, 30), (30, 64), (64, 100), (100, 200),
                    (200, 100))  # reference: WAEGAN.py:147
DISC_DIMS = (512, 1536, 1024, 256, 128, 1)  # dim_h ladder (WAEGAN.py:176-190)


def batch_norm_2d(x, gamma, beta, eps=1e-5):
    """BatchNorm2d with batch statistics. x: [N, H, W, C]."""
    mu = jnp.mean(x, axis=(0, 1, 2), keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=(0, 1, 2), keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * gamma + beta


def _conv_p(key, k, cin, cout):
    return {"w": I.conv_kernel(key, k, k, cin, cout), "b": I.zeros((cout,))}


def _bn_p(c):
    return {"gamma": jnp.ones((c,)), "beta": jnp.zeros((c,))}


def init_down_conv(key, cin, cout):
    """conv5x5 + conv3x3 + shared BN (reference: WAEGAN.py:56-84)."""
    k1, k2 = jax.random.split(key)
    return {"conv1": _conv_p(k1, 5, cin, cout),
            "conv2": _conv_p(k2, 3, cout, cout), "bn": _bn_p(cout)}


def apply_down_conv(p, x, *, pooling=True, train=False, rng=None,
                    dropout=0.5):
    """selu convs with BN + dropout, then 2x2 maxpool
    (reference: WAEGAN.py:78-84)."""
    def drop(h, k):
        if not train or k is None:
            return h
        keep = jax.random.bernoulli(k, 1.0 - dropout, h.shape)
        return jnp.where(keep, h / (1.0 - dropout), 0.0)

    k1 = k2 = k3 = None
    if train and rng is not None:
        k1, k2, k3 = jax.random.split(rng, 3)
    h = N.conv2d(x, p["conv1"]["w"], p["conv1"]["b"], padding=2)
    h = drop(batch_norm_2d(jax.nn.selu(h), p["bn"]["gamma"], p["bn"]["beta"]), k1)
    h = N.conv2d(h, p["conv2"]["w"], p["conv2"]["b"], padding=1)
    h = drop(batch_norm_2d(jax.nn.selu(h), p["bn"]["gamma"], p["bn"]["beta"]), k2)
    if train and k3 is not None:  # Dropout2d: zero whole channels
        keep = jax.random.bernoulli(k3, 0.5, (h.shape[0], 1, 1, h.shape[-1]))
        h = jnp.where(keep, h / 0.5, 0.0)
    if pooling:
        h = N.max_pool(h, window=2, stride=2, padding=0)
    return h


def init_up_conv(key, cin, cout):
    """transpose-upconv 2x2 + two conv3x3 + BN (reference: WAEGAN.py:86-111)."""
    k0, k1, k2 = jax.random.split(key, 3)
    return {
        "upconv": {"w": I.conv_kernel(k0, 2, 2, cin, cout),
                   "b": I.zeros((cout,))},
        "conv1": _conv_p(k1, 3, cout, cout),
        "conv2": _conv_p(k2, 3, cout, cout),
        "bn": _bn_p(cout),
    }


def conv_transpose_2x2(x, w, b):
    """torch ConvTranspose2d(k=2, s=2): exact 2x upsample."""
    out = jax.lax.conv_general_dilated(
        x, jnp.flip(w, (0, 1)), window_strides=(1, 1),
        padding=[(1, 1), (1, 1)], lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + b


def apply_up_conv(p, x):
    h = conv_transpose_2x2(x, p["upconv"]["w"], p["upconv"]["b"])
    h = N.conv2d(h, p["conv1"]["w"], p["conv1"]["b"], padding=1)
    h = batch_norm_2d(jax.nn.selu(h), p["bn"]["gamma"], p["bn"]["beta"])
    h = N.conv2d(h, p["conv2"]["w"], p["conv2"]["b"], padding=1)
    return batch_norm_2d(jax.nn.selu(h), p["bn"]["gamma"], p["bn"]["beta"])


# --------------------------------------------------------------- encoder
def init_encoder(key, *, latent_size=8, channels=ENCODER_CHANNELS):
    keys = jax.random.split(key, len(channels) + 1)
    cfinal = channels[-1][1]
    return {
        "down": [init_down_conv(k, cin, cout)
                 for k, (cin, cout) in zip(keys, channels)],
        "fc": {"w": I.linear_kaiming_fan_in(
            keys[-1], cfinal * latent_size * latent_size, 512,
            I.leaky_relu_gain(0.1)), "b": I.zeros((512,))},
    }


def apply_encoder(params, x, *, latent_size=8, train=False, rng=None):
    """[N, S, S, 3] -> [N, 512] latent (reference: WAEGAN.py:112-138)."""
    for i, p in enumerate(params["down"]):
        sub = None
        if train and rng is not None:
            rng, sub = jax.random.split(rng)
        x = apply_down_conv(p, x, pooling=True, train=train, rng=sub)
    x = x.reshape(x.shape[0], -1)
    return jnp.maximum(N.linear(x, params["fc"]["w"], params["fc"]["b"]), 0.0)


# --------------------------------------------------------------- decoder
def init_decoder(key, *, latent_size=8, channels=DECODER_CHANNELS):
    keys = jax.random.split(key, len(channels) + 1)
    cfinal = channels[-1][1]
    ups = []
    for k, (cout, cin) in zip(keys, reversed(channels)):
        ups.append(init_up_conv(k, cin, cout))
    return {
        "up": ups,
        "fc": {"w": I.linear_kaiming_fan_in(
            keys[-1], 512, cfinal * latent_size * latent_size,
            I.leaky_relu_gain(0.1)),
            "b": I.zeros((cfinal * latent_size * latent_size,))},
    }


def apply_decoder(params, z, *, latent_size=8, channels=DECODER_CHANNELS):
    """[N, 512] -> [N, S*2^d, S*2^d, 3] image (reference: WAEGAN.py:141-167)."""
    cfinal = channels[-1][1]
    x = jnp.maximum(N.linear(z, params["fc"]["w"], params["fc"]["b"]), 0.0)
    x = x.reshape(-1, latent_size, latent_size, cfinal)
    for p in params["up"]:
        x = apply_up_conv(p, x)
    return x


# ----------------------------------------------------------- discriminator
def init_wae_discriminator(key):
    keys = jax.random.split(key, len(DISC_DIMS) - 1)
    return [{"w": I.linear_kaiming_fan_in(k, DISC_DIMS[i], DISC_DIMS[i + 1],
                                          I.leaky_relu_gain(0.1)),
             "b": I.zeros((DISC_DIMS[i + 1],))}
            for i, k in enumerate(keys)]


def apply_wae_discriminator(params, z, *, train=False, rng=None):
    """MLP latent critic with sigmoid head (reference: WAEGAN.py:169-194)."""
    h = z
    for i, p in enumerate(params):
        h = N.linear(h, p["w"], p["b"])
        if i < len(params) - 1:
            h = jnp.maximum(h, 0.0)
            if train and rng is not None and i < 3:  # Dropout after 3 layers
                rng, sub = jax.random.split(rng)
                keep = jax.random.bernoulli(sub, 0.5, h.shape)
                h = jnp.where(keep, h / 0.5, 0.0)
    return jax.nn.sigmoid(h)
