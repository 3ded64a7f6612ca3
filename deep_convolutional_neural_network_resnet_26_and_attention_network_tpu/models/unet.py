"""LatentUNet encoder-decoder with latent bottleneck, SMOTE perturbation,
and a learnable cluster-assignment layer.

Rebuild of the reference's Encoders.py experiment models (reference:
Encoders.py:14-356): a U-Net whose deepest feature map flattens through a
fully-connected latent (1024*8*8 -> 1024 at the default depth), per-level
1x1 bottleneck taps, merge modes concat/add/skip, ``SMOTELayer`` gaussian
latent jitter (reference: Encoders.py:14-23), and ``ClusterLayer`` k-means
style assignment with inertia + cross-term losses (reference:
Encoders.py:25-43).
"""

import jax
import jax.numpy as jnp

from ..ops import init as I
from ..ops import nn as N
from .wae import batch_norm_2d, conv_transpose_2x2


def smote_layer(x, rng, epsilon: float = 0.005):
    """x + eps * N(0,1) latent jitter (reference: Encoders.py:14-23)."""
    return x + epsilon * jax.random.normal(rng, x.shape)


def init_cluster_layer(key, n_clusters: int, dim: int = 16 * 8):
    return {"centers": I.linear_xavier_normal(key, n_clusters, dim)}


def apply_cluster_layer(params, x):
    """Nearest-center assignment. Returns (inertia/batch, cross-term/k,
    assignments) (reference: Encoders.py:32-43)."""
    centers = params["centers"]
    n_clusters = centers.shape[0]
    flat = x.reshape(x.shape[0], -1)
    d2 = jnp.sum((flat[:, None, :] - centers[None]) ** 2, axis=2)  # [B, K]
    cl = jnp.argmin(d2, axis=1)
    inertia = jnp.sum(d2[jnp.arange(d2.shape[0]), cl])
    gram = centers @ centers.T
    sign = 2.0 * jnp.eye(n_clusters) - 1.0  # +1 diag, -1 off-diag
    xe = jnp.sum(sign * gram)
    return inertia / x.shape[0], xe / n_clusters, cl


def _conv_p(key, k, cin, cout):
    return {"w": I.conv_kernel(key, k, k, cin, cout), "b": I.zeros((cout,))}


def _bn_p(c):
    return {"gamma": jnp.ones((c,)), "beta": jnp.zeros((c,))}


def init_latent_unet(key, *, in_channels=3, out_channels=3, depth=5,
                     start_filts=16, latent_channels=10,
                     input_size=128, latent_dim=1024, concat_layer=-1):
    """Parameter pytree. The reference hardcodes the FC latent at
    1024*8*8 -> 1024 (Encoders.py:261, for 128px inputs at depth 5 with
    start_filts growing to 1024 in its runs); here the flat size derives
    from input_size/depth/start_filts."""
    keys = jax.random.split(key, 8 * depth + 8)
    ki = iter(keys)
    down = []
    outs = start_filts
    for i in range(depth):
        ins = in_channels if i == 0 else outs
        outs = start_filts * (2 ** i)
        down.append({
            "conv1": _conv_p(next(ki), 3, ins, outs),
            "conv2": _conv_p(next(ki), 3, outs, outs),
            "bn": _bn_p(outs),
            "bottle_in": _conv_p(next(ki), 1, outs, latent_channels),
            "bn_in": _bn_p(latent_channels),
        })
    bottom_size = input_size // (2 ** (depth - 1))
    flat = outs * bottom_size * bottom_size
    fcl = {"w": I.linear_kaiming_fan_in(next(ki), flat, latent_dim,
                                        I.leaky_relu_gain(0.1)),
           "b": I.zeros((latent_dim,))}
    # (the latent reshapes to [16, s, s] planes at apply time,
    # reference: Encoders.py:330)
    bottle_out = _conv_p(next(ki), 1, 16, outs)
    up = []
    ins = outs
    for i in range(depth - 1):
        outs = ins // 2
        # conv1 width doubles only on the concat layer
        # (reference: Encoders.py:151-156)
        c1_in = 2 * outs if i == concat_layer else outs
        up.append({
            "upconv": _conv_p(next(ki), 2, ins, outs),
            "conv1": _conv_p(next(ki), 3, c1_in, outs),
            "conv2": _conv_p(next(ki), 3, outs, outs),
            "bn": _bn_p(outs),
            "bottle_out": _conv_p(next(ki), 1, latent_channels, outs),
            "bn_out": _bn_p(outs),
        })
        ins = outs
    conv_final = _conv_p(next(ki), 1, outs, out_channels)
    return {"down": down, "fcl": fcl, "bottle_out": bottle_out, "up": up,
            "final": conv_final}


def _down_block(p, x, *, pooling):
    """2x (conv3x3 -> relu -> BN), 1x1 bottleneck tap, maxpool
    (reference: Encoders.py:95-130; dropout omitted in eval semantics)."""
    h = batch_norm_2d(jnp.maximum(
        N.conv2d(x, p["conv1"]["w"], p["conv1"]["b"], padding=1), 0.0),
        p["bn"]["gamma"], p["bn"]["beta"])
    h = batch_norm_2d(jnp.maximum(
        N.conv2d(h, p["conv2"]["w"], p["conv2"]["b"], padding=1), 0.0),
        p["bn"]["gamma"], p["bn"]["beta"])
    before_pool = h
    if pooling:
        h = N.max_pool(h, window=2, stride=2, padding=0)
    tap = batch_norm_2d(jnp.maximum(
        N.conv2d(before_pool, p["bottle_in"]["w"], p["bottle_in"]["b"],
                 padding=0), 0.0),
        p["bn_in"]["gamma"], p["bn_in"]["beta"])
    return h, tap


def _up_block(p, from_down, from_up, *, merge_mode):
    """1x1 expand of the tap, transpose-upconv, merge, 2 convs
    (reference: Encoders.py:133-182). 'skip' ignores the encoder tap."""
    x = conv_transpose_2x2(from_up, p["upconv"]["w"], p["upconv"]["b"])
    if merge_mode in ("concat", "add"):
        side = batch_norm_2d(jnp.maximum(
            N.conv2d(from_down, p["bottle_out"]["w"], p["bottle_out"]["b"],
                     padding=0), 0.0),
            p["bn_out"]["gamma"], p["bn_out"]["beta"])
        if side.shape[1:3] != x.shape[1:3]:
            side = jax.image.resize(side, x.shape[:3] + side.shape[3:],
                                    "nearest")
        if merge_mode == "concat":
            x = jnp.concatenate([x, side], axis=-1)
        else:
            x = x + side
    h = batch_norm_2d(jnp.maximum(
        N.conv2d(x, p["conv1"]["w"], p["conv1"]["b"], padding=1), 0.0),
        p["bn"]["gamma"], p["bn"]["beta"])
    return batch_norm_2d(jnp.maximum(
        N.conv2d(h, p["conv2"]["w"], p["conv2"]["b"], padding=1), 0.0),
        p["bn"]["gamma"], p["bn"]["beta"])


def apply_latent_unet(params, x, *, rng=None, perturbation=False,
                      early_stop=False, concat_layer=-1,
                      latent_dim=1024):
    """Forward (reference: Encoders.py:311-356). Returns
    (reconstruction, latent_flat, encoder_tap); with early_stop=True
    returns (bottom_features, latent_flat, encoder_tap)."""
    depth = len(params["down"])
    encoder_tap = None
    h = x
    for i, p in enumerate(params["down"]):
        h, tap = _down_block(p, h, pooling=(i < depth - 1))
        if i == (depth - concat_layer - 2):
            encoder_tap = tap
    flat = h.reshape(h.shape[0], -1)
    latent_flat = jnp.maximum(
        N.linear(flat, params["fcl"]["w"], params["fcl"]["b"]), 0.0)
    if early_stop:
        return h, latent_flat, encoder_tap

    lat_side = int((latent_dim // 16) ** 0.5)
    latent = latent_flat.reshape(-1, lat_side, lat_side, 16)
    decoder_in = encoder_tap
    # the reference jitters the encoder TAP, not the latent (its latent
    # variant is commented out, Encoders.py:337-338) — and at its own
    # hardcoded concat_layer = -1 every up block merges 'skip', so the
    # jittered tap is never consumed: SMOTE is a no-op at default
    # arguments THERE TOO. Kept faithfully; guard the tap-less case.
    if perturbation and rng is not None and decoder_in is not None:
        decoder_in = smote_layer(decoder_in, rng)
    g = batch_norm_2d(jnp.maximum(
        N.conv2d(latent, params["bottle_out"]["w"],
                 params["bottle_out"]["b"], padding=0), 0.0),
        jnp.ones((params["bottle_out"]["w"].shape[-1],)),
        jnp.zeros((params["bottle_out"]["w"].shape[-1],)))
    for i, p in enumerate(params["up"]):
        merge = "concat" if i == concat_layer else "skip"
        g = _up_block(p, decoder_in, g, merge_mode=merge)
    recon = N.conv2d(g, params["final"]["w"], params["final"]["b"],
                     padding=0)
    return recon, latent_flat, encoder_tap
