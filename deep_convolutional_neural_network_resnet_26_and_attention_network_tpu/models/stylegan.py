"""Progressive-growing StyleGAN (generator + discriminator), TPU-native.

Rebuilds the reference's vendored StyleGAN (reference:
style-based-gan-pytorch-master-512/model.py:1-580) as functional NHWC JAX:

  * equalized learning rate: raw N(0,1) weights scaled by sqrt(2/fan_in)
    at use time (reference: model.py:24-53)
  * FusedUpsample / FusedDownsample: stride-2 transpose-conv / conv with the
    4-tap shift-averaged kernel (reference: model.py:56-111)
  * Blur: depthwise binomial 3x3 (reference: model.py:122-179; the custom
    autograd Function exists only to hand-flip the kernel in backward —
    JAX's conv VJP does that automatically)
  * PixelNorm, AdaIN (InstanceNorm + style affine), NoiseInjection,
    ConstantInput, StyledConvBlock (reference: model.py:114-119,271-374)
  * Generator: 9-block progression 4->1024px with per-block to_rgb taps,
    style mixing via a per-layer style-selection vector, alpha fade-in
    (reference: model.py:377-451)
  * StyledGenerator: 8-layer PixelNorm+EqualLinear mapping MLP, mean-style
    truncation (reference: model.py:454-506)
  * Discriminator: mirrored progression with minibatch-stddev concat at 4x4
    and from_rgb taps (reference: model.py:509-580)

Every step (resolution) jits separately — shapes are static per step, which
is exactly what XLA wants from progressive growing.
"""

import math
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# channel schedule for blocks at 4,8,16,32,64,128,256,512,1024 px
# (reference: model.py:380-390,512-521)
CHANNELS = (512, 512, 512, 512, 256, 128, 64, 32, 16)
LRELU_SLOPE = 0.2


def _scaled(width_mult: float, c: int) -> int:
    return max(4, int(c * width_mult))


def lrelu(x):
    return jnp.where(x >= 0, x, LRELU_SLOPE * x)


# ----------------------------------------------------------- primitives
def equal_scale(shape_fan_in: int) -> float:
    """EqualLR multiplier sqrt(2 / fan_in) (reference: model.py:28-32)."""
    return math.sqrt(2.0 / shape_fan_in)


def equal_conv2d(x, w, b=None, *, stride=1, padding=0):
    """Conv with equalized-lr scaling. w: [kh, kw, cin, cout] raw N(0,1);
    fan_in = cin * kh * kw (torch Conv2d weight fan-in)."""
    kh, kw, cin, _ = w.shape
    w = w * equal_scale(cin * kh * kw)
    s = (stride, stride)
    p = [(padding, padding)] * 2
    out = lax.conv_general_dilated(
        x, w, window_strides=s, padding=p,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        out = out + b
    return out


def equal_linear(x, w, b=None):
    """Linear with equalized-lr scaling. w: [in, out] raw N(0,1)."""
    out = x @ (w * equal_scale(w.shape[0]))
    if b is not None:
        out = out + b
    return out


def _fused_kernel(w):
    """Pad the kernel by 1 and average the four shifts — the kernel
    smoothing shared by Fused{Up,Down}sample (reference: model.py:72-78).
    w: [kh, kw, i, o] -> [kh+1, kw+1, i, o]."""
    w = jnp.pad(w, ((1, 1), (1, 1), (0, 0), (0, 0)))
    return (w[1:, 1:] + w[:-1, 1:] + w[1:, :-1] + w[:-1, :-1]) / 4.0


def fused_upsample(x, w, b, *, padding: int):
    """Stride-2 transposed conv with the smoothed kernel
    (reference: model.py:56-82). w: [k, k, cin, cout] raw N(0,1)."""
    kh, kw, cin, _ = w.shape
    w = _fused_kernel(w * equal_scale(cin * kh * kw))
    k = kh + 1
    # torch conv_transpose2d(stride=2, padding=p) == lhs-dilated conv with
    # spatially flipped kernel and padding k-1-p
    out = lax.conv_general_dilated(
        x, jnp.flip(w, (0, 1)), window_strides=(1, 1),
        padding=[(k - 1 - padding,) * 2] * 2, lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + b


def fused_downsample(x, w, b, *, padding: int):
    """Stride-2 conv with the smoothed kernel (reference: model.py:85-111)."""
    kh, kw, cin, _ = w.shape
    w = _fused_kernel(w * equal_scale(cin * kh * kw))
    out = lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding=[(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + b


# numpy, not jnp: a module-level device array would initialize the default
# backend at import time and break CPU-only dry runs (see blocks._RGB_FROM_HED).
_BLUR_KERNEL = np.array([[1.0, 2.0, 1.0], [2.0, 4.0, 2.0], [1.0, 2.0, 1.0]],
                        np.float32)
_BLUR_KERNEL = _BLUR_KERNEL / _BLUR_KERNEL.sum()


def blur(x):
    """Depthwise binomial 3x3 blur (reference: model.py:165-179).

    The [[1,2,1],[2,4,2],[1,2,1]]/16 kernel is separable: [1,2,1]/4 per
    axis. Measured in isolation a grouped conv (feature_group_count=C)
    is actually FASTER on v5e (1.8 vs 4.7 ms at [64,64,64,256]), but
    inside the full d_step the shift-adds fuse into the neighboring
    elementwise ops while the grouped conv is a fusion barrier:
    interleaved A/B gives 348.7 vs 358.1 ms per d_step (PROFILE.md GAN
    section). Same math, same zero padding, so the autodiff VJP is the
    reference's BlurFunctionBackward (symmetric kernel) for free."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    x = (xp[:, :-2] + 2.0 * xp[:, 1:-1] + xp[:, 2:]) * 0.25
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
    return (xp[:, :, :-2] + 2.0 * xp[:, :, 1:-1] + xp[:, :, 2:]) * 0.25


def pixel_norm(x, axis=-1, eps=1e-8):
    """x / sqrt(mean(x^2, channels)) (reference: model.py:114-119)."""
    return x * lax.rsqrt(jnp.mean(x * x, axis=axis, keepdims=True) + eps)


def instance_norm(x, eps=1e-5):
    """Per-sample per-channel spatial normalization (torch InstanceNorm2d,
    affine=False). x: [N, H, W, C]."""
    mu = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=(1, 2), keepdims=True)
    return (x - mu) * lax.rsqrt(var + eps)


def adain(x, style, p):
    """AdaptiveInstanceNorm: style -> (gamma, beta) via EqualLinear whose
    bias initializes to (1, 0) (reference: model.py:271-288)."""
    s = equal_linear(style, p["w"], p["b"])  # [N, 2C]
    c = x.shape[-1]
    gamma, beta = s[:, :c], s[:, c:]
    return instance_norm(x) * gamma[:, None, None, :] + beta[:, None, None, :]


def noise_inject(x, noise, weight):
    """x + scale*weight*noise with equal_lr on the [C] weight: fan_in = C
    (reference: model.py:291-297 with equal_lr at :356,361)."""
    c = weight.shape[0]
    return x + (weight * equal_scale(c))[None, None, None, :] * noise


# -------------------------------------------------------------- params
def _conv_p(key, k, cin, cout, bias=True):
    p = {"w": jax.random.normal(key, (k, k, cin, cout))}
    if bias:
        p["b"] = jnp.zeros((cout,))
    return p


def _linear_p(key, cin, cout):
    return {"w": jax.random.normal(key, (cin, cout)), "b": jnp.zeros((cout,))}


def _adain_p(key, style_dim, channels):
    p = _linear_p(key, style_dim, channels * 2)
    # gamma bias = 1, beta bias = 0 (reference: model.py:278-279)
    p["b"] = p["b"].at[:channels].set(1.0)
    return p


def init_styled_conv_block(key, cin, cout, *, kernel=3, style_dim=512,
                           initial=False):
    ks = jax.random.split(key, 6)
    p = {
        "noise1": jnp.zeros((cout,)),
        "adain1": _adain_p(ks[2], style_dim, cout),
        "conv2": _conv_p(ks[1], kernel, cout, cout),
        "noise2": jnp.zeros((cout,)),
        "adain2": _adain_p(ks[3], style_dim, cout),
    }
    if initial:
        p["constant"] = jax.random.normal(ks[0], (1, 4, 4, cin))
    else:
        p["conv1"] = _conv_p(ks[0], kernel, cin, cout)
    return p


def apply_styled_conv_block(p, x, style, noise, *, padding=1,
                            upsample=False, fused=False):
    """(reference: model.py:314-374)."""
    if "constant" in p:
        out = jnp.tile(p["constant"], (x.shape[0], 1, 1, 1))
    elif upsample and fused:
        out = blur(fused_upsample(x, p["conv1"]["w"], p["conv1"]["b"],
                                  padding=padding))
    elif upsample:
        n, h, w_, c = x.shape
        up = jax.image.resize(x, (n, 2 * h, 2 * w_, c), "bilinear")
        out = blur(equal_conv2d(up, p["conv1"]["w"], p["conv1"]["b"],
                                padding=padding))
    else:
        out = equal_conv2d(x, p["conv1"]["w"], p["conv1"]["b"],
                           padding=padding)
    out = lrelu(noise_inject(out, noise, p["noise1"]))
    out = adain(out, style, p["adain1"])
    out = equal_conv2d(out, p["conv2"]["w"], p["conv2"]["b"],
                       padding=(p["conv2"]["w"].shape[0] - 1) // 2)
    out = lrelu(noise_inject(out, noise, p["noise2"]))
    return adain(out, style, p["adain2"])


# ------------------------------------------------------------ generator
def _gen_layout(width_mult: float):
    ch = [_scaled(width_mult, c) for c in CHANNELS]
    # (cin, cout, kernel, padding, upsample, fused) per block
    layout = [(ch[0], ch[0], 3, 1, False, False)]  # 4px, initial
    specs = [(1, 3, 1, False), (2, 3, 1, False), (3, 3, 1, False),
             (4, 3, 1, False), (5, 5, 2, True), (6, 5, 2, True),
             (7, 5, 2, True), (8, 5, 2, True)]
    cin = ch[0]
    for idx, k, pad, fused in specs:
        layout.append((cin, ch[idx], k, pad, True, fused))
        cin = ch[idx]
    return layout


def init_generator(key, *, style_dim=512, width_mult=1.0, fused=True):
    # ``fused`` is signature parity with the reference Generator; the
    # fused-vs-plain upsample choice is baked into _gen_layout per block
    # (the reference hardcodes the same per-resolution split), so the
    # flag does not alter parameters
    layout = _gen_layout(width_mult)
    n = len(layout)
    keys = jax.random.split(key, 2 * n)
    progression, to_rgb = [], []
    for i, (cin, cout, k, pad, up, fz) in enumerate(layout):
        progression.append(init_styled_conv_block(
            keys[i], cin, cout, kernel=k, style_dim=style_dim,
            initial=(i == 0)))
        to_rgb.append(_conv_p(keys[n + i], 1, cout, 3))
    return {"progression": progression, "to_rgb": to_rgb}


def apply_generator(params, styles, noise, *, step=0, alpha=-1.0,
                    style_sel=None, width_mult=1.0, remat=False):
    """styles: [S, B, D] stacked mapped styles; noise: list of [B, s, s, 1];
    style_sel: [n_blocks] int indices into S (style mixing crossover,
    host-computed like reference model.py:419-434). Returns [B, s, s, 3].

    ``remat``: checkpoint each styled-conv block (sequential-segment
    rematerialization) so the backward retains only block-boundary
    activations plus one block's internals at a time. Measured effect:
    lifts the f32/1024px training boundary one batch rung, does NOT
    move the 512px WGAN-GP boundary (GAN512/1024_r04.jsonl). Values
    unchanged.
    """
    layout = _gen_layout(width_mult)
    if not 0 <= step < len(layout):
        raise ValueError(
            f"step {step} out of range for a {len(layout)}-block generator "
            f"(max resolution {4 * 2 ** (len(layout) - 1)}px)")
    if style_sel is None:
        style_sel = jnp.zeros((len(layout),), jnp.int32)
    out = None
    out_prev = None
    for i, ((cin, cout, k, pad, up, fz), block) in enumerate(
            zip(layout, params["progression"])):
        style_i = jnp.take(styles, style_sel[i], axis=0)  # [B, D]
        if i > 0 and step > 0:
            out_prev = out
        x_in = noise[0] if i == 0 else out
        block_fn = partial(apply_styled_conv_block, padding=pad,
                           upsample=up, fused=fz)
        if remat:
            block_fn = jax.checkpoint(block_fn)
        out = block_fn(block, x_in, style_i, noise[i])
        if i == step:
            rgb = equal_conv2d(out, params["to_rgb"][i]["w"],
                               params["to_rgb"][i]["b"])
            if i > 0:
                # traced-alpha-safe fade-in: alpha < 0 means "no blend",
                # which equals blending with alpha = 1
                a = jnp.clip(jnp.where(jnp.asarray(alpha) < 0, 1.0, alpha),
                             0.0, 1.0)
                skip = equal_conv2d(out_prev, params["to_rgb"][i - 1]["w"],
                                    params["to_rgb"][i - 1]["b"])
                n_, h, w_, c = skip.shape
                skip = jax.image.resize(skip, (n_, 2 * h, 2 * w_, c),
                                        "bilinear")
                rgb = (1 - a) * skip + a * rgb
            return rgb
    return rgb


def init_styled_generator(key, *, style_dim=512, n_mlp=8, width_mult=1.0,
                          fused=True):
    k_gen, *k_mlp = jax.random.split(key, n_mlp + 1)
    return {
        "generator": init_generator(k_gen, style_dim=style_dim,
                                    width_mult=width_mult, fused=fused),
        "style": [_linear_p(k, style_dim, style_dim) for k in k_mlp],
    }


def apply_style_mlp(params, z):
    """PixelNorm -> 8x (EqualLinear + LeakyReLU 0.2)
    (reference: model.py:457-463)."""
    h = pixel_norm(z, axis=-1)
    for layer in params["style"]:
        h = lrelu(equal_linear(h, layer["w"], layer["b"]))
    return h


def mean_style(params, z):
    """Mean mapped style for truncation (reference: model.py:498-501)."""
    return apply_style_mlp(params, z).mean(axis=0, keepdims=True)


def apply_styled_generator(params, zs, noise, *, step=0, alpha=-1.0,
                           style_sel=None, mean_style_w=None,
                           style_weight=0.0, width_mult=1.0, remat=False):
    """zs: [S, B, D] latent codes (S=1 normal, S=2 mixing). Styles pass the
    mapping MLP; optional truncation toward mean_style_w
    (reference: model.py:465-496)."""
    styles = jax.vmap(lambda z: apply_style_mlp(params, z))(zs)
    if mean_style_w is not None:
        styles = mean_style_w + style_weight * (styles - mean_style_w)
    return apply_generator(params["generator"], styles, noise, step=step,
                           alpha=alpha, style_sel=style_sel,
                           width_mult=width_mult, remat=remat)


def make_noise(key, batch: int, step: int):
    """Per-resolution noise planes [B, s, s, 1] (reference: model.py:481-485)."""
    keys = jax.random.split(key, step + 1)
    return [jax.random.normal(k, (batch, 4 * 2 ** i, 4 * 2 ** i, 1))
            for i, k in enumerate(keys)]


def sample_style_sel(py_rng, n_styles: int, step: int, n_blocks: int):
    """Host-side style-mixing crossover schedule (reference:
    model.py:419-434): pick len(styles)-1 crossover points in range(step)."""
    import random as _random

    sel = [0] * n_blocks
    if n_styles < 2:
        return sel
    inject = sorted((py_rng or _random).sample(list(range(max(step, 1))),
                                               n_styles - 1))
    crossover = 0
    for i in range(n_blocks):
        if crossover < len(inject) and i > inject[crossover]:
            crossover = min(crossover + 1, n_styles - 1)
        sel[i] = crossover
    return sel


# --------------------------------------------------------- discriminator
def _disc_layout(width_mult: float):
    ch = [_scaled(width_mult, c) for c in CHANNELS]
    # blocks from high res down: (cin, cout, k1, pad1, k2, pad2, down, fused)
    layout = [
        (ch[8], ch[7], 5, 2, 5, 2, True, True),    # 512px
        (ch[7], ch[6], 5, 2, 5, 2, True, True),    # 256
        (ch[6], ch[5], 5, 2, 5, 2, True, True),    # 128
        (ch[5], ch[4], 5, 2, 5, 2, True, True),    # 64
        (ch[4], ch[3], 3, 1, 3, 1, True, False),   # 32
        (ch[3], ch[2], 3, 1, 3, 1, True, False),   # 16
        (ch[2], ch[1], 3, 1, 3, 1, True, False),   # 8
        (ch[1], ch[0], 3, 1, 3, 1, True, False),   # 4
        (ch[0] + 1, ch[0], 3, 1, 4, 0, False, False),  # final (513 -> 512)
    ]
    return layout, ch


def init_discriminator(key, *, width_mult=1.0, from_rgb_activate=True):
    # ``from_rgb_activate`` does not change parameter shapes — it is an
    # APPLY-time choice (thread the same value into apply_discriminator);
    # accepted here for signature parity with the reference
    layout, ch = _disc_layout(width_mult)
    n = len(layout)
    keys = jax.random.split(key, 3 * n + 1)
    progression, from_rgb = [], []
    rgb_out = [ch[8], ch[7], ch[6], ch[5], ch[4], ch[3], ch[2], ch[1], ch[0]]
    for i, (cin, cout, k1, p1, k2, p2, down, fz) in enumerate(layout):
        progression.append({
            "conv1": _conv_p(keys[3 * i], k1, cin, cout),
            "conv2": _conv_p(keys[3 * i + 1], k2, cout, cout),
        })
        from_rgb.append(_conv_p(keys[3 * i + 2], 1, 3, rgb_out[i]))
    return {"progression": progression, "from_rgb": from_rgb,
            "linear": _linear_p(keys[-1], ch[0], 1)}


def _disc_conv_block(p, x, spec, *, train: bool, rng=None):
    """(reference: model.py:209-268) conv1+lrelu -> dropout(0.5) ->
    conv2 path by downsample/fused variant."""
    cin, cout, k1, p1, k2, p2, down, fz = spec
    out = lrelu(equal_conv2d(x, p["conv1"]["w"], p["conv1"]["b"],
                             padding=p1))
    if train and rng is not None:
        keep = jax.random.bernoulli(rng, 0.5, out.shape)
        out = jnp.where(keep, out / 0.5, 0.0)
    if down and fz:
        out = lrelu(fused_downsample(blur(out), p["conv2"]["w"],
                                     p["conv2"]["b"], padding=p2))
    elif down:
        out = equal_conv2d(blur(out), p["conv2"]["w"], p["conv2"]["b"],
                           padding=p2)
        out = lax.reduce_window(out, 0.0, lax.add, (1, 2, 2, 1),
                                (1, 2, 2, 1), "VALID") / 4.0
        out = lrelu(out)
    else:
        out = lrelu(equal_conv2d(out, p["conv2"]["w"], p["conv2"]["b"],
                                 padding=p2))
    return out


def minibatch_stddev(x, eps=1e-8):
    """sqrt(var over batch) averaged to one scalar, tiled as an extra
    feature map (reference: model.py:565-569)."""
    std = jnp.sqrt(jnp.var(x, axis=0) + eps)
    mean_std = std.mean()
    plane = jnp.full((x.shape[0], x.shape[1], x.shape[2], 1), mean_std)
    return jnp.concatenate([x, plane], axis=-1)


def apply_discriminator(params, x, *, step=0, alpha=-1.0, width_mult=1.0,
                        from_rgb_activate=True, train: bool = False,
                        rng=None, remat=False):
    """x: [B, s, s, 3] at resolution 4*2^step (reference: model.py:551-580).

    ``remat``: checkpoint each progression block so the backward
    retains only block boundaries and recomputes one block's internals
    at a time. Note the WGAN-GP double-backward's conv temps are NOT
    residuals and do not shrink — measured, remat only lifts the
    f32/1024px boundary (GAN512/1024_r04.jsonl). Values unchanged."""
    layout, _ = _disc_layout(width_mult)
    n_layer = len(layout)
    out = None
    for i in range(step, -1, -1):
        index = n_layer - i - 1
        spec = layout[index]
        if i == step:
            out = equal_conv2d(x, params["from_rgb"][index]["w"],
                               params["from_rgb"][index]["b"])
            if from_rgb_activate:
                out = lrelu(out)
        if i == 0:
            out = minibatch_stddev(out)
        if train and rng is not None:
            rng, sub = jax.random.split(rng)
        else:
            sub = None
        block_fn = partial(_disc_conv_block, spec=spec, train=train)
        if remat:
            block_fn = jax.checkpoint(block_fn)
        out = block_fn(params["progression"][index], out, rng=sub)
        if i > 0 and i == step:
            a = jnp.clip(jnp.where(jnp.asarray(alpha) < 0, 1.0, alpha),
                         0.0, 1.0)
            skip = lax.reduce_window(x, 0.0, lax.add, (1, 2, 2, 1),
                                     (1, 2, 2, 1), "VALID") / 4.0
            skip = equal_conv2d(skip, params["from_rgb"][index + 1]["w"],
                                params["from_rgb"][index + 1]["b"])
            if from_rgb_activate:
                skip = lrelu(skip)
            out = (1 - a) * skip + a * out
    out = out.reshape(out.shape[0], -1)
    # NOTE: the reference computes `self.do(out)` here but discards the
    # result (model.py:578) — no dropout actually applies; we match that.
    return equal_linear(out, params["linear"]["w"], params["linear"]["b"])
