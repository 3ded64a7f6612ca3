"""Functional torch-CPU replica of the progressive StyleGAN trainer hot
loop — the bench baseline for ``bench.py --config 7`` only.

Mirrors the semantics of ``models/stylegan.py`` (our TPU rebuild of the
vendored trainer; reference: style-based-gan-pytorch-master-512/model.py,
train.py:84-161): equalized-lr conv/linear (N(0,1) weights scaled by
sqrt(2/fan_in) at use time), fused up/down-sample with the 4-tap smoothed
kernel, depthwise binomial blur, PixelNorm/AdaIN/NoiseInjection, the
progressive alpha blend, minibatch-stddev, the WGAN-GP d_step with its
0.001*real^2 drift term and double-backward gradient penalty, and the
n_critic g_step with Adam(0.0, 0.99).

Written as plain functions over parameter dicts (the same structure as the
JAX module) so the timed math matches our d_step/g_step term for term.
"""

import math

import torch
import torch.nn.functional as F

CHANNELS = (512, 512, 512, 512, 256, 128, 64, 32, 16)
SLOPE = 0.2


def _scaled(width_mult, c):
    return max(4, int(c * width_mult))


def _scale(fan_in):
    return math.sqrt(2.0 / fan_in)


def lrelu(x):
    return F.leaky_relu(x, SLOPE)


def econv(x, w, b=None, stride=1, padding=0):
    """w: [cout, cin, k, k] raw N(0,1)."""
    cin, kh, kw = w.shape[1], w.shape[2], w.shape[3]
    return F.conv2d(x, w * _scale(cin * kh * kw), b, stride, padding)


def elinear(x, w, b=None):
    """w: [out, in] raw N(0,1)."""
    return F.linear(x, w * _scale(w.shape[1]), b)


def _fused_kernel(w):
    w = F.pad(w, (1, 1, 1, 1))
    return (w[..., 1:, 1:] + w[..., :-1, 1:]
            + w[..., 1:, :-1] + w[..., :-1, :-1]) / 4.0


def fused_up(x, w, b, padding):
    """w: [cin, cout, k, k] raw; stride-2 transpose conv, smoothed kernel."""
    cin, k = w.shape[0], w.shape[2]
    w = _fused_kernel(w * _scale(cin * k * k))
    return F.conv_transpose2d(x, w, b, stride=2, padding=padding)


def fused_down(x, w, b, padding):
    cin, k = w.shape[1], w.shape[2]
    w = _fused_kernel(w * _scale(cin * k * k))
    return F.conv2d(x, w, b, stride=2, padding=padding)


_BLUR = torch.tensor([[1.0, 2.0, 1.0], [2.0, 4.0, 2.0], [1.0, 2.0, 1.0]])
_BLUR = (_BLUR / _BLUR.sum()).view(1, 1, 3, 3)


def blur(x):
    c = x.shape[1]
    return F.conv2d(x, _BLUR.expand(c, 1, 3, 3), padding=1, groups=c)


def pixel_norm(x):
    return x * torch.rsqrt((x * x).mean(dim=1, keepdim=True) + 1e-8)


def adain(x, style, p):
    s = elinear(style, p["w"], p["b"])
    c = x.shape[1]
    gamma, beta = s[:, :c], s[:, c:]
    out = F.instance_norm(x, eps=1e-5)
    return out * gamma[:, :, None, None] + beta[:, :, None, None]


def noise_inject(x, noise, weight):
    c = weight.shape[0]
    return x + (weight * _scale(c)).view(1, -1, 1, 1) * noise


# ---------------------------------------------------------------- params
def _conv_p(k, cin, cout):
    return {"w": torch.randn(cout, cin, k, k), "b": torch.zeros(cout)}


def _tconv_p(k, cin, cout):
    return {"w": torch.randn(cin, cout, k, k), "b": torch.zeros(cout)}


def _linear_p(cin, cout):
    return {"w": torch.randn(cout, cin), "b": torch.zeros(cout)}


def _adain_p(style_dim, c):
    p = _linear_p(style_dim, 2 * c)
    with torch.no_grad():
        p["b"][:c] = 1.0
    return p


def _gen_layout(width_mult):
    ch = [_scaled(width_mult, c) for c in CHANNELS]
    layout = [(ch[0], ch[0], 3, 1, False, False)]
    specs = [(1, 3, 1, False), (2, 3, 1, False), (3, 3, 1, False),
             (4, 3, 1, False), (5, 5, 2, True), (6, 5, 2, True),
             (7, 5, 2, True), (8, 5, 2, True)]
    cin = ch[0]
    for idx, k, pad, fused in specs:
        layout.append((cin, ch[idx], k, pad, True, fused))
        cin = ch[idx]
    return layout


def init_generator(style_dim=512, width_mult=1.0, n_mlp=8):
    layout = _gen_layout(width_mult)
    progression, to_rgb = [], []
    for i, (cin, cout, k, pad, up, fz) in enumerate(layout):
        block = {
            "noise1": torch.zeros(cout),
            "adain1": _adain_p(style_dim, cout),
            "conv2": _conv_p(k, cout, cout),
            "noise2": torch.zeros(cout),
            "adain2": _adain_p(style_dim, cout),
        }
        if i == 0:
            block["constant"] = torch.randn(1, cin, 4, 4)
        elif up and fz:
            block["conv1"] = _tconv_p(k, cin, cout)
        else:
            block["conv1"] = _conv_p(k, cin, cout)
        progression.append(block)
        to_rgb.append(_conv_p(1, cout, 3))
    style = [_linear_p(style_dim, style_dim) for _ in range(n_mlp)]
    return {"progression": progression, "to_rgb": to_rgb, "style": style}


def _gen_block(p, x, style, noise, spec):
    cin, cout, k, pad, up, fz = spec
    if "constant" in p:
        out = p["constant"].expand(x.shape[0], -1, -1, -1)
    elif up and fz:
        out = blur(fused_up(x, p["conv1"]["w"], p["conv1"]["b"], pad))
    elif up:
        out = F.interpolate(x, scale_factor=2, mode="bilinear",
                            align_corners=False)
        out = blur(econv(out, p["conv1"]["w"], p["conv1"]["b"], padding=pad))
    else:
        out = econv(x, p["conv1"]["w"], p["conv1"]["b"], padding=pad)
    out = lrelu(noise_inject(out, noise, p["noise1"]))
    out = adain(out, style, p["adain1"])
    out = econv(out, p["conv2"]["w"], p["conv2"]["b"],
                padding=(p["conv2"]["w"].shape[2] - 1) // 2)
    out = lrelu(noise_inject(out, noise, p["noise2"]))
    return adain(out, style, p["adain2"])


def apply_generator(params, z, noise, *, step, alpha, width_mult=1.0):
    """z: [B, D]; noise: list of [B, 1, s, s]. Single style (no mixing,
    matching the bench's jax side). Returns [B, 3, s, s]."""
    style = pixel_norm(z)
    for layer in params["style"]:
        style = lrelu(elinear(style, layer["w"], layer["b"]))
    layout = _gen_layout(width_mult)
    out = out_prev = None
    for i, spec in enumerate(layout):
        if i > 0 and step > 0:
            out_prev = out
        x_in = noise[0] if i == 0 else out
        out = _gen_block(params["progression"][i], x_in, style, noise[i],
                         spec)
        if i == step:
            rgb = econv(out, params["to_rgb"][i]["w"],
                        params["to_rgb"][i]["b"])
            if i > 0:
                skip = econv(out_prev, params["to_rgb"][i - 1]["w"],
                             params["to_rgb"][i - 1]["b"])
                skip = F.interpolate(skip, scale_factor=2, mode="bilinear",
                                     align_corners=False)
                rgb = (1 - alpha) * skip + alpha * rgb
            return rgb
    return rgb


def _disc_layout(width_mult):
    ch = [_scaled(width_mult, c) for c in CHANNELS]
    return [
        (ch[8], ch[7], 5, 2, 5, 2, True, True),
        (ch[7], ch[6], 5, 2, 5, 2, True, True),
        (ch[6], ch[5], 5, 2, 5, 2, True, True),
        (ch[5], ch[4], 5, 2, 5, 2, True, True),
        (ch[4], ch[3], 3, 1, 3, 1, True, False),
        (ch[3], ch[2], 3, 1, 3, 1, True, False),
        (ch[2], ch[1], 3, 1, 3, 1, True, False),
        (ch[1], ch[0], 3, 1, 3, 1, True, False),
        (ch[0] + 1, ch[0], 3, 1, 4, 0, False, False),
    ], ch


def init_discriminator(width_mult=1.0):
    layout, ch = _disc_layout(width_mult)
    rgb_out = [ch[8], ch[7], ch[6], ch[5], ch[4], ch[3], ch[2], ch[1], ch[0]]
    progression, from_rgb = [], []
    for i, (cin, cout, k1, p1, k2, p2, down, fz) in enumerate(layout):
        progression.append({
            "conv1": _conv_p(k1, cin, cout),
            "conv2": (_conv_p(k2, cout, cout)),
        })
        from_rgb.append(_conv_p(1, 3, rgb_out[i]))
    return {"progression": progression, "from_rgb": from_rgb,
            "linear": _linear_p(ch[0], 1)}


def _disc_block(p, x, spec, train):
    cin, cout, k1, p1, k2, p2, down, fz = spec
    out = lrelu(econv(x, p["conv1"]["w"], p["conv1"]["b"], padding=p1))
    out = F.dropout(out, 0.5, training=train)
    if down and fz:
        out = lrelu(fused_down(blur(out), p["conv2"]["w"], p["conv2"]["b"],
                               p2))
    elif down:
        out = econv(blur(out), p["conv2"]["w"], p["conv2"]["b"], padding=p2)
        out = lrelu(F.avg_pool2d(out, 2))
    else:
        out = lrelu(econv(out, p["conv2"]["w"], p["conv2"]["b"],
                          padding=p2))
    return out


def minibatch_stddev(x):
    std = torch.sqrt(x.var(dim=0, unbiased=False) + 1e-8)
    plane = std.mean().expand(x.shape[0], 1, x.shape[2], x.shape[3])
    return torch.cat([x, plane], dim=1)


def apply_discriminator(params, x, *, step, alpha, width_mult=1.0,
                        train=True, from_rgb_activate=True):
    layout, _ = _disc_layout(width_mult)
    n_layer = len(layout)
    out = None
    for i in range(step, -1, -1):
        index = n_layer - i - 1
        if i == step:
            out = econv(x, params["from_rgb"][index]["w"],
                        params["from_rgb"][index]["b"])
            if from_rgb_activate:
                out = lrelu(out)
        if i == 0:
            out = minibatch_stddev(out)
        out = _disc_block(params["progression"][index], out, layout[index],
                          train)
        if i > 0 and i == step:
            skip = econv(F.avg_pool2d(x, 2),
                         params["from_rgb"][index + 1]["w"],
                         params["from_rgb"][index + 1]["b"])
            if from_rgb_activate:
                skip = lrelu(skip)
            out = (1 - alpha) * skip + alpha * out
    out = out.reshape(out.shape[0], -1)
    return elinear(out, params["linear"]["w"], params["linear"]["b"])


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    elif isinstance(tree, list):
        for v in tree:
            yield from _leaves(v)
    else:
        yield tree


def make_trainer(width_mult=1.0, style_dim=512, lr=0.001):
    """(params_g, params_d, d_step, g_step) with Adam(0.0, 0.99) — the
    reference trainer's optimizer config (train.py:279-291)."""
    params_g = init_generator(style_dim=style_dim, width_mult=width_mult)
    params_d = init_discriminator(width_mult=width_mult)
    for t in _leaves(params_g):
        t.requires_grad_(True)
    for t in _leaves(params_d):
        t.requires_grad_(True)
    opt_g = torch.optim.Adam(list(_leaves(params_g)), lr=lr,
                             betas=(0.0, 0.99))
    opt_d = torch.optim.Adam(list(_leaves(params_d)), lr=lr,
                             betas=(0.0, 0.99))

    def d_step(real, z, noise, step, alpha):
        b = real.shape[0]
        real_pred = apply_discriminator(params_d, real, step=step,
                                        alpha=alpha, width_mult=width_mult)
        real_term = real_pred.mean() - 0.001 * (real_pred ** 2).mean()
        with torch.no_grad():
            fake = apply_generator(params_g, z, noise, step=step,
                                   alpha=alpha, width_mult=width_mult)
        fake_term = apply_discriminator(params_d, fake, step=step,
                                        alpha=alpha,
                                        width_mult=width_mult).mean()
        eps = torch.rand(b, 1, 1, 1)
        x_hat = (eps * real + (1 - eps) * fake).requires_grad_(True)
        pred = apply_discriminator(params_d, x_hat, step=step, alpha=alpha,
                                   width_mult=width_mult).sum()
        (grad_x,) = torch.autograd.grad(pred, x_hat, create_graph=True)
        gp = 10.0 * ((grad_x.reshape(b, -1).norm(2, dim=1) - 1.0) ** 2
                     ).mean()
        loss = -real_term + fake_term + gp
        opt_d.zero_grad()
        loss.backward()
        opt_d.step()
        return float(loss.detach())

    def g_step(z, noise, step, alpha):
        fake = apply_generator(params_g, z, noise, step=step, alpha=alpha,
                               width_mult=width_mult)
        loss = (-apply_discriminator(params_d, fake, step=step, alpha=alpha,
                                     width_mult=width_mult)).mean()
        opt_g.zero_grad()
        loss.backward()
        opt_g.step()
        return float(loss.detach())

    return params_g, params_d, d_step, g_step


def make_noise(batch, step):
    return [torch.randn(batch, 1, 4 * 2 ** i, 4 * 2 ** i)
            for i in range(step + 1)]
