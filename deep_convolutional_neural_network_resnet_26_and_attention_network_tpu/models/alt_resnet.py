"""Torchvision-template ResNet (the no-norm variant the reference vendors).

The reference keeps a stripped torchvision ResNet snapshot — BatchNorm
removed, plain ReLU, bias-free convs, widths 64/128/256/512 — as the
template its narrow ResNet-26 was derived from, with URL-pretrained loading
(reference: alt_resnet.py:1-165). Rebuilt functionally in NHWC JAX;
``from_torch_state_dict`` converts a locally saved torchvision/reference
state dict into the pytree (no network download — the reference's
``load_state_dict_from_url`` needs egress we don't assume).
"""

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import init as I
from ..ops import nn as N

WIDTHS = (64, 128, 256, 512)


def relu(x):
    return jnp.maximum(x, 0.0)


def _conv_kernel_relu(key, kh, kw, cin, cout):
    """kaiming fan_out for ReLU (gain sqrt(2)) — torchvision's conv init."""
    return I.kaiming_normal(key, (kh, kw, cin, cout), cout * kh * kw,
                            2.0 ** 0.5)


def init_basic_block(key, cin, cout, stride):
    """Bias-free conv pair + optional 1x1 downsample
    (reference: alt_resnet.py:35-68)."""
    k1, k2, k3 = jax.random.split(key, 3)
    p = {"conv1": {"w": _conv_kernel_relu(k1, 3, 3, cin, cout)},
         "conv2": {"w": _conv_kernel_relu(k2, 3, 3, cout, cout)}}
    if stride != 1 or cin != cout:
        p["downsample"] = {"w": _conv_kernel_relu(k3, 1, 1, cin, cout)}
    return p


def apply_basic_block(p, x, stride, *, compute_dtype=None):
    out = relu(N.conv2d(x, p["conv1"]["w"], stride=stride, padding=1,
                        compute_dtype=compute_dtype))
    out = N.conv2d(out, p["conv2"]["w"], stride=1, padding=1,
                   compute_dtype=compute_dtype)
    identity = (N.conv2d(x, p["downsample"]["w"], stride=stride, padding=0,
                         compute_dtype=compute_dtype)
                if "downsample" in p else x)
    return relu(out + identity)


def init_resnet(key, layers: Sequence[int], *, num_classes: int = 1000,
                widths: Sequence[int] = WIDTHS):
    """(reference: alt_resnet.py:71-100)."""
    keys = jax.random.split(key, 2 + sum(layers))
    params = {
        "conv1": {"w": _conv_kernel_relu(keys[0], 7, 7, 3, widths[0])},
        "layers": [],
        "fc": {"w": I.linear_kaiming_fan_in(keys[1], widths[-1], num_classes,
                                            1.0),
               "b": I.zeros((num_classes,))},
    }
    ki, cin = 2, widths[0]
    for stage, (w, n) in enumerate(zip(widths, layers)):
        blocks = []
        for b in range(n):
            stride = 2 if (stage > 0 and b == 0) else 1
            blocks.append(init_basic_block(keys[ki], cin, w, stride))
            ki += 1
            cin = w
        params["layers"].append(blocks)
    return params


def apply_resnet(params, x, *, compute_dtype=None):
    """x [N, H, W, 3] -> logits [N, num_classes]
    (reference: alt_resnet.py:102-120)."""
    h = relu(N.conv2d(x, params["conv1"]["w"], stride=2, padding=3,
                      compute_dtype=compute_dtype))
    h = N.max_pool(h, window=3, stride=2, padding=1)
    for stage, blocks in enumerate(params["layers"]):
        for b, block in enumerate(blocks):
            stride = 2 if (stage > 0 and b == 0) else 1
            h = apply_basic_block(block, h, stride,
                                  compute_dtype=compute_dtype)
    h = N.global_avg_pool(h)
    return N.linear(h, params["fc"]["w"], params["fc"]["b"],
                    compute_dtype=compute_dtype)


def resnet18(key, **kwargs):
    return init_resnet(key, [2, 2, 2, 2], **kwargs)


def resnet34(key, **kwargs):
    return init_resnet(key, [3, 4, 6, 3], **kwargs)


def from_torch_state_dict(params, state_dict):
    """Overlay a torch state dict (tensor or ndarray values, NCHW conv
    kernels [O, I, kh, kw], linear [out, in]) onto an init_resnet pytree —
    the egress-free replacement for pretrained URL loading
    (reference: alt_resnet.py:148-165)."""

    def arr(v):
        return np.asarray(getattr(v, "numpy", lambda: v)())

    out = jax.tree_util.tree_map(lambda x: x, params)
    loaded = []
    for name, value in state_dict.items():
        v = arr(value)
        if name == "conv1.weight":
            out["conv1"]["w"] = jnp.asarray(v.transpose(2, 3, 1, 0))
        elif name == "fc.weight":
            out["fc"]["w"] = jnp.asarray(v.T)
        elif name == "fc.bias":
            out["fc"]["b"] = jnp.asarray(v)
        elif name.startswith("layer"):
            parts = name.split(".")  # layer1.0.conv1.weight
            stage = int(parts[0][5:]) - 1
            block = int(parts[1])
            leaf = parts[2]
            tgt = out["layers"][stage][block]
            if leaf in ("conv1", "conv2") and v.ndim == 4:
                tgt[leaf]["w"] = jnp.asarray(v.transpose(2, 3, 1, 0))
            elif leaf == "downsample" and v.ndim == 4:
                # torchvision's 'layer*.downsample.0.weight' is the 1x1
                # conv; '.downsample.1.*' are BatchNorm vectors (1-D) —
                # this no-norm variant takes only the conv, and the old
                # unconditional 4-axis transpose crashed on the BN keys
                tgt["downsample"]["w"] = jnp.asarray(v.transpose(2, 3, 1, 0))
            else:
                continue
        else:
            continue
        loaded.append(name)
    return out, loaded


# the reference's pretrained weight URLs (reference: alt_resnet.py:11-21)
MODEL_URLS = {
    "resnet18": "https://download.pytorch.org/models/resnet18-5c106cde.pth",
    "resnet34": "https://download.pytorch.org/models/resnet34-333f7ec4.pth",
}


def from_pretrained(params, arch: str = "resnet18", *, url: str = None,
                    progress: bool = True):
    """Overlay torchvision's pretrained ImageNet weights
    (reference: alt_resnet.py:148-165 ``load_state_dict_from_url``).

    Downloads through torch.hub's cache; raises a clear error offline —
    ``from_torch_state_dict`` with a locally saved ``.pth`` is the
    egress-free path."""
    import torch

    url = url or MODEL_URLS[arch]
    try:
        state_dict = torch.hub.load_state_dict_from_url(
            url, progress=progress, map_location="cpu")
    except Exception as e:  # no egress / bad mirror
        raise RuntimeError(
            f"could not fetch pretrained weights from {url}; download the "
            ".pth manually and use from_torch_state_dict(params, "
            "torch.load(path))") from e
    return from_torch_state_dict(params, state_dict)
