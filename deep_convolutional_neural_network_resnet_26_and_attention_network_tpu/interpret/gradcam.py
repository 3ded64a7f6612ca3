"""Grad-CAM and guided Grad-CAM over the ResNet-26 activation taps.

(reference: pytorch-cnn-visualizations-master/src/gradcam.py:13-110 and
guided_gradcam.py). The torch version hooks a target conv layer; here the
tap dict ('stem', 'stage1'..'stage4') plays that role, and the
activation-gradient comes from jax.grad through a closure that re-enters
the forward at the tap.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..models import resnet
from . import guided as G


def gradcam(params, x, target_class: int, layer: str = "stage4"):
    """[H, W] class-activation map in [0, 1] at input resolution.

    cam = relu(sum_c mean-grad_c * A_c), min-max normalized then bilinear
    upsampled (reference: gradcam.py generate_cam).
    """
    x = jnp.asarray(x)

    # activations at the tap
    _, acts = resnet.apply_resnet26(params, x, taps=True)
    conv_out = acts[layer]

    # gradient of the class score w.r.t. the tap activation: rerun the tail
    # of the network from the tap
    def from_tap(a):
        h = a
        stages = list(params["stages"])
        layer_order = ["stem", "stage1", "stage2", "stage3", "stage4"]
        start = layer_order.index(layer)
        from ..ops import nn as N

        for stage_idx in range(start, 4):
            for b, block in enumerate(stages[stage_idx]):
                stride = 2 if (stage_idx > 0 and b == 0) else 1
                h = resnet.apply_block(block, h, stride)
        h = N.global_avg_pool(h)
        logits = N.linear(h, params["fc"]["w"])
        return logits[0, target_class]

    grads = jax.grad(from_tap)(conv_out)  # [1, h, w, c]
    weights = jnp.mean(grads[0], axis=(0, 1))  # [c]
    cam = jnp.maximum(jnp.sum(weights * conv_out[0], axis=-1), 0.0)
    cam = (cam - cam.min()) / (cam.max() - cam.min() + 1e-12)
    cam = jax.image.resize(cam, x.shape[1:3], "bilinear")
    return np.asarray(cam)


def guided_gradcam(params, x, target_class: int, layer: str = "stage4"):
    """Elementwise product of the CAM and guided-backprop gradients
    (reference: guided_gradcam.py guided_grad_cam)."""
    cam = gradcam(params, x, target_class, layer)
    gb = np.asarray(G.guided_backprop(params, x, target_class))[0]
    return cam[..., None] * gb
