"""Input-optimization visualizations: filter maximization, deep dream,
inverted representations, class-specific image generation.

(reference: pytorch-cnn-visualizations-master/src/cnn_layer_visualization.py,
deep_dream.py, inverted_representation.py,
generate_class_specific_samples.py). Each runs plain gradient steps on the
input image with a jitted grad function — hooks become activation taps.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..models import resnet
from . import misc


def _ascend(loss_fn, x0, *, steps: int, lr: float):
    """Gradient DEscent on loss_fn (losses are negated objectives).

    One jitted value_and_grad per step: a separate eager loss_fn(x) call
    just to record history would re-run the whole un-jitted forward and
    dominate the cost. History records the loss at the pre-step x (the
    reference logs at the same point)."""
    vg_fn = jax.jit(jax.value_and_grad(loss_fn))
    x = jnp.asarray(x0)
    history = []
    for i in range(steps):
        val, g = vg_fn(x)
        x = x - lr * g
        history.append(float(val))
    return x, history


def cnn_layer_visualization(params, layer: str, filter_pos: int, *,
                            size: int = 56, steps: int = 30, lr: float = 1.0,
                            rng=None):
    """Gradient-ascent filter maximization: maximize the mean activation of
    one filter at a tap starting from a random image (reference:
    cnn_layer_visualization.py:16-114, visualise_layer_without_hooks).
    Returns (uint8 image, loss history)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    x0 = jax.random.uniform(rng, (1, size, size, 3), minval=-0.14,
                            maxval=0.14)  # ~ uint8(116-180) normalized

    def loss(x):
        _, acts = resnet.apply_resnet26(params, x, taps=True)
        return -jnp.mean(acts[layer][..., filter_pos])

    x, hist = _ascend(loss, x0, steps=steps, lr=lr)
    return misc.recreate_image(np.asarray(x)), hist


def deep_dream(params, image_u8, layer: str, filter_pos: int, *,
               steps: int = 50, lr: float = 12.0):
    """Maximize a filter on a real image with a large LR (reference:
    deep_dream.py:15-70)."""
    x0 = jnp.asarray(misc.preprocess_image(image_u8))

    def loss(x):
        _, acts = resnet.apply_resnet26(params, x, taps=True)
        return -jnp.mean(acts[layer][..., filter_pos])

    x, hist = _ascend(loss, x0, steps=steps, lr=lr)
    return misc.recreate_image(np.asarray(x)), hist


def inverted_representation(params, image_u8, layer: str, *,
                            steps: int = 100, lr: float = 1e-2,
                            alpha_reg_alpha: float = 6.0,
                            alpha_reg_lambda: float = 1e-2,
                            tv_reg_beta: float = 3.0,
                            tv_reg_coeff: float = 1e-2, rng=None):
    """Reconstruct an image from its representation at a tap: euclidean
    match + alpha-norm + total-variation regularizers (reference:
    inverted_representation.py:14-90)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    target_x = jnp.asarray(misc.preprocess_image(image_u8))
    _, target_acts = resnet.apply_resnet26(params, target_x, taps=True)
    target = jax.lax.stop_gradient(target_acts[layer])
    x0 = 1e-1 * jax.random.uniform(rng, target_x.shape)

    def loss(x):
        _, acts = resnet.apply_resnet26(params, x, taps=True)
        euc = jnp.linalg.norm(acts[layer] - target) / jnp.linalg.norm(target)
        # alpha-norm regularizer (reference default alpha=6)
        alpha_reg = alpha_reg_lambda * jnp.sum(
            jnp.abs(x) ** alpha_reg_alpha)
        dh = x[:, 1:, :-1, :] - x[:, :-1, :-1, :]
        dw = x[:, :-1, 1:, :] - x[:, :-1, :-1, :]
        tv = tv_reg_coeff * jnp.sum(
            (dh ** 2 + dw ** 2) ** (tv_reg_beta / 2.0))
        return euc + alpha_reg + tv

    x, hist = _ascend(loss, x0, steps=steps, lr=lr)
    return misc.recreate_image(np.asarray(x)), hist


def class_specific_image_generation(params, target_class: int, *,
                                    size: int = 56, steps: int = 150,
                                    lr: float = 6.0, wd: float = 1e-4,
                                    apply_fn=None, rng=None):
    """Generate an input that maximizes one class logit (reference:
    generate_class_specific_samples.py:15-80)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    apply_fn = apply_fn or resnet.apply_resnet26
    x0 = jax.random.uniform(rng, (1, size, size, 3), minval=-1.0, maxval=1.0)

    def loss(x):
        logits = apply_fn(params, x)
        return -logits[0, target_class] + wd * jnp.sum(x * x)

    x, hist = _ascend(loss, x0, steps=steps, lr=lr)
    return misc.recreate_image(np.asarray(x)), hist
