"""Gradient-based saliency: vanilla backprop, grad x image, integrated
gradients, and smooth-grad averaging.

(reference: pytorch-cnn-visualizations-master/src/vanilla_backprop.py,
grad_times_image.py, integrated_gradients.py, smooth_grad.py)

Every technique takes ``score_fn(x) -> scalar`` — typically
``lambda x: apply_fn(params, x)[0, target_class]`` — so it works with the
ResNet-26 tile classifier, the attention-MIL model, or any jittable net.
"""

import jax
import jax.numpy as jnp
import numpy as np


def class_score_fn(apply_fn, params, target_class: int):
    """score_fn for a logits-producing apply(params, x [N,H,W,C])."""
    def score(x):
        return apply_fn(params, x)[0, target_class]

    return score


def vanilla_backprop(score_fn, x):
    """d(score)/d(input) (reference: vanilla_backprop.py)."""
    return jax.grad(score_fn)(jnp.asarray(x))


def grad_times_image(score_fn, x):
    """Gradient * input (reference: grad_times_image.py)."""
    x = jnp.asarray(x)
    return vanilla_backprop(score_fn, x) * x


def generate_images_on_linear_path(x, steps: int):
    """Blank -> input interpolation (reference: integrated_gradients.py)."""
    return [x * (i / steps) for i in range(steps)]


def integrated_gradients(score_fn, x, steps: int = 100):
    """Riemann-sum path integral of gradients from a black image
    (reference: integrated_gradients.py generate_integrated_gradients)."""
    x = jnp.asarray(x)
    grad_fn = jax.jit(jax.grad(score_fn))
    total = jnp.zeros_like(x)
    for xbar in generate_images_on_linear_path(x, steps):
        total = total + grad_fn(xbar) / steps
    return total


def smooth_grad(grad_technique, x, rng, *, param_n: int = 50,
                param_sigma_multiplier: float = 4.0):
    """Average a gradient technique over noisy copies of the input
    (reference: smooth_grad.py generate_smooth_grad): noise std =
    sigma_mult / (max - min) of the input."""
    x = jnp.asarray(x)
    sigma = param_sigma_multiplier / (float(x.max()) - float(x.min()) + 1e-12)
    total = jnp.zeros_like(x)
    for k in jax.random.split(rng, param_n):
        noisy = x + sigma * jax.random.normal(k, x.shape)
        total = total + grad_technique(noisy)
    return total / param_n
