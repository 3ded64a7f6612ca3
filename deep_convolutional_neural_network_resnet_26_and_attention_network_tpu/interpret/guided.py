"""Guided backpropagation via a custom-VJP activation.

The reference clamps gradients in backward ReLU hooks — zero wherever the
forward output was non-positive OR the incoming gradient is negative
(reference: pytorch-cnn-visualizations-master/src/guided_backprop.py:15-99,
relu_backward_hook_function). JAX has no hooks; the same semantics become a
``jax.custom_vjp`` activation swapped into the forward.
"""

import jax
import jax.numpy as jnp

from ..models import resnet
from ..ops import nn as N


@jax.custom_vjp
def guided_leaky_relu(x, negative_slope=N.LEAKY_SLOPE):
    return jnp.where(x >= 0, x, negative_slope * x)


def _fwd(x, negative_slope):
    return guided_leaky_relu(x, negative_slope), (x,)


def _bwd(res, g):
    (x,) = res
    # guided: pass gradient only where forward input was positive AND the
    # incoming gradient is positive
    guided = jnp.where((x > 0) & (g > 0), g, 0.0)
    return guided, None


guided_leaky_relu.defvjp(_fwd, _bwd)


def guided_backprop(params, x, target_class: int, *, apply_fn=None):
    """Input-gradient with guided activations. params: ResNet-26 pytree by
    default; apply_fn overrides for other models (must accept act_fn)."""
    apply_fn = apply_fn or resnet.apply_resnet26

    def score(inp):
        logits = apply_fn(params, inp, act_fn=guided_leaky_relu)
        return logits[0, target_class]

    return jax.grad(score)(jnp.asarray(x))


def layer_activation_guided_backprop(params, x, layer: str, filter_pos: int):
    """Gradient of one filter's mean activation at a tap, guided
    (reference: layer_activation_with_guided_backprop.py)."""

    def score(inp):
        _, acts = resnet.apply_resnet26(params, inp, taps=True,
                                        act_fn=guided_leaky_relu)
        return acts[layer][..., filter_pos].mean()

    return jax.grad(score)(jnp.asarray(x))
