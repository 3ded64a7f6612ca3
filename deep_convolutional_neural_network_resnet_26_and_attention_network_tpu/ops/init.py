"""Parameter initializers reproducing the reference's PyTorch init semantics.

The reference resets every layer explicitly (reference: gbm/model.py:161-181):
  * Conv2d:   kaiming_normal_(mode='fan_out', nonlinearity='leaky_relu', a=0.1)
  * Linear in a module whose name contains 'attention':
              kaiming_normal_(mode='fan_in', nonlinearity='tanh')
  * Linear named 'classifier' (the buffer head): xavier_normal_
  * other Linear: kaiming_normal_(mode='fan_in', nonlinearity='leaky_relu', a=0.1)
  * all biases: zeros

Gains follow torch.nn.init.calculate_gain:
  leaky_relu(a): sqrt(2 / (1 + a^2));   tanh: 5/3;   linear/identity: 1.
Weight layouts are JAX-native: conv kernels HWIO, linears [in, out].
"""

import math

import jax
import jax.numpy as jnp


def leaky_relu_gain(negative_slope: float = 0.1) -> float:
    return math.sqrt(2.0 / (1.0 + negative_slope ** 2))


TANH_GAIN = 5.0 / 3.0


def kaiming_normal(key, shape, fan: int, gain: float, dtype=jnp.float32):
    """N(0, (gain/sqrt(fan))^2) — matches torch.nn.init.kaiming_normal_."""
    std = gain / math.sqrt(fan)
    return std * jax.random.normal(key, shape, dtype)


def conv_kernel(key, kh, kw, cin, cout, negative_slope=0.1, dtype=jnp.float32):
    """Conv kernel HWIO with torch fan_out = cout*kh*kw (mode='fan_out')."""
    fan_out = cout * kh * kw
    return kaiming_normal(
        key, (kh, kw, cin, cout), fan_out, leaky_relu_gain(negative_slope), dtype
    )


def linear_kaiming_fan_in(key, cin, cout, gain, dtype=jnp.float32):
    """Linear weight [in, out], kaiming fan_in (torch fan_in = cin)."""
    return kaiming_normal(key, (cin, cout), cin, gain, dtype)


def linear_xavier_normal(key, cin, cout, dtype=jnp.float32):
    """Linear weight [in, out], xavier normal: std = sqrt(2/(fan_in+fan_out))."""
    std = math.sqrt(2.0 / (cin + cout))
    return std * jax.random.normal(key, (cin, cout), dtype)


def zeros(shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)
