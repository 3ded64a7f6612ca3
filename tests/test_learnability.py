"""End-to-end learning dynamics: on color-separable synthetic bags the
full training step (grad accumulation + Adam at the reference's main-stage
lr) must reduce the loss and classify held-out bags correctly."""

import numpy as np

import conftest  # noqa: F401
import jax
import jax.numpy as jnp

from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.models import (
    attention_mil as amil,
)
from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.parallel import (
    steps,
)

COLORS = {0: (150, 60, 170), 1: (80, 150, 90), 2: (70, 90, 180)}


def _bag(rng, cls, t=24, res=16):
    c = np.array(COLORS[cls], np.float32) / 127.5 - 1
    return jnp.asarray(c + rng.normal(0, 0.2, (t, res, res, 3))
                       .astype(np.float32))


def test_training_learns_separable_classes():
    rng = np.random.default_rng(0)
    cfg = amil.MILConfig(widths=(8, 8, 8, 8), blocks=(1, 1, 1, 1))
    state = steps.init_train_state(
        amil.init_attention_mil(jax.random.PRNGKey(0), cfg))
    grad_fn = steps.make_bag_grad(cfg)
    acc = steps.make_accumulate()
    apply_u = steps.make_apply_updates()
    key = jax.random.PRNGKey(1)

    losses = []
    for step in range(200):
        g = steps.zeros_like_grads(state.params)
        total = 0.0
        for cls in range(3):
            key, k = jax.random.split(key)
            outs, grads = grad_fn(state.params, _bag(rng, cls),
                                  jnp.ones((24,)), jnp.int32(cls), k)
            g = acc(g, grads)
            total += float(outs["loss"])
        state = apply_u(state, g, jnp.float32(2e-4))
        losses.append(total / 3)

    assert losses[-1] < losses[0] - 0.03, (losses[0], losses[-1])

    fwd = steps.make_bag_forward(cfg)
    correct = sum(
        int(fwd(state.params, _bag(rng, c), jnp.ones((24,)),
                jnp.int32(c))["y_pred_hat"]) == c
        for c in range(3) for _ in range(4))
    assert correct >= 10, correct  # 12 fresh bags
