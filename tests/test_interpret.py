"""Interpretability kit tests: saliency family, guided backprop semantics,
Grad-CAM, and the input-optimization visualizations."""

import numpy as np
import pytest

import conftest  # noqa: F401
import jax
import jax.numpy as jnp

from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.interpret import (
    gradcam,
    guided,
    misc,
    optimize,
    saliency,
)
from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.models import (
    resnet,
)

pytestmark = pytest.mark.slow  # aux capability tier (see pyproject markers)

WIDTHS = (8, 8, 8, 8)
BLOCKS = (1, 1, 1, 1)


@pytest.fixture(scope="module")
def small_net():
    params = resnet.init_resnet26(jax.random.PRNGKey(0), embed_dim=3,
                                  widths=WIDTHS, blocks=BLOCKS)
    x = jnp.asarray(np.random.default_rng(0).random((1, 32, 32, 3)),
                    jnp.float32)

    def apply_fn(p, inp, act_fn=None):
        return resnet.apply_resnet26(p, inp, act_fn=act_fn)

    return params, x, apply_fn


def test_vanilla_and_grad_times_image(small_net):
    params, x, apply_fn = small_net
    score = saliency.class_score_fn(apply_fn, params, 1)
    g = saliency.vanilla_backprop(score, x)
    assert g.shape == x.shape
    assert float(jnp.abs(g).sum()) > 0
    gti = saliency.grad_times_image(score, x)
    np.testing.assert_allclose(np.asarray(gti), np.asarray(g * x), atol=1e-6)


def test_integrated_gradients_completeness(small_net):
    """IG's completeness error sum(IG*x) - (f(x) - f(0)) shrinks ~1/steps
    (left-Riemann sum like the reference's integrated_gradients.py)."""
    params, x, apply_fn = small_net
    score = saliency.class_score_fn(apply_fn, params, 0)
    delta = float(score(x) - score(jnp.zeros_like(x)))

    def err(steps):
        ig = saliency.integrated_gradients(score, x, steps=steps)
        return abs(float(jnp.sum(ig * x)) - delta)

    e16, e128 = err(16), err(128)
    assert e128 < e16 / 3  # converging toward completeness
    assert e128 / abs(delta) < 0.25


def test_smooth_grad_averages(small_net):
    params, x, apply_fn = small_net
    score = saliency.class_score_fn(apply_fn, params, 2)
    sg = saliency.smooth_grad(lambda v: saliency.vanilla_backprop(score, v),
                              x, jax.random.PRNGKey(0), param_n=4)
    assert sg.shape == x.shape and np.isfinite(np.asarray(sg)).all()


def test_guided_leaky_relu_clamps_grads():
    x = jnp.asarray([-2.0, -0.5, 0.5, 2.0])

    # forward identical to leaky relu
    np.testing.assert_allclose(
        np.asarray(guided.guided_leaky_relu(x)),
        np.asarray(jnp.where(x >= 0, x, 0.1 * x)))

    # backward: positive input AND positive upstream grad only
    def f(v):
        return jnp.sum(guided.guided_leaky_relu(v) * jnp.asarray(
            [1.0, 1.0, -1.0, 1.0]))

    g = np.asarray(jax.grad(f)(x))
    np.testing.assert_array_equal(g, [0.0, 0.0, 0.0, 1.0])


def test_guided_backprop_and_layer_variant(small_net):
    params, x, _ = small_net
    g = guided.guided_backprop(params, x, 0)
    assert g.shape == x.shape
    g2 = guided.layer_activation_guided_backprop(params, x, "stage2", 3)
    assert g2.shape == x.shape
    pos, neg = misc.get_positive_negative_saliency(np.asarray(g)[0])
    assert pos.min() >= 0 and neg.min() >= 0


def test_gradcam_and_guided_gradcam(small_net):
    params, x, _ = small_net
    for layer in ("stage2", "stage4"):
        cam = gradcam.gradcam(params, x, 1, layer)
        assert cam.shape == (32, 32)
        assert cam.min() >= 0.0 and cam.max() <= 1.0 + 1e-6
    ggc = gradcam.guided_gradcam(params, x, 1)
    assert ggc.shape == (32, 32, 3)


def test_cnn_layer_visualization(small_net):
    params, _, _ = small_net
    img, hist = optimize.cnn_layer_visualization(params, "stage1", 2,
                                                 size=32, steps=4, lr=0.5)
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    assert hist[-1] <= hist[0]  # objective improves (loss decreases)


def test_deep_dream_and_class_generation(small_net):
    params, _, _ = small_net
    rng = np.random.default_rng(1)
    base = rng.integers(0, 256, (32, 32, 3), np.uint8)
    img, _ = optimize.deep_dream(params, base, "stage3", 1, steps=3, lr=1.0)
    assert img.shape == (32, 32, 3)
    gen, hist = optimize.class_specific_image_generation(
        params, 2, size=32, steps=5, lr=0.5)
    assert gen.shape == (32, 32, 3)
    assert hist[-1] < hist[0]


def test_inverted_representation(small_net):
    params, x, _ = small_net
    base = misc.recreate_image(np.asarray(x))
    img, hist = optimize.inverted_representation(params, base, "stage2",
                                                 steps=5, lr=1e-2)
    assert img.shape == (32, 32, 3)
    assert hist[-1] <= hist[0]


def test_misc_helpers(tmp_path):
    rng = np.random.default_rng(0)
    grad = rng.standard_normal((16, 16, 3))
    gray = misc.convert_to_grayscale(grad)
    assert gray.shape == (16, 16) and gray.max() <= 1.0
    heat, overlay = misc.apply_colormap_on_image(
        rng.integers(0, 256, (16, 16, 3), np.uint8), gray)
    assert overlay.shape == (16, 16, 3)
    p = misc.save_gradient_images(grad, str(tmp_path / "g.png"))
    import os

    assert os.path.exists(p)
    # preprocess/recreate round trip
    img = rng.integers(0, 256, (8, 8, 3), np.uint8)
    back = misc.recreate_image(misc.preprocess_image(img))
    np.testing.assert_allclose(back, img, atol=1)
