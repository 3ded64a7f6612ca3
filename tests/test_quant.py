"""int8 post-training quantization of the extractor (ops/quant.py).

Serving-side TPU extension (no reference counterpart): W8A8 symmetric
PTQ with per-output-channel weight scales and static per-tensor
activation scales. These tests pin the numerics contract on CPU; the
TPU throughput A/B lives in tools/exp_int8.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.models import (
    attention_mil as amil,
    resnet as R,
)
from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.ops import (
    quant as Q,
)


@pytest.fixture(scope="module")
def full_width_setup():
    params = R.init_resnet26(jax.random.PRNGKey(0))
    calib = jax.random.uniform(jax.random.PRNGKey(2), (64, 64, 64, 3))
    qp, sc = Q.quantize_and_calibrate(params, calib)
    return params, qp, sc


def test_weight_quantization_roundtrip(full_width_setup):
    """Dequantized int8 weights sit within half a quantization step of the
    originals, per output channel."""
    params, qp, _ = full_width_setup
    w = np.asarray(params["conv1"]["w"], np.float64)
    wq = np.asarray(qp["conv1"]["wq"], np.float64)
    sw = np.asarray(qp["conv1"]["sw"], np.float64)
    err = np.abs(wq * sw - w)
    assert err.max() <= 0.5 * sw.max() + 1e-9
    # per-channel scales actually differ across channels
    assert np.std(sw) > 0


def test_int8_conv_site_matches_f32_on_grid():
    """The int32-accumulated int8 conv is bit-exact vs the same conv done
    in f32 on the quantized grid (no hidden saturation/rounding)."""
    key = jax.random.PRNGKey(3)
    x = jax.random.randint(key, (4, 16, 16, 8), -127, 128).astype(jnp.int8)
    w = jax.random.randint(jax.random.fold_in(key, 1), (3, 3, 8, 16),
                           -127, 128).astype(jnp.int8)
    site = {"wq": w, "sw": jnp.ones((16,), jnp.float32),
            "b": jnp.zeros((16,), jnp.float32)}
    out = Q._conv_i8(site, x, jnp.float32(1.0), stride=1, padding=1)
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.ops import nn as N

    ref = N.conv2d(x.astype(jnp.float32), w.astype(jnp.float32),
                   stride=1, padding=1)
    assert jnp.all(out == ref)


def test_quantized_embeddings_close_to_f32(full_width_setup):
    """Through all 26 no-norm layers at full widths, the quantized
    embeddings stay tightly aligned with the f32 forward."""
    params, qp, sc = full_width_setup
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 64, 64, 3))
    ref = np.asarray(R.apply_resnet26(params, x), np.float64)
    out = np.asarray(Q.apply_resnet26_int8(qp, sc, x), np.float64)
    cos = np.sum(ref * out, -1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(out, axis=-1))
    rel = np.linalg.norm(ref - out, axis=-1) / np.linalg.norm(ref, axis=-1)
    # measured on random-init full-width nets: cos ~0.9995, rel ~2.5%
    assert cos.min() > 0.995
    assert rel.max() < 0.08


def test_int8_dot_impl_bit_exact_vs_conv(full_width_setup):
    """The im2col+dot_general lowering is the SAME integer math as the
    int8 conv — int32 accumulation cannot overflow at these fan-ins
    (3x3x80 worst case ~12M << 2^31), so reordering the adds is exact
    and the two impls must agree bit for bit."""
    params, qp, sc = full_width_setup
    x = jax.random.uniform(jax.random.PRNGKey(5), (4, 64, 64, 3))
    a = Q.apply_resnet26_int8(qp, sc, x)
    for impl in ("dot", "shift"):
        b = Q.apply_resnet26_int8(qp, sc, x, impl=impl)
        assert jnp.all(a == b), impl


def test_int8_extractor_slide_probability_drift():
    """Plugged into the full MIL head, the int8 extractor moves slide
    probabilities by well under the 1e-3 parity budget and preserves the
    argmax (random-init; measured drift ~2e-4)."""
    cfg = amil.MILConfig()
    params = amil.init_attention_mil(jax.random.PRNGKey(0), cfg)
    tiles = jax.random.uniform(jax.random.PRNGKey(1), (48, 64, 64, 3))
    calib = jax.random.uniform(jax.random.PRNGKey(2), (64, 64, 64, 3))
    ext = Q.make_int8_extractor(params["cnn"], calib)
    ref = amil.apply_attention_mil(params, tiles, 1, cfg)["y_pred"]
    out = amil.apply_attention_mil(params, tiles, 1, cfg,
                                   extractor=ext)["y_pred"]
    assert float(jnp.max(jnp.abs(ref - out))) < 2e-3
    assert int(jnp.argmax(ref)) == int(jnp.argmax(out))


@pytest.mark.slow
def test_int8_drift_on_trained_net():
    """Random-init drift is not serving evidence — a TRAINED net has
    structured activations whose range the static scales must cover.
    Train the tiny config to separate color-separable bags (the
    test_learnability dynamics), quantize the trained extractor with
    calibration tiles drawn from the same distribution, and require the
    quantized serving path to agree: same argmax on every fresh bag,
    probabilities within a tight drift bound."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.parallel import (
        steps,
    )

    COLORS = {0: (150, 60, 170), 1: (80, 150, 90), 2: (70, 90, 180)}
    rng = np.random.default_rng(0)

    def bag(cls, t=24, res=16):
        c = np.array(COLORS[cls], np.float32) / 127.5 - 1
        return jnp.asarray(c + rng.normal(0, 0.2, (t, res, res, 3))
                           .astype(np.float32))

    cfg = amil.MILConfig(widths=(8, 8, 8, 8), blocks=(1, 1, 1, 1))
    state = steps.init_train_state(
        amil.init_attention_mil(jax.random.PRNGKey(0), cfg))
    grad_fn = steps.make_bag_grad(cfg)
    acc = steps.make_accumulate()
    apply_u = steps.make_apply_updates()
    key = jax.random.PRNGKey(1)
    for _ in range(150):
        g = steps.zeros_like_grads(state.params)
        for cls in range(3):
            key, k = jax.random.split(key)
            _, grads = grad_fn(state.params, bag(cls), jnp.ones((24,)),
                               jnp.int32(cls), k)
            g = acc(g, grads)
        state = apply_u(state, g, jnp.float32(2e-4))

    calib = jnp.concatenate([bag(c) for c in range(3)], axis=0)
    ext = Q.make_int8_extractor(state.params["cnn"], calib)
    fwd_f32 = steps.make_bag_forward(cfg)
    fwd_i8 = steps.make_bag_forward(cfg, extractor=ext)

    drifts = []
    for cls in range(3):
        for _ in range(4):
            tiles = bag(cls)
            ref = fwd_f32(state.params, tiles, jnp.ones((24,)),
                          jnp.int32(cls))
            out = fwd_i8(state.params, tiles, jnp.ones((24,)),
                         jnp.int32(cls))
            assert int(ref["y_pred_hat"]) == int(out["y_pred_hat"])
            drifts.append(float(jnp.max(jnp.abs(ref["y_pred"]
                                                - out["y_pred"]))))
    # measured on this trained tiny net: max drift ~1e-3..1e-2 range;
    # pin an order of magnitude of headroom
    assert max(drifts) < 0.05, drifts


def test_calibration_scales_share_block_input(full_width_setup):
    """conv1 and downsample of a transition block consume the same tensor;
    the scales pytree carries exactly one scale for it (no downsample key),
    and every scale is a positive scalar."""
    _, _, sc = full_width_setup
    for stage in sc["stages"]:
        for block_scales in stage:
            assert set(block_scales) == {"conv1", "conv2"}
    for leaf in jax.tree_util.tree_leaves(sc):
        assert leaf.shape == ()
        assert float(leaf) > 0
