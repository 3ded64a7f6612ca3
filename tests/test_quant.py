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
