"""ResNet-26 extractor: shapes, architecture, and PyTorch numerical parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gbmnet  # noqa: F401  (alias bootstrap)
from gbmnet.models import resnet


def test_output_shape_and_dtype():
    params = resnet.init_resnet26(jax.random.PRNGKey(0))
    x = jnp.zeros((4, 300, 300, 3))
    out = resnet.apply_resnet26(params, x)
    assert out.shape == (4, 80)
    assert out.dtype == jnp.float32


def test_26_weighted_layers():
    params = resnet.init_resnet26(jax.random.PRNGKey(0))
    n_convs = 1  # stem
    for stage in params["stages"]:
        for block in stage:
            n_convs += 2  # conv1, conv2 (downsample 1x1 is a shortcut, not
            # counted in the reference's "26-layer" naming)
    assert n_convs + 1 == 26  # + fc


def test_stage_widths():
    params = resnet.init_resnet26(jax.random.PRNGKey(0))
    widths = [stage[-1]["conv2"]["w"].shape[-1] for stage in params["stages"]]
    assert widths == [20, 40, 60, 80]
    # downsample shortcuts only where stride/width changes: stages 2-4 block 0
    assert "downsample" not in params["stages"][0][0]
    for s in (1, 2, 3):
        assert "downsample" in params["stages"][s][0]
        assert "downsample" not in params["stages"][s][1]


def test_small_input_shapes():
    params = resnet.init_resnet26(jax.random.PRNGKey(1))
    for hw in (64, 128):
        out = resnet.apply_resnet26(params, jnp.zeros((2, hw, hw, 3)))
        assert out.shape == (2, 80)


def test_init_statistics():
    """Conv kernels should match kaiming fan_out std for leaky_relu(0.1)."""
    params = resnet.init_resnet26(jax.random.PRNGKey(2))
    w = params["stages"][3][0]["conv1"]["w"]  # 3x3x60x80
    fan_out = 80 * 9
    expected_std = np.sqrt(2.0 / (1.0 + 0.01)) / np.sqrt(fan_out)
    assert abs(float(w.std()) - expected_std) / expected_std < 0.05
    assert float(jnp.abs(params["conv1"]["b"]).max()) == 0.0


def _torch_forward(params, x_nhwc):
    """Independent PyTorch re-execution of the same architecture from the
    JAX parameter pytree, used as a numerical oracle."""
    torch = pytest.importorskip("torch")
    F = torch.nn.functional

    def t(a):
        return torch.from_numpy(np.asarray(a))

    def conv(x, p, stride, padding, bias=True):
        w = t(p["w"]).permute(3, 2, 0, 1)  # HWIO -> OIHW
        b = t(p["b"]) if bias and "b" in p else None
        return F.conv2d(x, w, b, stride=stride, padding=padding)

    x = t(x_nhwc).permute(0, 3, 1, 2)
    x = F.leaky_relu(conv(x, params["conv1"], 2, 3), 0.1)
    x = F.max_pool2d(x, 3, stride=2, padding=1)
    for si, stage in enumerate(params["stages"]):
        for bi, blk in enumerate(stage):
            stride = 2 if (si > 0 and bi == 0) else 1
            out = F.leaky_relu(conv(x, blk["conv1"], stride, 1), 0.1)
            out = conv(out, blk["conv2"], 1, 1)
            if "downsample" in blk:
                x = conv(x, blk["downsample"], stride, 0, bias=False)
            x = F.leaky_relu(out + x, 0.1)
    x = x.mean(dim=(2, 3))
    return (x @ t(params["fc"]["w"])).numpy()


def test_torch_parity():
    params = resnet.init_resnet26(jax.random.PRNGKey(3))
    x = np.random.RandomState(0).rand(2, 96, 96, 3).astype(np.float32)
    ours = np.asarray(resnet.apply_resnet26(params, jnp.asarray(x)))
    theirs = _torch_forward(jax.tree_util.tree_map(np.asarray, params), x)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_s2d_stem_matches_conv7():
    """The space-to-depth stem fast path computes the identical sum of
    products as conv7x7 s2 p3 — f32 values and gradients must agree to
    float-reassociation tolerance, including at the zero-padded borders."""
    params = resnet.init_resnet26(jax.random.PRNGKey(3))
    rng = np.random.default_rng(11)
    for hw in (300, 128, 32):
        x = jnp.asarray(rng.standard_normal((2, hw, hw, 3)), jnp.float32)
        a = resnet.apply_stem(params, x)
        b = resnet.apply_stem(params, x, stem="s2d")
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)

    # full forward + gradient wrt stem weights
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)

    def loss(p, stem):
        return jnp.sum(resnet.apply_resnet26(p, x, stem=stem) ** 2)

    la, ga = jax.value_and_grad(loss)(params, "conv7")
    lb, gb = jax.value_and_grad(loss)(params, "s2d")
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-5)
    # float reassociation through 26 layers: a few elements drift to ~2e-3
    # relative; the math is the identical sum of products
    np.testing.assert_allclose(np.asarray(ga["conv1"]["w"]),
                               np.asarray(gb["conv1"]["w"]),
                               atol=1e-2, rtol=1e-2)


def test_s2d_stem_odd_size_falls_back():
    params = resnet.init_resnet26(jax.random.PRNGKey(3))
    x = jnp.zeros((1, 31, 31, 3), jnp.float32)
    a = resnet.apply_stem(params, x)
    b = resnet.apply_stem(params, x, stem="s2d")  # odd -> conv7 fallback
    assert a.shape == b.shape
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
