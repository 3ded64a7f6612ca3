"""Attention-MIL head: output contract, gating numerics, mask invariance,
training step behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gbmnet  # noqa: F401
from gbmnet.models import attention_mil as amil
from gbmnet.parallel import steps

CFG = amil.MILConfig()
KEYS_13 = {"Aterm", "wROIs", "Bterm", "Mterm", "Fterm", "Aterm_mu",
           "Aterm_var", "loss", "l2", "KLD", "y_pred", "y_pred_hat", "error"}


def small_cfg(**kw):
    return amil.MILConfig(widths=(8, 8, 8, 8), L=80, **kw)


@pytest.fixture(scope="module")
def setup():
    cfg = amil.MILConfig()
    params = amil.init_attention_mil(jax.random.PRNGKey(0), cfg)
    tiles = jax.random.uniform(jax.random.PRNGKey(1), (12, 64, 64, 3))
    return cfg, params, tiles


def test_output_contract(setup):
    cfg, params, tiles = setup
    out = amil.apply_attention_mil(params, tiles, 1, cfg)
    assert set(out.keys()) == KEYS_13
    T = tiles.shape[0]
    assert out["Aterm"].shape == (3, T)
    assert out["wROIs"].shape == (3, T)
    assert out["Bterm"].shape == (T, 1)
    assert out["Mterm"].shape == (3, 1)
    assert out["Fterm"].shape == (T, 80)
    assert out["y_pred"].shape == (1, 3)
    for k in ("loss", "l2", "KLD", "Aterm_mu", "Aterm_var", "error"):
        assert jnp.ndim(out[k]) == 0, k
    # Each attention map is an L1 distribution over tiles
    np.testing.assert_allclose(np.asarray(out["Aterm"]).sum(1), [1, 1, 1],
                               atol=1e-5)
    np.testing.assert_allclose(float(out["y_pred"].sum()), 1.0, atol=1e-6)


def test_gate_formula():
    """A = sigmoid(-10w)*softplus(A_raw) + sigmoid(10w), L1-normed over tiles
    (reference: gbm/model.py:211-213), verified against a direct NumPy
    evaluation of the published formula."""
    cfg = CFG
    params = amil.init_attention_mil(jax.random.PRNGKey(3), cfg)
    H = np.random.RandomState(0).randn(10, 80).astype(np.float32)
    pooled = amil.attention_pool(params, jnp.asarray(H), cfg)

    p = jax.tree_util.tree_map(np.asarray, params)
    mu, var = H.mean(0), H.var(0)
    Hz0 = (H - mu) / np.sqrt(var + 1e-5) * p["context"]["gamma"] + p["context"]["beta"]
    a1 = np.tanh(Hz0 @ p["attention"]["lin1"]["w"] + p["attention"]["lin1"]["b"])
    A_raw = a1 @ p["attention"]["lin2"]["w"] + p["attention"]["lin2"]["b"]
    wm = p["weight_mask"]
    sig = lambda z: 1 / (1 + np.exp(-z))
    gated = sig(-10 * wm) * np.log1p(np.exp(A_raw)) + sig(10 * wm)
    A1 = gated / np.maximum(np.abs(gated).sum(0, keepdims=True), 1e-12)
    np.testing.assert_allclose(np.asarray(pooled["Aterm"]), A1.T, atol=2e-4)

    # decorrelation term: mean over the full KxK gram of the off-diagonal
    A2 = A_raw / np.maximum(np.linalg.norm(A_raw, axis=0, keepdims=True), 1e-12)
    off = 1 - np.eye(3)
    np.testing.assert_allclose(float(pooled["Aterm_var"]),
                               ((A2.T @ A2) * off).mean(), atol=2e-4)
    np.testing.assert_allclose(float(pooled["Aterm_mu"]),
                               0.5 * (A_raw.mean(0) ** 2).sum(), atol=2e-4)


def test_mask_padding_invariance(setup):
    """Padding a bag with masked garbage tiles must not change any output."""
    cfg, params, tiles = setup
    out_ragged = amil.apply_attention_mil(params, tiles, 2, cfg)

    pad = jnp.concatenate([tiles, 7.7 * jnp.ones((4,) + tiles.shape[1:])])
    mask = jnp.concatenate([jnp.ones(12), jnp.zeros(4)])
    out_padded = amil.apply_attention_mil(params, pad, 2, cfg, mask=mask)

    np.testing.assert_allclose(np.asarray(out_padded["y_pred"]),
                               np.asarray(out_ragged["y_pred"]), atol=1e-5)
    np.testing.assert_allclose(float(out_padded["loss"]),
                               float(out_ragged["loss"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_padded["Mterm"]),
                               np.asarray(out_ragged["Mterm"]), atol=1e-5)
    np.testing.assert_allclose(float(out_padded["KLD"]),
                               float(out_ragged["KLD"]), atol=1e-5)
    np.testing.assert_allclose(float(out_padded["Aterm_var"]),
                               float(out_ragged["Aterm_var"]), atol=1e-5)
    # padded tiles carry exactly zero attention
    np.testing.assert_allclose(np.asarray(out_padded["Aterm"])[:, 12:], 0.0,
                               atol=1e-7)


def test_train_subsamples_tiles(setup):
    cfg, params, tiles = setup
    out = amil.apply_attention_mil(params, tiles, 0, cfg, train=True,
                                   rng=jax.random.PRNGKey(7))
    # 20% of 12 tiles -> 2 tiles through the CNN
    assert out["Fterm"].shape[0] == max(1, int(12 * 0.2))


def test_class_weights_change_loss(setup):
    cfg, params, tiles = setup
    out_a = amil.apply_attention_mil(params, tiles, 0, cfg)
    wcfg = amil.MILConfig(class_weights=(3.0, 1.0, 1.0))
    out_b = amil.apply_attention_mil(params, tiles, 0, wcfg)
    assert float(out_b["loss"]) != pytest.approx(float(out_a["loss"]))


def test_gate_coefficients(setup):
    cfg, params, _ = setup
    coef = np.asarray(amil.gate_coefficients(params))
    expected = 1 / (1 + np.exp(-10 * 0.25))
    np.testing.assert_allclose(coef, expected, atol=1e-6)


def test_train_step_updates_params(setup):
    cfg, params, tiles = setup
    state = steps.init_train_state(params)
    step = steps.make_train_step(cfg, donate=False)
    batch_tiles = jnp.stack([tiles, tiles])
    masks = jnp.ones((2, 12))
    labels = jnp.array([0, 1])
    new_state, metrics = step(state, batch_tiles, masks, labels,
                              jnp.float32(2e-4), jax.random.PRNGKey(0))
    assert int(new_state.step) == 1
    # attention weights must move (loss flows through attention + buffer + cnn)
    before = np.asarray(params["attention"]["lin1"]["w"])
    after = np.asarray(new_state.params["attention"]["lin1"]["w"])
    assert not np.allclose(before, after)
    cnn_before = np.asarray(params["cnn"]["conv1"]["w"])
    cnn_after = np.asarray(new_state.params["cnn"]["conv1"]["w"])
    assert not np.allclose(cnn_before, cnn_after)
    assert np.isfinite(float(metrics["loss"]))


def test_eval_deterministic(setup):
    cfg, params, tiles = setup
    ev = steps.make_eval_step(cfg)
    t = jnp.stack([tiles])
    m = jnp.ones((1, 12))
    y = jnp.array([1])
    a = ev(params, t, m, y)
    b = ev(params, t, m, y)
    np.testing.assert_array_equal(np.asarray(a["y_pred"]), np.asarray(b["y_pred"]))


def test_padded_subsample_matches_unpadded_fraction():
    """Train-time 20% subsample must count VALID tiles, not the padded
    bucket size (fix for bucket-dependent training fraction)."""
    import jax

    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.models.attention_mil import (
        _subsample,
    )

    rng = np.random.default_rng(0)
    tiles = jnp.asarray(rng.random((128, 2, 2, 3)), jnp.float32)
    mask = jnp.zeros((128,)).at[:100].set(1.0)  # 100 valid, padded to 128
    _, new_mask = _subsample(tiles, mask, 0.2, jax.random.PRNGKey(0))
    assert int(jnp.sum(new_mask)) == 20  # floor(0.2 * 100), not 25

    # tiny valid count still keeps at least one tile
    mask2 = jnp.zeros((128,)).at[:3].set(1.0)
    _, new_mask2 = _subsample(tiles, mask2, 0.2, jax.random.PRNGKey(1))
    assert int(jnp.sum(new_mask2)) == 1
