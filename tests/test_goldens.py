"""Golden-value regression: the tiny attention-MIL forward must reproduce
frozen outputs exactly (CPU, fixed PRNG). Guards the numerics against
silent drift across refactors — if a change is INTENTIONAL, regenerate
tests/goldens/attention_mil_tiny.npz (recipe in the file's git history)."""

import os

import numpy as np

import conftest  # noqa: F401
import jax
import jax.numpy as jnp

from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.models import (
    attention_mil as amil,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "attention_mil_tiny.npz")


def test_forward_matches_golden():
    cfg = amil.MILConfig(widths=(8, 12, 12, 16), blocks=(1, 1, 1, 1),
                         L=16, D=8)
    params = amil.init_attention_mil(jax.random.PRNGKey(42), cfg)
    rng = np.random.default_rng(123)
    tiles = jnp.asarray(rng.standard_normal((12, 32, 32, 3)), jnp.float32)
    out = amil.apply_attention_mil(params, tiles, 1, cfg, train=False)
    g = np.load(GOLDEN)
    np.testing.assert_allclose(np.asarray(out["y_pred"]), g["y_pred"],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["Mterm"]), g["Mterm"],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["Aterm"]), g["Aterm"],
                               atol=1e-6)
    np.testing.assert_allclose(float(out["loss"]), float(g["loss"]),
                               atol=1e-6)
    np.testing.assert_allclose(float(out["KLD"]), float(g["KLD"]), atol=1e-6)
    np.testing.assert_allclose(float(out["Aterm_var"]), float(g["Aterm_var"]),
                               atol=1e-6)


def test_gbmnet_alias_submodules():
    """The short alias must resolve every subpackage to the same modules."""
    import gbmnet
    import gbmnet.data.loader as alias_loader
    import gbmnet.models.resnet as alias_resnet

    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.data import (
        loader,
    )
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.models import (
        resnet,
    )

    assert alias_loader is loader
    assert alias_resnet is resnet
    assert gbmnet.models.attention_mil.MILConfig is amil.MILConfig


def test_fullwidth_forward_matches_golden():
    """Production-width (20/40/60/80, L=80) forward at 300px must
    reproduce frozen outputs — the tiny golden alone would miss drift in
    the full-width init/arch path. Regenerate recipe: this file's git
    history (fixed PRNGKey(7) params, default_rng(2024) tiles)."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.models import (
        resnet,
    )

    g = np.load(os.path.join(os.path.dirname(__file__), "goldens",
                             "attention_mil_fullwidth.npz"))
    cfg = amil.MILConfig()
    params = amil.init_attention_mil(jax.random.PRNGKey(7), cfg)
    rng = np.random.default_rng(2024)
    tiles = jnp.asarray(rng.standard_normal((4, 300, 300, 3)), jnp.float32)
    out = amil.apply_attention_mil(params, tiles, 2, cfg, train=False)
    np.testing.assert_allclose(np.asarray(out["y_pred"]), g["y_pred"],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["Mterm"]), g["Mterm"],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["Aterm"]), g["Aterm"],
                               atol=1e-6)
    np.testing.assert_allclose(float(out["loss"]), float(g["loss"]),
                               atol=1e-6)
    emb = resnet.apply_resnet26(params["cnn"], tiles)
    np.testing.assert_allclose(np.asarray(emb), g["emb"], atol=1e-5)
