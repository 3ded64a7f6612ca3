"""Smoothed prob-target cross-entropy: formula and torch parity."""

import jax.numpy as jnp
import numpy as np
import pytest

import gbmnet  # noqa: F401
from gbmnet.ops import loss as L


def test_smooth_one_hot_values():
    t = np.asarray(L.smooth_one_hot(jnp.array([1]), 3, 0.25))
    np.testing.assert_allclose(t, [[0.125, 0.75, 0.125]], atol=1e-7)
    assert abs(t.sum() - 1.0) < 1e-6


def test_smooth_zero_is_one_hot():
    t = np.asarray(L.smooth_one_hot(jnp.array([2, 0]), 3, 0.0))
    np.testing.assert_allclose(t, [[0, 0, 1], [1, 0, 0]], atol=1e-7)


def test_reductions():
    logits = jnp.array([[1.0, 2.0, 0.5], [0.1, 0.2, 0.3]])
    probs = L.smooth_one_hot(jnp.array([0, 2]), 3, 0.25)
    none = L.cross_entropy_with_probs(logits, probs, reduction="none")
    assert none.shape == (2,)
    assert np.isclose(
        float(L.cross_entropy_with_probs(logits, probs, reduction="mean")),
        float(none.mean()))
    assert np.isclose(
        float(L.cross_entropy_with_probs(logits, probs, reduction="sum")),
        float(none.sum()))
    with pytest.raises(ValueError):
        L.cross_entropy_with_probs(logits, probs, reduction="bogus")


def test_torch_parity_weighted():
    """Match the reference's per-class accumulation loop semantics:
    sum_y target[:,y] * w[y] * F.cross_entropy(logits, y)."""
    torch = pytest.importorskip("torch")
    F = torch.nn.functional
    rng = np.random.RandomState(1)
    logits = rng.randn(5, 3).astype(np.float32)
    labels = np.array([0, 2, 1, 1, 0])
    w = np.array([0.7, 1.3, 1.0], np.float32)

    tl = torch.from_numpy(logits)
    target = np.full((5, 3), 0.25 / 2, np.float32)
    target[np.arange(5), labels] = 0.75
    cum = torch.zeros(5)
    for y in range(3):
        y_loss = F.cross_entropy(tl, torch.full((5,), y, dtype=torch.long),
                                 reduction="none")
        cum += torch.from_numpy(target[:, y]) * w[y] * y_loss
    expected = float(cum.mean())

    ours = float(L.smoothed_ce_loss(jnp.asarray(logits), jnp.asarray(labels),
                                    num_classes=3, smoothing=0.25,
                                    weight=jnp.asarray(w)))
    assert abs(ours - expected) < 1e-5
