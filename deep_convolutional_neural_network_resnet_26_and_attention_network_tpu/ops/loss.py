"""Label-smoothed cross-entropy with probabilistic targets.

Rebuilds the reference's CrossEntropyWithProbs / smooth_one_hot /
cross_entropy_with_probs trio (reference: nnBlocks.py:47-138) as pure
functions. The reference simulates prob-target CE by accumulating per-class
F.cross_entropy values; algebraically that is

    loss_i = sum_y target[i, y] * w[y] * (-log_softmax(logits_i)[y])

which is what we compute directly (one fused reduction instead of a
num_classes Python loop).
"""

import jax
import jax.numpy as jnp


def smooth_one_hot(labels, num_classes: int, smoothing: float = 0.0):
    """One-hot with label smoothing: target class gets 1-smoothing, the rest
    share smoothing/(classes-1). labels: int array [...]."""
    assert 0.0 <= smoothing < 1.0
    confidence = 1.0 - smoothing
    off = smoothing / (num_classes - 1)
    one_hot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    return one_hot * (confidence - off) + off


def cross_entropy_with_probs(logits, target_probs, weight=None,
                             reduction: str = "mean"):
    """CE where targets are probabilities; optional per-class weights.

    logits: [N, C]; target_probs: [N, C]; weight: [C] or None.
    reduction: 'none' | 'mean' | 'sum'.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    w = jnp.ones(logits.shape[-1], logp.dtype) if weight is None else weight
    per_point = -jnp.sum(target_probs * w[None, :] * logp, axis=-1)
    if reduction == "none":
        return per_point
    if reduction == "mean":
        return jnp.mean(per_point)
    if reduction == "sum":
        return jnp.sum(per_point)
    raise ValueError("Keyword 'reduction' must be one of ['none', 'mean', 'sum']")


def smoothed_ce_loss(logits, labels, *, num_classes: int, smoothing: float,
                     weight=None, reduction: str = "mean"):
    """CrossEntropyWithProbs equivalent: smooth labels then prob-target CE."""
    target = smooth_one_hot(labels, num_classes, smoothing)
    return cross_entropy_with_probs(logits, target, weight, reduction)
