"""Jitted, shardable train / eval steps for the attention-MIL model.

Semantics mirror the reference training loop (reference:
gbm/classify_combined.py:388-485): Adam(betas=(0.9, 0.999)), gradient
accumulation over ``accum`` slides before each optimizer step (reference
uses 5), staged learning rate passed in per call. Accumulating grads over B
bags then stepping once is exactly ``grad(sum of the B per-bag losses)``,
so here the B bags are a *batched* axis — vmapped, and shardable over the
"slides" mesh axis — instead of a sequential Python loop.

Each bag's tile axis may additionally shard over the "tiles" mesh axis; the
model's tile reductions then lower to ICI collectives via GSPMD. No manual
psum appears here — the shardings on the inputs are the whole distribution
strategy.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..models import attention_mil as amil
from . import mesh as M


class TrainState(NamedTuple):
    params: dict
    opt_state: tuple
    step: jnp.ndarray  # int32 optimizer-step counter


def make_optimizer():
    """Adam matching torch.optim.Adam(betas=(0.9,0.999), eps=1e-8); the
    learning rate is applied separately so the staged schedule can feed it
    per-call without retracing."""
    return optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)


def make_optimizer_legacy():
    """Adam with the legacy driver's betas (reference:
    gbm/classify.py:374, betas=(0.9, 0.99)); lr and per-group multipliers
    are applied by the caller."""
    return optax.scale_by_adam(b1=0.9, b2=0.99, eps=1e-8)


def init_train_state(params, tx=None) -> TrainState:
    tx = tx or make_optimizer()
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))


def _apply(tx, state: TrainState, grads, lr) -> TrainState:
    """The ONE update rule (Adam moments from raw grads, step scaled by
    lr) shared by the batched train step and the sequential
    accumulate-then-step path — change it here and both paths move."""
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1)


def batched_forward(params, tiles, masks, labels, cfg, *, train, rng=None,
                    compute_dtype=None, extractor=None):
    """vmapped bag forward: tiles [B,T,H,W,3], masks [B,T], labels [B].
    ``extractor`` swaps the tile embedder per bag (serving, e.g. int8)."""
    B = tiles.shape[0]
    if train:
        keys = jax.random.split(rng, B)
    else:
        keys = jnp.zeros((B, 2), jnp.uint32)  # unused

    def per_bag(bag, mask, label, key):
        return amil.apply_attention_mil(
            params, bag, label, cfg, mask=mask,
            train=train, rng=key if train else None,
            compute_dtype=compute_dtype, extractor=extractor)

    return jax.vmap(per_bag)(tiles, masks, labels, keys)


def make_train_step(cfg: amil.MILConfig, tx=None, *, compute_dtype=None,
                    donate: bool = True):
    """Returns jitted step(state, tiles, masks, labels, lr, rng) -> (state, metrics).

    The batch dimension B plays the role of the reference's 5-slide gradient
    accumulation window: loss = sum of per-bag CE, one Adam step.
    """
    tx = tx or make_optimizer()

    def step(state: TrainState, tiles, masks, labels, lr, rng,
             bag_weights=None):
        """``bag_weights`` (optional [B] 0/1 floats) zeroes dummy bags so a
        partial accumulation window can pad to the compiled batch size
        without contributing gradients or metrics."""
        def loss_fn(params):
            outs = batched_forward(params, tiles, masks, labels, cfg,
                                   train=True, rng=rng,
                                   compute_dtype=compute_dtype)
            if bag_weights is None:
                return outs["loss"].sum(), outs
            return (outs["loss"] * bag_weights).sum(), outs

        (_, outs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = _apply(tx, state, grads, lr)
        if bag_weights is None:
            mean = lambda x: x.mean()  # noqa: E731
        else:
            denom = jnp.maximum(bag_weights.sum(), 1.0)
            mean = lambda x: (x * bag_weights).sum() / denom  # noqa: E731
        y_pred_hat = outs["y_pred_hat"]
        if bag_weights is not None:
            # dummy padded bags must not look like real predictions:
            # their y_pred_hat is flagged -1 (y_pred stays raw per-slot;
            # slice real bags before consuming it)
            y_pred_hat = jnp.where(bag_weights > 0, y_pred_hat, -1)
        metrics = {
            "loss": mean(outs["loss"]),
            "error": mean(outs["error"]),
            "Aterm_mu": mean(outs["Aterm_mu"]),
            "Aterm_var": mean(outs["Aterm_var"]),
            "KLD": mean(outs["KLD"]),
            "l2": mean(outs["l2"]),
            "y_pred": outs["y_pred"],
            "y_pred_hat": y_pred_hat,
        }
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_bag_forward(cfg: amil.MILConfig, *, train: bool = False,
                     compute_dtype=None, use_pallas_pool: bool = False,
                     extractor=None):
    """Jitted single-bag forward: fn(params, tiles, mask, label[, rng]) -> dict.

    Retraces once per padded bucket size; used by the sequential driver
    (validate / visualize / interface paths). ``use_pallas_pool`` switches
    either mode onto the fused Pallas pooling kernel (its custom VJP makes
    it valid under training; oversized bags auto-fall back). ``extractor``
    swaps the tile embedder (e.g. the W8A8 int8 serving path,
    ``ops.quant.make_int8_extractor``, or the legacy GAN discriminator)."""

    if train:
        def fwd(params, tiles, mask, label, rng):
            return amil.apply_attention_mil(params, tiles, label, cfg,
                                            mask=mask, train=True, rng=rng,
                                            compute_dtype=compute_dtype,
                                            use_pallas_pool=use_pallas_pool,
                                            extractor=extractor)
    else:
        def fwd(params, tiles, mask, label):
            return amil.apply_attention_mil(params, tiles, label, cfg,
                                            mask=mask, train=False,
                                            compute_dtype=compute_dtype,
                                            use_pallas_pool=use_pallas_pool,
                                            extractor=extractor)
    return jax.jit(fwd)


def make_bag_grad(cfg: amil.MILConfig, *, compute_dtype=None):
    """Jitted per-bag loss gradient: fn(params, tiles, mask, label, rng)
    -> (outputs dict, grads). One call = one ``loss.backward()`` of the
    reference's hot loop (reference: gbm/classify_combined.py:446-447)."""

    def grad_fn(params, tiles, mask, label, rng):
        def loss_fn(p):
            outs = amil.apply_attention_mil(p, tiles, label, cfg, mask=mask,
                                            train=True, rng=rng,
                                            compute_dtype=compute_dtype)
            return outs["loss"], outs

        (_, outs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return outs, grads

    return jax.jit(grad_fn)


def make_accumulate():
    """Jitted grad sum: (acc, grads) -> acc + grads."""
    return jax.jit(
        lambda acc, g: jax.tree_util.tree_map(jnp.add, acc, g))


def zeros_like_grads(params):
    return jax.tree_util.tree_map(jnp.zeros_like, params)


def make_apply_updates(tx=None):
    """Jitted optimizer application: (state, grad_sum, lr) -> state.

    Mirrors ``optimizer.step()`` after 5 accumulated bags (reference:
    gbm/classify_combined.py:450-454); Adam moments update from the raw
    accumulated gradient, the step size scales by lr."""
    tx = tx or make_optimizer()
    return jax.jit(lambda state, grads, lr: _apply(tx, state, grads, lr))


def make_eval_step(cfg: amil.MILConfig, *, compute_dtype=None):
    """Returns jitted eval(params, tiles, masks, labels) -> per-bag outputs."""

    def step(params, tiles, masks, labels):
        outs = batched_forward(params, tiles, masks, labels, cfg,
                               train=False, compute_dtype=compute_dtype)
        outs.pop("Fterm", None)  # large; fetch via heatmap path when needed
        return outs

    return jax.jit(step)


def shard_batch(mesh, tiles, masks, labels):
    """device_put a batch with (slides, tiles) shardings."""
    tiles = jax.device_put(tiles, M.bag_batch_sharding(mesh))
    masks = jax.device_put(masks, M.mask_sharding(mesh))
    labels = jax.device_put(labels, M.label_sharding(mesh))
    return tiles, masks, labels


def replicate_state(mesh, state: TrainState) -> TrainState:
    rep = M.replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state)
