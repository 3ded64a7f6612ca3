"""Gated attention multiple-instance-learning head over bags of tile features.

Capability parity with the reference's Attention model
(reference: gbm/model.py:89-264), rebuilt functionally for TPU:

  pipeline (one bag of T tiles):
    H  = ResNet26(tiles)                               [T, L=80]
    Hm0, Hz0 = ContextLayer(H)   # lrelu+dropout branch, per-bag batchnorm branch
    A_raw = Linear(L,D) -> tanh -> Linear(D,K)          [T, K=3]
    gate:  sigmoid(-10*w) * softplus(A_raw) + sigmoid(10*w)   (learnable w, init 0.25)
    A = L1-normalize(gate, over tiles) -> transpose     [K, T]
    B = Linear(L,D) -> lrelu -> Linear(D,1)             [T, 1]
    M = A @ B                                           [K, 1] -> logits [1, K]
    y_pred = softmax(logits); loss = smoothed CE (smoothing 0.25, class weights)

  diagnostics returned in the same 13-key dict as the reference
  (reference: gbm/model.py:249-263): Aterm, wROIs, Bterm, Mterm, Fterm,
  Aterm_mu, Aterm_var, loss, l2, KLD, y_pred, y_pred_hat, error.

TPU-first deviations from the reference implementation (not behavior):
  * bags are padded to a static tile count with a validity ``mask``; every
    tile-axis reduction (L1/L2 normalize, batch-norm stats, means) counts
    only valid tiles, so padded execution is numerically identical to the
    ragged original (tested to ~1e-6).
  * the training-time 20% tile subsample (reference: gbm/model.py:192-194)
    is a static-size Gumbel top-k over valid tiles so shapes stay static
    under jit.
  * per-bag BatchNorm1d(track_running_stats=False) uses batch stats in both
    train and eval, exactly like torch with running stats disabled.
"""

from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops import init as I
from ..ops import loss as L
from ..ops import nn as N
from . import resnet


@dataclass(frozen=True)
class MILConfig:
    """Model hyperparameters (reference: gbm/model.py:120-124)."""
    L: int = 80            # feature dim into the attention mechanism
    D: int = 40            # attention hidden dim
    K: int = 3             # attention maps
    O: int = 1             # instance-code output nodes
    n_classes: int = 3
    smoothing: float = 0.25
    dropout: float = 0.25
    train_tile_fraction: float = 0.2
    remat: bool = False  # checkpoint resnet blocks (large training bags)
    stem: str = "conv7"  # "s2d" = space-to-depth stem fast path (same math)
    class_weights: Optional[Tuple[float, ...]] = None
    widths: Tuple[int, ...] = resnet.WIDTHS
    blocks: Tuple[int, ...] = resnet.BLOCKS_PER_STAGE


def init_attention_mil(key, cfg: MILConfig = MILConfig()):
    """Full parameter pytree: cnn + context + attention + buffer + gate."""
    k_cnn, k_a1, k_a2, k_b1, k_b2 = jax.random.split(key, 5)
    return {
        "cnn": resnet.init_resnet26(k_cnn, embed_dim=cfg.L,
                                    widths=cfg.widths, blocks=cfg.blocks),
        # ContextLayer BatchNorm1d affine params (gamma=1, beta=0 at init)
        "context": {"gamma": jnp.ones((cfg.L,)), "beta": jnp.zeros((cfg.L,))},
        # attention MLP: tanh-gain kaiming fan_in (name contains 'attention')
        "attention": {
            "lin1": {"w": I.linear_kaiming_fan_in(k_a1, cfg.L, cfg.D, I.TANH_GAIN),
                     "b": I.zeros((cfg.D,))},
            "lin2": {"w": I.linear_kaiming_fan_in(k_a2, cfg.D, cfg.K, I.TANH_GAIN),
                     "b": I.zeros((cfg.K,))},
        },
        # instance-code MLP: lin1 kaiming lrelu fan_in; 'classifier' xavier
        "buffer": {
            "lin1": {"w": I.linear_kaiming_fan_in(k_b1, cfg.L, cfg.D,
                                                  I.leaky_relu_gain(0.1)),
                     "b": I.zeros((cfg.D,))},
            "classifier": {"w": I.linear_xavier_normal(k_b2, cfg.D, cfg.O),
                           "b": I.zeros((cfg.O,))},
        },
        # learnable per-map gate, init 0.25 (reference: gbm/model.py:153)
        "weight_mask": jnp.full((cfg.K,), 0.25),
    }


def _subsample(tiles, mask, fraction, rng):
    """Random subsample of the VALID tiles (train-time only).

    The selected count must match the reference's int(T_valid * fraction)
    (reference: gbm/model.py:192-194) where T_valid is the real bag size,
    not the padded bucket size. Shapes stay static under jit: Gumbel top-k
    selects k_static = max(1, int(T_padded * fraction)) candidates among
    mask>0 tiles, then the mask zeroes every candidate beyond the dynamic
    target max(1, floor(T_valid * fraction)).
    """
    T = tiles.shape[0]
    k_static = max(1, int(T * fraction))
    g = jax.random.gumbel(rng, (T,))
    scores = jnp.where(mask > 0, g, -jnp.inf)
    _, idx = jax.lax.top_k(scores, k_static)
    valid = jnp.sum(mask)
    k_dyn = jnp.maximum(1.0, jnp.floor(valid * fraction))
    keep = (jnp.arange(k_static) < k_dyn).astype(mask.dtype)
    return tiles[idx], mask[idx] * keep


def attention_pool(params, H, cfg: MILConfig, *, mask=None, rng=None,
                   train: bool = False, use_pallas_pool: bool = False):
    """Everything after the CNN: context, gated attention, pooling, logits.

    H: [T, L] float32 features. Returns a dict of intermediates.
    """
    # ContextLayer (reference: gbm/model.py:89-111): Hz0 feeds attention,
    # Hm0 (lrelu+dropout) feeds the instance-code buffer.
    Hz0 = N.batch_norm_tiles(H, params["context"]["gamma"],
                             params["context"]["beta"], mask=mask)
    Hm0 = N.leaky_relu(H)
    if train and rng is not None:
        Hm0 = N.dropout(Hm0, cfg.dropout, rng, train=True)

    a = params["attention"]
    A_raw = N.linear(jnp.tanh(N.linear(Hz0, a["lin1"]["w"], a["lin1"]["b"])),
                     a["lin2"]["w"], a["lin2"]["b"])          # [T, K]

    wm = params["weight_mask"]
    b = params["buffer"]
    Bterm = N.linear(N.leaky_relu(N.linear(Hm0, b["lin1"]["w"], b["lin1"]["b"])),
                     b["classifier"]["w"], b["classifier"]["b"])  # [T, O]

    if mask is not None:
        A_raw_m = A_raw * mask[:, None].astype(A_raw.dtype)
    else:
        A_raw_m = A_raw

    if use_pallas_pool:
        from ..ops.pallas_pool import PALLAS_POOL_MAX_TILES

        # the single-program kernel holds its [T, 128] f32 buffers in
        # VMEM; uncapped eval bags (1024-tile granules above the 2560
        # bucket) would exceed it, so oversized bags take the numerically
        # identical unfused path instead of a Mosaic allocation failure
        use_pallas_pool = A_raw.shape[0] <= PALLAS_POOL_MAX_TILES

    if use_pallas_pool:
        # fused serving path: softplus+gate+L1-norm+pool in one VMEM pass
        from ..ops.pallas_pool import gated_attention_pool

        m_vec = (mask if mask is not None
                 else jnp.ones((A_raw.shape[0],), A_raw.dtype))
        Mterm, A_1T, wROIs_fused = gated_attention_pool(
            A_raw.astype(jnp.float32), Bterm.astype(jnp.float32),
            m_vec.astype(jnp.float32), wm.astype(jnp.float32))
    else:
        A_act = N.softplus(A_raw)
        A_gated = (jax.nn.sigmoid(-10.0 * wm) * A_act
                   + jax.nn.sigmoid(10.0 * wm))
        if mask is not None:
            A_gated = A_gated * mask[:, None].astype(A_gated.dtype)
        A_1 = N.l1_normalize(A_gated, axis=0)                 # [T, K]
        A_1T = A_1.T                                          # [K, T]

    # Decorrelation + mean diagnostics (reference: gbm/model.py:216-219)
    A_2 = N.l2_normalize(A_raw_m, axis=0)                     # [T, K]
    off_diag = 1.0 - jnp.eye(cfg.K, dtype=A_2.dtype)
    Aterm_var = jnp.mean((A_2.T @ A_2) * off_diag)
    Aterm_mu = 0.5 * jnp.sum(N.masked_mean(A_raw, mask, axis=0) ** 2)

    if use_pallas_pool:
        wROIs = wROIs_fused  # already produced in the fused VMEM pass
    else:
        Mterm = A_1T @ Bterm                                  # [K, O]
        wROIs = A_1T * Bterm[:, 0][None, :]                   # [K, T]
    logits = Mterm.reshape(1, cfg.K * cfg.O)                  # [1, K]
    return {
        "Aterm": A_1T, "wROIs": wROIs, "Bterm": Bterm, "Mterm": Mterm,
        "Aterm_mu": Aterm_mu, "Aterm_var": Aterm_var, "logits": logits,
    }


def apply_attention_mil(params, tiles, label, cfg: MILConfig = MILConfig(), *,
                        mask=None, train: bool = False, rng=None,
                        compute_dtype=None, use_pallas_pool: bool = False,
                        extractor=None):
    """Full bag forward. tiles: [T, H, W, 3] NHWC; label: int scalar;
    mask: optional [T] validity (1 = real tile). Returns the 13-key dict.
    """
    if mask is None:
        mask = jnp.ones((tiles.shape[0],), jnp.float32)

    if train:
        if rng is None:
            raise ValueError("train=True requires an rng key")
        rng_sub, rng_do = jax.random.split(rng)
        tiles, mask = _subsample(tiles, mask, cfg.train_tile_fraction, rng_sub)
    else:
        rng_do = None

    # CNN input is stop-gradiented like the reference's .detach()
    # (reference: gbm/model.py:194) — a no-op for data inputs, kept for
    # clarity when tiles are produced by an upstream learnable transform.
    if extractor is not None:
        # pluggable tile embedder, e.g. the truncated GAN discriminator
        # (models.disc_extractor; legacy path gbm/classify.py:116)
        H = extractor(params.get("cnn"), jax.lax.stop_gradient(tiles))
    else:
        H = resnet.apply_resnet26(params["cnn"], jax.lax.stop_gradient(tiles),
                                  compute_dtype=compute_dtype,
                                  remat=cfg.remat and train,
                                  stem=cfg.stem)  # [T, L]
    H = H.astype(jnp.float32)

    KLD = 0.5 * N.masked_mean((H ** 2).mean(axis=1), mask, axis=0)

    pooled = attention_pool(params, H, cfg, mask=mask, rng=rng_do,
                            train=train, use_pallas_pool=use_pallas_pool)
    logits = pooled["logits"]
    y_pred = jax.nn.softmax(logits, axis=1)
    y_pred_hat = jnp.argmax(y_pred)

    weight = (jnp.asarray(cfg.class_weights, jnp.float32)
              if cfg.class_weights is not None else None)
    label = jnp.asarray(label, jnp.int32).reshape(())
    ce_loss = L.smoothed_ce_loss(logits, label[None],
                                 num_classes=cfg.n_classes,
                                 smoothing=cfg.smoothing, weight=weight)
    error = 1.0 - (y_pred_hat == label).astype(jnp.float32)

    # Buffer weight-norm diagnostic (reference: gbm/model.py:246)
    l2 = jnp.stack([
        jnp.linalg.norm(params["buffer"]["lin1"]["w"]),
        jnp.linalg.norm(params["buffer"]["classifier"]["w"]),
    ]).mean()

    sg = jax.lax.stop_gradient
    return {
        "Aterm": sg(pooled["Aterm"]),
        "wROIs": sg(pooled["wROIs"]),
        "Bterm": sg(pooled["Bterm"]),
        "Mterm": sg(pooled["Mterm"]),
        "Fterm": sg(H),
        "Aterm_mu": sg(pooled["Aterm_mu"]),
        "Aterm_var": sg(pooled["Aterm_var"]),
        "loss": ce_loss,            # the only term backpropagated
        "l2": l2,
        "KLD": sg(KLD),
        "y_pred": sg(y_pred),
        "y_pred_hat": sg(y_pred_hat),
        "error": sg(error),
    }


def gate_coefficients(params):
    """sigmoid(10*w) per attention map — the 'coef_a*' stats the training
    driver logs every epoch (reference: gbm/classify_combined.py:392-394)."""
    return jax.nn.sigmoid(10.0 * params["weight_mask"])
