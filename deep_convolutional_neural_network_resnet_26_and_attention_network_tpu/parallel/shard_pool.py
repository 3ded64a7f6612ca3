"""Explicit tile-parallel attention pooling: shard_map + psum.

The framework's default distribution strategy is GSPMD — annotate the
shardings, let XLA insert the collectives (`parallel/steps.py`). This
module is the same math written the explicit way (the scaling-book
recipe): the tile axis of one bag is split over the mesh's "tiles" axis
with `shard_map`, and every cross-tile reduction the reference's
single-GPU code did implicitly becomes a visible `psum` over ICI:

  * the ContextLayer's per-bag batch-norm statistics (sum / sumsq / count),
  * the gated attention's L1 normalizer,
  * the pooled slide embedding  M = A1^T B.

MIL attention pooling is a LINEAR reduction over tiles, so this is exact —
no ring/blockwise approximation (SURVEY.md §5 "psum-pooled attention").
Useful as (a) the serving primitive when you want collective placement
pinned rather than inferred, and (b) executable documentation of what
GSPMD inserts. Reference semantics: gbm/model.py:89-264 (eval path).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.attention_mil import MILConfig
from ..ops import nn as N
from . import mesh as M


def make_sharded_pool(cfg: MILConfig, mesh):
    """Returns pool(params, H [T, L], mask [T]) -> {logits, Mterm, Aterm}.

    The mesh's tile-axis size must divide T (pad the bag with zero-mask
    tiles otherwise); H/mask may arrive with any sharding (shard_map
    re-lays them out onto the tiles axis).
    """
    ax = M.TILES_AXIS
    spec_tiles = P(ax)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(ax, None), spec_tiles),
             out_specs=(P(), P(), P(None, ax)))
    def pool(params, H, mask):
        # ---- local shard: H [T/tiles, L], mask [T/tiles]
        m = mask[:, None].astype(H.dtype)

        # ContextLayer batch-norm over ALL tiles: 3 psums build the global
        # masked mean/biased-variance (reference: gbm/model.py:105,109)
        cnt = lax.psum(jnp.sum(mask), ax)
        cnt = jnp.maximum(cnt, 1.0)
        mu = lax.psum(jnp.sum(H * m, axis=0), ax) / cnt
        var = lax.psum(jnp.sum(((H - mu) ** 2) * m, axis=0), ax) / cnt
        Hz0 = ((H - mu) * lax.rsqrt(var + 1e-5)
               * params["context"]["gamma"] + params["context"]["beta"])
        Hm0 = N.leaky_relu(H)  # eval path: dropout inert

        a = params["attention"]
        A_raw = N.linear(
            jnp.tanh(N.linear(Hz0, a["lin1"]["w"], a["lin1"]["b"])),
            a["lin2"]["w"], a["lin2"]["b"])                    # [t, K]
        b = params["buffer"]
        Bterm = N.linear(
            N.leaky_relu(N.linear(Hm0, b["lin1"]["w"], b["lin1"]["b"])),
            b["classifier"]["w"], b["classifier"]["b"])        # [t, O]

        wm = params["weight_mask"]
        A_act = N.softplus(A_raw)
        A_gated = (jax.nn.sigmoid(-10.0 * wm) * A_act
                   + jax.nn.sigmoid(10.0 * wm))
        A_gated = A_gated * m

        # L1 normalizer over the full tile axis: one psum per attention map
        denom = lax.psum(jnp.sum(jnp.abs(A_gated), axis=0), ax)   # [K]
        A_1 = A_gated / jnp.maximum(denom, 1e-12)

        # pooled slide embedding: local partial matmul + psum
        Mterm = lax.psum(A_1.T @ Bterm, ax)                       # [K, O]
        logits = Mterm.reshape(1, cfg.K * cfg.O)
        return logits, Mterm, A_1.T

    def run(params, H, mask=None):
        T = H.shape[0]
        if mask is None:
            mask = jnp.ones((T,), H.dtype)
        logits, Mterm, Aterm = pool(params, H, mask)
        return {"logits": logits, "Mterm": Mterm, "Aterm": Aterm}

    return jax.jit(run)


def shard_features(mesh, H, mask):
    """device_put H [T, L] / mask [T] split over the tiles axis."""
    s_h = NamedSharding(mesh, P(M.TILES_AXIS, None))
    s_m = NamedSharding(mesh, P(M.TILES_AXIS))
    return jax.device_put(H, s_h), jax.device_put(mask, s_m)
