"""High-throughput inference paths: one-pass full-slide classification and
mesh-sharded multi-slide batches.

This is the serving side of the framework (BASELINE configs 3 and 5): a
whole H&E slide classifies in one pass — RoiBuilder cache -> on-device
transforms -> ResNet-26 features -> psum-pooled gated attention — and
batches of slides shard over a (slides, tiles) mesh so ICI collectives
replace the reference's DataParallel gather (reference: gbm/model.py:132-135).
"""

import numpy as np

import jax
import jax.numpy as jnp

from ..data.loader import pad_bag
from ..models import attention_mil as amil
from . import mesh as M
from . import steps


def classify_slide(params, cfg: amil.MILConfig, builder, *,
                   resolution: int = 300, compute_dtype=jnp.bfloat16,
                   use_pallas_pool: bool | None = None):
    """Full-slide pipeline: tile cache -> transforms -> features -> pooled
    prediction. Returns (probs [n_classes], outputs dict, coords)."""
    if builder.params.get("resolution") != resolution:
        builder.update_resolution_and_buffer(resolution)
    tiles, coords, _ = builder.get_inference_data()
    bag, mask = pad_bag(tiles)
    if use_pallas_pool is None:
        use_pallas_pool = jax.default_backend() == "tpu"

    fwd = jax.jit(lambda p, t, m: amil.apply_attention_mil(
        p, t, 0, cfg, mask=m, train=False, compute_dtype=compute_dtype,
        use_pallas_pool=use_pallas_pool))
    outs = fwd(params, bag, mask)
    T = tiles.shape[0]
    outs = dict(outs)
    outs["Aterm"] = outs["Aterm"][:, :T]
    outs["wROIs"] = outs["wROIs"][:, :T]
    outs["Fterm"] = outs["Fterm"][:T]
    return np.asarray(outs["y_pred"]).ravel(), outs, coords


def make_batched_infer(cfg: amil.MILConfig, mesh=None, *,
                       compute_dtype=jnp.bfloat16):
    """Jitted batched inference fn(params, tiles [B,T,H,W,3], masks [B,T])
    -> dict with y_pred [B, 1, C]. With a mesh, inputs shard over
    (slides, tiles) and XLA inserts the tile-axis psums."""

    def infer(params, tiles, masks):
        labels = jnp.zeros((tiles.shape[0],), jnp.int32)
        outs = steps.batched_forward(params, tiles, masks, labels, cfg,
                                     train=False,
                                     compute_dtype=compute_dtype)
        return {"y_pred": outs["y_pred"], "y_pred_hat": outs["y_pred_hat"],
                "Mterm": outs["Mterm"], "Aterm_var": outs["Aterm_var"]}

    jitted = jax.jit(infer)

    if mesh is None:
        return jitted

    def sharded(params, tiles, masks):
        rep = M.replicated(mesh)
        params = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep), params)
        tiles = jax.device_put(tiles, M.bag_batch_sharding(mesh))
        masks = jax.device_put(masks, M.mask_sharding(mesh))
        with mesh:
            return jitted(params, tiles, masks)

    return sharded


def classify_slides_batched(params, cfg: amil.MILConfig, bags, *,
                            mesh=None, n_tiles: int | None = None,
                            compute_dtype=jnp.bfloat16):
    """bags: list of [T_i, H, W, 3] arrays. Pads all bags to one static
    tile count (max bucket, rounded to the tile-mesh axis) and runs one
    sharded batched forward. Returns probs [B, C]."""
    multiple = mesh.shape[M.TILES_AXIS] if mesh is not None else 1
    target = n_tiles or max(
        int(np.ceil(b.shape[0] / max(multiple, 1))) * max(multiple, 1)
        for b in bags)
    target = int(np.ceil(target / max(multiple, 1))) * max(multiple, 1)
    tiles, masks = [], []
    for b in bags:
        t, m = pad_bag(jnp.asarray(b), n_tiles=target)
        tiles.append(t)
        masks.append(m)
    tiles = jnp.stack(tiles)
    masks = jnp.stack(masks)
    infer = make_batched_infer(cfg, mesh, compute_dtype=compute_dtype)
    outs = infer(params, tiles, masks)
    return np.asarray(outs["y_pred"]).reshape(len(bags), -1), outs
