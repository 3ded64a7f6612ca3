"""Pallas TPU kernel: fused gated-attention MIL pooling.

Fuses the post-MLP pooling chain of the attention head (reference:
gbm/model.py:211-229) into ONE pass over the tile axis in VMEM:

    act    = softplus(A_raw)                       [T, K]
    gated  = sigmoid(-10 w) * act + sigmoid(10 w)  (learnable per-map gate)
    gated *= mask                                  (padded-bag validity)
    A1     = gated / sum_T(gated)                  (L1 normalize over tiles)
    M      = A1^T B                                [K, O]  pooled logits
    wROIs  = A1^T * B^T                            [K, T]  per-tile heat

XLA already fuses most of this; the kernel exists for the serving path
where the [T, K] intermediates would otherwise round-trip HBM between the
softplus/normalize/matmul stages, and as the building block for tile-axis
sharded pooling (each shard runs the kernel on its tiles; the L1 denominator
and M psum across shards — see parallel.steps).

Grid: single program; T padded to a multiple of 8 rows, K/O padded to the
128-lane tile. For MIL sizes (T <= 2560, K = 3) everything fits VMEM.
Falls back to interpreter mode off-TPU so tests run on CPU.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# VMEM budget for the single-program kernel: ~8 [T, 128] f32 buffers is
# ~4 KB per tile row; 2560 rows ≈ 10 MB of the ~16 MB/core VMEM. Callers
# (models.attention_mil) fall back to the numerically identical unfused
# path above this.
PALLAS_POOL_MAX_TILES = 2560


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pool_kernel(a_ref, b_ref, mask_ref, gate_ref, m_ref, a1t_ref, w_ref):
    a = a_ref[:]                     # [T, Kp]
    b = b_ref[:]                     # [T, Op]
    mask = mask_ref[:]               # [T, 1]
    gate = gate_ref[:]               # [1, Kp]

    act = jax.nn.softplus(a)
    gated = (jax.nn.sigmoid(-10.0 * gate) * act
             + jax.nn.sigmoid(10.0 * gate)) * mask
    denom = jnp.maximum(jnp.sum(jnp.abs(gated), axis=0, keepdims=True),
                        1e-12)       # [1, Kp]
    a1 = gated / denom               # [T, Kp]
    m_ref[:] = jnp.dot(a1.T, b, preferred_element_type=jnp.float32)
    a1t_ref[:] = a1.T                # [Kp, T]
    w_ref[:] = a1.T * b[:, 0][None, :]


def _pool_call(a_pad, b_pad, mask_pad, gate_pad, *, interpret: bool):
    t, kp = a_pad.shape
    op = b_pad.shape[1]
    return pl.pallas_call(
        _pool_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((kp, op), jnp.float32),   # M
            jax.ShapeDtypeStruct((kp, t), jnp.float32),    # A1^T
            jax.ShapeDtypeStruct((kp, t), jnp.float32),    # wROIs
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(4)],
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in range(3)),
        interpret=interpret,
    )(a_pad, b_pad, mask_pad, gate_pad)


@partial(jax.jit, static_argnames=("interpret",))
def _pool_forward(a_raw, b, mask, weight_mask, *,
                  interpret: bool | None = None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t, k = a_raw.shape
    o = b.shape[1]
    tp = _round_up(max(t, 8), 8)
    kp = _round_up(k, 128)
    op = _round_up(o, 128)

    a_pad = jnp.zeros((tp, kp), jnp.float32).at[:t, :k].set(a_raw)
    b_pad = jnp.zeros((tp, op), jnp.float32).at[:t, :o].set(b)
    # padded ROWS are killed by the mask; padded COLUMNS produce junk that
    # the final [:k]/[:t] slices drop
    mask_pad = jnp.zeros((tp, 1), jnp.float32).at[:t, 0].set(mask)
    gate_pad = jnp.zeros((1, kp), jnp.float32).at[0, :k].set(weight_mask)

    m, a1t, w = _pool_call(a_pad, b_pad, mask_pad, gate_pad,
                           interpret=bool(interpret))
    return m[:k, :o], a1t[:k, :t], w[:k, :t]


@partial(jax.custom_vjp, nondiff_argnums=())
def gated_attention_pool(a_raw, b, mask, weight_mask):
    """Fused pooling. a_raw: [T, K]; b: [T, O]; mask: [T]; weight_mask: [K].

    Returns (M [K, O], A1T [K, T], wROIs [K, T]) — identical numerics to the
    unfused ops.nn path (tested to 1e-6). Differentiable: the forward is
    the Pallas VMEM kernel; the backward is the closed-form VJP of the
    softplus -> gate -> L1-normalize -> pool chain (gradients match the
    unfused path, see tests). ``mask`` is treated as non-differentiable.
    """
    return _pool_forward(a_raw, b, mask, weight_mask)


def _pool_fwd(a_raw, b, mask, weight_mask):
    outs = _pool_forward(a_raw, b, mask, weight_mask)
    return outs, (a_raw, b, mask, weight_mask, outs[1])


def _pool_bwd(res, cotangents):
    a_raw, b, mask, wm, a1t = res
    dm, da1t, dw = cotangents
    a1 = a1t.T                                   # [T, K]
    m = mask[:, None]                            # [T, 1]

    # recompute cheap forward intermediates
    act = jax.nn.softplus(a_raw)                 # [T, K]
    g1 = jax.nn.sigmoid(-10.0 * wm)              # [K]
    g0 = jax.nn.sigmoid(10.0 * wm)               # [K]
    gated = (g1 * act + g0) * m                  # [T, K], >= 0
    denom = jnp.maximum(jnp.sum(gated, axis=0, keepdims=True), 1e-12)

    # cotangent into A1 from all three outputs
    da1 = b @ dm.T                               # M = A1^T B
    da1 = da1 + da1t.T                           # A1T passthrough
    da1 = da1 + dw.T * b[:, :1]                  # wROIs = A1^T * B^T
    # cotangent into B
    db = a1 @ dm                                 # [T, O]
    db = db.at[:, 0].add(jnp.sum(dw.T * a1, axis=1))

    # through the L1 normalization (gated >= 0 so |gated| = gated)
    dgated = (da1 - jnp.sum(da1 * a1, axis=0, keepdims=True)) / denom

    # through the gate and softplus (mask rows contribute nothing)
    dact = dgated * g1 * m
    da_raw = dact * jax.nn.sigmoid(a_raw)
    dg1 = jnp.sum(dgated * act * m, axis=0)      # [K]
    dg0 = jnp.sum(dgated * m, axis=0)            # [K]
    dwm = (dg1 * (-10.0) * g1 * (1.0 - g1)
           + dg0 * 10.0 * g0 * (1.0 - g0))
    return da_raw, db, jnp.zeros_like(mask), dwm


gated_attention_pool.defvjp(_pool_fwd, _pool_bwd)
