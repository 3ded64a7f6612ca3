"""ResNet-26 per-tile feature extractor (TPU-native, NHWC, functional).

Capability parity with the reference's narrow, normalization-free ResNet
(reference: gbm/model.py:14-61 and nnBlocks.py:157-189):

  * stem: conv 7x7 stride 2 pad 3 (bias), LeakyReLU(0.1), maxpool 3x3 s2 p1
  * four stages of widths 20/40/60/80, each 3 BasicResBlocks
    (conv3x3 -> lrelu -> conv3x3 -> +shortcut -> lrelu, bias=True, no norm;
     1x1 stride-s conv shortcut, bias=False, when shape changes)
  * global average pool -> Linear(80 -> embed_dim, bias=False)

Total weighted layers: 1 stem + 24 block convs + 1 fc = 26.

TPU-first choices: NHWC layout throughout, bf16 conv compute with fp32
accumulation (``compute_dtype``), a flat list-of-stages parameter pytree
that vmaps/shards cleanly over the tile axis.
"""

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import init as I
from ..ops import nn as N

WIDTHS = (20, 40, 60, 80)
BLOCKS_PER_STAGE = (3, 3, 3, 3)
EMBED_DIM = 80


def _s2d_index_maps():
    """Static index maps rearranging the [7,7,3,co] stem kernel into the
    equivalent [4,4,12,co] kernel over space-to-depth input.

    Derivation: out(i) = sum_u W7[u] x[2i+u-3]; write u-3 = 2m+dy with
    dy = (u-3) % 2, m = (u-3-dy)//2 — the tap lands at s2d row i+m,
    parity dy, i.e. conv4 tap a = m+2 with asymmetric padding (2, 1).
    Every (u, v, c) source maps to a unique (a, b, channel) slot; slots
    with no source stay zero. numpy (not jnp) so importing performs no
    device ops.
    """
    src_u, src_v, src_c = [], [], []
    dst_a, dst_b, dst_ch = [], [], []
    for u in range(7):
        ky = u - 3
        dy = ky % 2
        a = (ky - dy) // 2 + 2
        for v in range(7):
            kx = v - 3
            dx = kx % 2
            b = (kx - dx) // 2 + 2
            for c in range(3):
                src_u.append(u)
                src_v.append(v)
                src_c.append(c)
                dst_a.append(a)
                dst_b.append(b)
                dst_ch.append((dy * 2 + dx) * 3 + c)
    mk = lambda x: np.asarray(x, np.int32)  # noqa: E731
    return (mk(src_u), mk(src_v), mk(src_c),
            mk(dst_a), mk(dst_b), mk(dst_ch))


_S2D_MAPS = _s2d_index_maps()


def stem_s2d_kernel(w7):
    """[7,7,3,co] stem weights -> the equivalent [4,4,12,co] s2d kernel
    (see :func:`_s2d_index_maps`). Trace-time rearrange: checkpoints keep
    the canonical 7x7 layout; this is purely an execution-path detail."""
    su, sv, sc, da, db, dch = _S2D_MAPS
    w4 = jnp.zeros((4, 4, 12, w7.shape[-1]), w7.dtype)
    return w4.at[da, db, dch].set(w7[su, sv, sc])


def space_to_depth2(x):
    """[N,2H,2W,C] -> [N,H,W,4C], channel index (dy*2+dx)*C + c."""
    n, h2, w2, c = x.shape
    y = x.reshape(n, h2 // 2, 2, w2 // 2, 2, c)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(n, h2 // 2, w2 // 2, 4 * c)


def apply_stem(params, x, *, compute_dtype=None, act_fn=None,
               stem: str = "conv7"):
    """Stem: conv7x7 s2 p3 -> LeakyReLU -> maxpool3 s2 p1.

    ``stem="s2d"`` computes the identical math as a space-to-depth
    rearrange + conv4x4 s1 cin=12 — measurably faster on TPU because the
    cin=3 strided conv underfills the MXU while the rearrange rides the
    ingest's elementwise pass (PROFILE.md "space-to-depth stem, revisited";
    exact same sum of products, only float summation order differs).
    Falls back to conv7 for odd spatial sizes.
    """
    act = act_fn or N.leaky_relu
    if stem == "s2d" and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
        xc = x.astype(compute_dtype) if compute_dtype is not None else x
        w4 = stem_s2d_kernel(params["conv1"]["w"])
        h = N.conv2d(space_to_depth2(xc), w4, params["conv1"]["b"],
                     stride=1, padding=[(2, 1), (2, 1)],
                     compute_dtype=compute_dtype)
    else:
        h = N.conv2d(x, params["conv1"]["w"], params["conv1"]["b"], stride=2,
                     padding=3, compute_dtype=compute_dtype)
    h = act(h)
    return N.max_pool(h, window=3, stride=2, padding=1)


def init_block(key, cin, cout, stride):
    """Parameters for one BasicResBlock."""
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "conv1": {"w": I.conv_kernel(k1, 3, 3, cin, cout), "b": I.zeros((cout,))},
        "conv2": {"w": I.conv_kernel(k2, 3, 3, cout, cout), "b": I.zeros((cout,))},
    }
    if stride != 1 or cin != cout:
        p["downsample"] = {"w": I.conv_kernel(k3, 1, 1, cin, cout)}
    return p


def apply_block(p, x, stride, *, compute_dtype=None, act_fn=None):
    act = act_fn or N.leaky_relu
    out = N.conv2d(x, p["conv1"]["w"], p["conv1"]["b"], stride=stride,
                   padding=1, compute_dtype=compute_dtype)
    out = act(out)
    out = N.conv2d(out, p["conv2"]["w"], p["conv2"]["b"], stride=1,
                   padding=1, compute_dtype=compute_dtype)
    if "downsample" in p:
        identity = N.conv2d(x, p["downsample"]["w"], stride=stride,
                            padding=0, compute_dtype=compute_dtype)
    else:
        identity = x
    return act(out + identity)


def init_resnet26(key, *, embed_dim: int = EMBED_DIM,
                  widths: Sequence[int] = WIDTHS,
                  blocks: Sequence[int] = BLOCKS_PER_STAGE):
    """Initialize the full parameter pytree."""
    keys = jax.random.split(key, 2 + sum(blocks))
    params = {
        "conv1": {"w": I.conv_kernel(keys[0], 7, 7, 3, widths[0]),
                  "b": I.zeros((widths[0],))},
        "stages": [],
        # fc has no bias (reference: gbm/model.py:32); kaiming fan_in lrelu
        "fc": {"w": I.linear_kaiming_fan_in(keys[1], widths[-1], embed_dim,
                                            I.leaky_relu_gain(0.1))},
    }
    ki = 2
    cin = widths[0]
    for stage_idx, (width, n_blocks) in enumerate(zip(widths, blocks)):
        stage = []
        for b in range(n_blocks):
            stride = 2 if (stage_idx > 0 and b == 0) else 1
            stage.append(init_block(keys[ki], cin, width, stride))
            ki += 1
            cin = width
        params["stages"].append(stage)
    return params


def apply_resnet26(params, x, *, compute_dtype=None, taps: bool = False,
                   act_fn=None, remat: bool = False, stem: str = "conv7"):
    """Forward: x [N, H, W, 3] -> embeddings [N, embed_dim].

    With ``taps=True`` also returns an ordered dict of intermediate
    activations ('stem', 'stage1'..'stage4', 'pool') — the explicit-return
    replacement for the reference's forward hooks
    (PyTorchHelpers.prime_activation_summary/vis call sites:
    gbm/classify_combined.py:369-381,418).

    ``remat=True`` checkpoints each residual block (jax.checkpoint), trading
    recompute for activation memory — full-width 2500-tile training bags
    don't fit 16 GB HBM otherwise.

    ``stem="s2d"`` selects the space-to-depth stem fast path (identical
    math, see :func:`apply_stem`).
    """
    act = act_fn or N.leaky_relu
    acts = {}
    h = apply_stem(params, x, compute_dtype=compute_dtype, act_fn=act,
                   stem=stem)
    if taps:
        acts["stem"] = h
    def block_fn(p, x, stride):
        if remat:
            # close over the non-array args; only pytrees cross the
            # checkpoint boundary
            return jax.checkpoint(
                lambda pp, xx: apply_block(pp, xx, stride,
                                           compute_dtype=compute_dtype,
                                           act_fn=act),
                policy=jax.checkpoint_policies.nothing_saveable)(p, x)
        return apply_block(p, x, stride, compute_dtype=compute_dtype,
                           act_fn=act)

    for stage_idx, stage in enumerate(params["stages"]):
        for b, block in enumerate(stage):
            stride = 2 if (stage_idx > 0 and b == 0) else 1
            h = block_fn(block, h, stride)
        if taps:
            acts[f"stage{stage_idx + 1}"] = h
    h = N.global_avg_pool(h)
    out = N.linear(h, params["fc"]["w"], compute_dtype=compute_dtype)
    if taps:
        acts["pool"] = h
        return out, acts
    return out


def num_params(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
