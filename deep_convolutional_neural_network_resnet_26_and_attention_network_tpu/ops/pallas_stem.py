"""Fused uint8-ingest ResNet stem as a Pallas TPU kernel.

The stem (conv 7x7 stride 2 pad 3, cin=3; reference: gbm/model.py:24-26) is
the forward's MFU floor: XLA runs it at ~7% MFU because a cin=3 strided
conv underfills the MXU's 128-wide contraction (PROFILE.md per-stage
table). This kernel is counter-experiment #6 from that investigation: fuse
the mandatory uint8-ingest HBM read with normalize + the whole conv, built
as an *implicit-GEMM with halo*:

  1. XLA-side prep (rides the ingest elementwise pass): pad the u8 tiles
     to 306x306, space-to-depth to [B, 12, 153, 153] channel-MAJOR planes
     (zero-padded to 16 channels so every kernel copy is sublane-aligned),
     each plane row lane-padded to 256 and flattened to [B, 16, 153*256].
     The 256 row stride is the load-bearing choice: tap row shifts become
     offsets of a*256 — statically 128-aligned, which Mosaic REQUIRES for
     lane-dimension slices (the original 153-stride halo layout, shift
     a*153+b, was rejected: "cannot statically prove that index in
     dimension 1 is a multiple of 128").
  2. In-kernel: normalize u8 -> bf16 once; for each column shift b in
     0..3, pltpu.roll the flattened plane by -b (the only sub-lane move,
     done as a hardware lane rotate), then take 4 aligned static slices
     (row shifts a*256) — 16 contiguous copies build the im2col matrix.
  3. One [20, 256] x [256, S] MXU matmul per 50-output-row block
     (K = 16ch * 16 taps; 147 live weights), f32 accumulation. Grid is
     (B, 5): a full 150-row p-matrix at stride 256 is 19.6 MB — over
     VMEM — so each program owns 30 output rows (p = 3.9 MB; the
     N_BLK=3 variant measured 792 KB over the 16 MB scoped limit).

Bias, LeakyReLU, the boundary correction (below), and maxpool stay in XLA
where they fuse into the output relayout.

Exactness: the pad ring holds u8 zeros, which normalize to ``beta``
instead of the true zero padding of the reference conv. The wrapper adds
``beta * (C1 - S)`` where C1[o,i,j] = conv4(ones) (the sum of in-range
taps) and S[o] the full tap sum — an identity, not an approximation; the
correction vanishes for beta == 0 (the bench's x/255 ingest).

Measured on the v5e bench chip and REJECTED (counter-experiment #6,
PROFILE.md "Fused u8 Pallas stem"): stem-only 0.27x XLA, full forward
0.40x. The kernel stays as a standalone op + tests + interleaved A/B
harness (tools/exp_stem_pallas.py) so the measurement is reproducible;
it is deliberately NOT wired into apply_resnet26 — the XLA stem is the
shipped path.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H_IN = 300            # live-driver tile resolution (the only fused shape)
H_PAD = H_IN + 6      # pad 3 on each side before space-to-depth
W2 = H_PAD // 2       # 153: s2d plane side (rows and live cols)
OUT = H_IN // 2       # 150 output rows/cols
STRIDE = 256          # lane-padded plane row stride (128-aligned shifts)
L = W2 * STRIDE       # 39168: flattened plane length (mult. of 128)
N_BLK = 5             # output row blocks per tile (VMEM ceiling)
BLK_ROWS = OUT // N_BLK             # 30 output rows per grid step
S_BLK = BLK_ROWS * STRIDE           # 7680 matmul columns per block
CH = 16                             # 12 live s2d channels, padded to align
K = 16 * CH                         # im2col rows (256; 147 live weights)


def _stem_kernel(scal_ref, x_ref, w_ref, o_ref, xn_ref, vb_ref, p_ref):
    """Grid (B, N_BLK). x_ref [1, CH, L] u8; w_ref [20, K] bf16;
    o_ref [1, 1, 20, S_BLK] bf16; scratch xn [CH, L] f32,
    vb [CH, L] bf16, p [K, S_BLK] bf16."""
    h = pl.program_id(1)
    alpha = scal_ref[0, 0]
    beta = scal_ref[0, 1]
    # normalize the whole plane — one VPU pass. The plane stays f32 (not
    # bf16): Mosaic's lane rotate only handles 32-bit data, and there is
    # no direct u8->bf16 cast either (widen through i32)
    xn_ref[:, :] = (x_ref[0].astype(jnp.int32).astype(jnp.float32)
                    * alpha + beta)
    base = h * S_BLK
    # implicit-GEMM: tap (a, b) of the equivalent conv4x4-s1 on the s2d
    # planes is the flattened plane shifted by a*STRIDE + b. The b part
    # is a lane rotate (pltpu.roll) staged through the vb scratch (Mosaic
    # lowers ref slicing, not value-level dynamic_slice); the a part is a
    # 128-aligned pl.ds on that ref (STRIDE and S_BLK are multiples of
    # 128 — the alignment Mosaic must statically prove).
    for b in range(4):
        if b:
            # rotate on the f32 value (32-bit only op), store bf16 —
            # halves the vb footprint against the 16 MB VMEM ceiling
            vb_ref[:, :] = pltpu.roll(
                xn_ref[:, :], shift=L - b, axis=1).astype(jnp.bfloat16)
        for a in range(4):
            k = a * 4 + b
            sl = pl.ds(base + a * STRIDE, S_BLK)
            p_ref[CH * k:CH * (k + 1), :] = (
                xn_ref[:, sl].astype(jnp.bfloat16) if b == 0
                else vb_ref[:, sl])
    o_ref[0, 0] = jnp.dot(
        w_ref[:], p_ref[:],
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _stem_pallas_call(x12, w2, scal, *, interpret=False):
    B = x12.shape[0]
    return pl.pallas_call(
        _stem_kernel,
        grid=(B, N_BLK),
        in_specs=[
            pl.BlockSpec((1, 2), lambda b, h: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, CH, L), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((20, K), lambda b, h: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 20, S_BLK),
                               lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N_BLK, 20, S_BLK), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((CH, L), jnp.float32),
            pltpu.VMEM((CH, L), jnp.bfloat16),
            pltpu.VMEM((K, S_BLK), jnp.bfloat16),
        ],
        interpret=interpret,
    )(scal, x12, w2)


def _prep_x12(x_u8):
    """[B, 300, 300, 3] u8 -> [B, CH, L] u8 channel-major s2d planes,
    each plane row lane-padded from 153 to STRIDE columns."""
    B = x_u8.shape[0]
    xp = jnp.pad(x_u8, ((0, 0), (3, 3), (3, 3), (0, 0)))
    y = xp.reshape(B, W2, 2, W2, 2, 3)
    y = y.transpose(0, 2, 4, 5, 1, 3)           # [B, 2, 2, 3, W2, W2]
    y = y.reshape(B, 12, W2, W2)
    y = jnp.pad(y, ((0, 0), (0, CH - 12), (0, 0), (0, STRIDE - W2)))
    return y.reshape(B, CH, L)


def _w2_index_maps():
    """Static maps [7,7,3] -> flat K rows for THIS kernel's packing.

    Derivation: out(i,j) = sum_{u,v,c} W7[u,v,c] * x[2i+u-3, 2j+v-3]
    (x in unpadded coords). The prep pads by 3 then pairs rows, so
    plane[R, C, rp*6+cp*3+c] = x[2R+rp-3, 2C+cp-3]; matching exponents
    gives tap (a, b) = (u//2, v//2) at parity (rp, cp) = (u%2, v%2) —
    NOTE this differs from models/resnet._s2d_index_maps, whose pairs
    start at even unpadded coordinates (parity is complemented there).
    """
    src = np.zeros((7, 7, 3), np.int64)
    for u in range(7):
        for v in range(7):
            for c in range(3):
                k = ((u // 2) * 4 + (v // 2)) * CH \
                    + (u % 2) * 6 + (v % 2) * 3 + c
                src[u, v, c] = k
    return src.reshape(-1)


_W2_MAP = _w2_index_maps()


def _prep_w2(w7, dtype=jnp.bfloat16):
    """[7,7,3,co] -> [co, K] for the kernel's halo packing."""
    co = w7.shape[-1]
    w2 = jnp.zeros((K, co), w7.dtype)
    w2 = w2.at[_W2_MAP].set(w7.reshape(-1, co))
    return w2.T.astype(dtype)


def stem_u8_conv(conv1, x_u8, *, alpha, beta, interpret=False):
    """Fused uint8 -> normalize -> conv7x7s2p3 + bias. Returns the
    PRE-ACTIVATION stem output [B, 150, 150, 20] f32.

    ``alpha``/``beta`` define the normalize ``x * alpha + beta`` that the
    kernel fuses into the ingest; the boundary correction keeps the math
    identical to conv(normalize(x)) with zero padding.
    """
    if x_u8.dtype != jnp.uint8 or x_u8.shape[1:] != (H_IN, H_IN, 3):
        raise ValueError(
            f"fused stem expects uint8 [B, {H_IN}, {H_IN}, 3]; got "
            f"{x_u8.dtype} {x_u8.shape}")
    x12 = _prep_x12(x_u8)
    w2 = _prep_w2(conv1["w"])
    scal = jnp.asarray([[alpha, beta]], jnp.float32)
    out = _stem_pallas_call(x12, w2, scal, interpret=interpret)
    B = x_u8.shape[0]
    out = out.reshape(B, N_BLK, 20, BLK_ROWS, STRIDE)[..., :OUT]
    out = out.transpose(0, 1, 3, 4, 2)            # [B, blk, r, c, 20]
    out = out.reshape(B, OUT, OUT, 20).astype(jnp.float32)  # NHWC
    out = out + conv1["b"].astype(jnp.float32)
    if beta:
        # pads held `beta` instead of 0: subtract beta * (S - C1), where
        # C1[o,i,j] = conv7s2p3(ones) = sum of in-range taps and S the
        # full tap sum — exact, only nonzero within 2 px of the border
        w7 = conv1["w"].astype(jnp.float32)
        ones = jnp.ones((1, H_IN, H_IN, 3), jnp.float32)
        c1 = lax.conv_general_dilated(
            ones, w7, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        s_full = w7.sum(axis=(0, 1, 2))
        out = out - jnp.float32(beta) * (s_full[None, None, None] - c1)
    return out
