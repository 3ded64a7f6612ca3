"""Post-training W8A8 int8 quantization for the ResNet-26 extractor.

Serving-side TPU extension (the reference has no quantization — this is
not a parity item). Rationale: the extractor's conv path is
activation-traffic-bound at the model's narrow 20/40/60/80 widths
(PROFILE.md "Why we did NOT hand-write conv kernels"), and int8 both
halves the inter-op activation bytes vs bf16 AND doubles the v5e MXU
rate (394 INT8 TOPS vs 197 bf16 TFLOP/s datasheet). Whether XLA's int8
conv emitter realizes any of that at these shapes is an empirical
question — `tools/exp_int8.py` measures it interleaved against the
shipped bf16 path on the bench chip.

Scheme (standard symmetric PTQ):

  * weights: per-output-channel int8, ``sw[co] = max|w[..., co]| / 127``
  * activations: per-tensor static scales from a calibration batch
    (``calibrate_resnet26``) — absmax of each conv's INPUT, so the
    quantize of layer N's output happens against layer N+1's scale
  * conv: int8 x int8 -> int32 accumulation
    (``preferred_element_type=int32``; bit-exact vs f32 on the quantized
    grid — verified in tests), dequantized by ``sx * sw[co]``, bias added
    in f32, LeakyReLU + residual adds in the dequant (f32) domain
  * a block's ``conv1`` and ``downsample`` consume the SAME input tensor
    and therefore share one activation scale

Quantization error compounds through 26 normalization-free layers, so
this is an explicitly opt-in serving path: measure the slide-probability
drift on YOUR checkpoint (tests pin cosine similarity and argmax
agreement on random-init nets; a trained net's error profile differs).
"""

import jax.numpy as jnp

from . import nn as N

_QMAX = 127.0


def _scale_of(x, axis=None):
    """Symmetric absmax scale: max|x| / 127 (floored away from zero)."""
    s = jnp.max(jnp.abs(x), axis=axis) / _QMAX
    return jnp.maximum(s, 1e-8).astype(jnp.float32)


def _quant(x, s):
    """f32 tensor -> int8 on the grid defined by per-tensor scale s."""
    q = jnp.round(x.astype(jnp.float32) / s)
    return jnp.clip(q, -_QMAX, _QMAX).astype(jnp.int8)


def _quant_w(w):
    """Per-output-channel weight quantization. w: [..., cout]."""
    axes = tuple(range(w.ndim - 1))
    sw = _scale_of(w, axis=axes)
    q = jnp.round(w.astype(jnp.float32) / sw)
    return jnp.clip(q, -_QMAX, _QMAX).astype(jnp.int8), sw


def quantize_resnet26(params):
    """f32 ResNet-26 params -> int8 qparams pytree (same topology).

    Each conv site becomes {"wq": int8, "sw": f32 [cout], "b": f32};
    the fc becomes {"wq", "sw"} (no bias in the reference head,
    gbm/model.py:32).
    """
    def conv_site(p):
        wq, sw = _quant_w(p["w"])
        out = {"wq": wq, "sw": sw}
        if "b" in p:
            out["b"] = p["b"].astype(jnp.float32)
        return out

    q = {"conv1": conv_site(params["conv1"]), "stages": []}
    for stage in params["stages"]:
        qs = []
        for block in stage:
            qb = {"conv1": conv_site(block["conv1"]),
                  "conv2": conv_site(block["conv2"])}
            if "downsample" in block:
                qb["downsample"] = conv_site(block["downsample"])
            qs.append(qb)
        q["stages"].append(qs)
    wq, sw = _quant_w(params["fc"]["w"])
    q["fc"] = {"wq": wq, "sw": sw}
    return q


def calibrate_resnet26(params, x, *, act_fn=None):
    """Static activation scales from one calibration batch.

    Runs the f32 forward mirroring :func:`resnet.apply_resnet26` exactly
    (conv7 stem) and records the absmax of every conv input. x:
    [N, H, W, 3] normalized tiles — use a few hundred representative
    tiles; scales are per-tensor scalars.
    """
    act = act_fn or N.leaky_relu
    scales = {"stages": []}

    scales["conv1"] = _scale_of(x)
    h = N.conv2d(x, params["conv1"]["w"], params["conv1"]["b"], stride=2,
                 padding=3)
    h = N.max_pool(act(h))
    for stage_idx, stage in enumerate(params["stages"]):
        ss = []
        for b, block in enumerate(stage):
            stride = 2 if (stage_idx > 0 and b == 0) else 1
            sb = {"conv1": _scale_of(h)}  # downsample shares this input
            out = act(N.conv2d(h, block["conv1"]["w"], block["conv1"]["b"],
                               stride=stride, padding=1))
            sb["conv2"] = _scale_of(out)
            out = N.conv2d(out, block["conv2"]["w"], block["conv2"]["b"],
                           stride=1, padding=1)
            if "downsample" in block:
                identity = N.conv2d(h, block["downsample"]["w"],
                                    stride=stride, padding=0)
            else:
                identity = h
            h = act(out + identity)
            ss.append(sb)
        scales["stages"].append(ss)
    scales["fc"] = _scale_of(N.global_avg_pool(h))
    return scales


def _conv_i8(site, x_i8, sx, *, stride, padding, impl="conv"):
    """int8 conv with int32 accumulation, dequantized to f32.

    impl="conv": ``lax.conv_general_dilated`` with int8 operands —
    whether XLA's conv emitter taps the MXU int8 rate at these shapes is
    the empirical question. impl="dot": explicit im2col (kh*kw strided
    int8 slices, memory-bound VPU work) feeding one int8x int8->int32
    ``dot_general`` — the documented quantized-matmul path on TPU, but
    its patch buffer is kh*kw x the activation bytes (watch HBM at big
    batches). impl="shift": kh*kw SEPARATE [.,cin]x[cin,cout] int8 dots
    accumulated in int32 — no patch buffer (peak extra = the int32 acc
    the other impls also hold), at the cost of K=cin-thin matmuls. All
    three produce BIT-IDENTICAL int32 accumulations (tested); only the
    lowering differs."""
    from jax import lax

    # normalize the padding form ONCE so every impl honors both the int
    # and the [(lo, hi), (lo, hi)] spellings (the hand lowerings pad via
    # jnp.pad, which needs explicit per-edge values)
    p = [(padding, padding)] * 2 if isinstance(padding, int) else padding
    if impl == "dot":
        acc = _conv_i8_dot_acc(site["wq"], x_i8, stride=stride, padding=p)
    elif impl == "shift":
        acc = _conv_i8_shift_acc(site["wq"], x_i8, stride=stride, padding=p)
    else:
        acc = lax.conv_general_dilated(
            x_i8, site["wq"], window_strides=(stride, stride), padding=p,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
    out = acc.astype(jnp.float32) * (sx * site["sw"])
    if "b" in site:
        out = out + site["b"]
    return out


def _conv_i8_dot_acc(wq, x_i8, *, stride, padding):
    """im2col + int8 dot_general: [N,H,W,Cin] int8 -> [N,OH,OW,Cout] int32.

    Patch columns are built from kh*kw strided slices concatenated on the
    channel axis in (dy, dx, cin) order — exactly the C-order flatten of
    the HWIO weight, so one reshape pairs them for the MXU matmul.
    ``padding`` is the normalized pair-list form."""
    from jax import lax

    kh, kw, cin, cout = wq.shape
    x = jnp.pad(x_i8, ((0, 0), tuple(padding[0]), tuple(padding[1]),
                       (0, 0)))
    n = x.shape[0]
    oh = (x.shape[1] - kh) // stride + 1
    ow = (x.shape[2] - kw) // stride + 1
    cols = []
    for dy in range(kh):
        for dx in range(kw):
            cols.append(lax.slice(
                x, (0, dy, dx, 0),
                (n, dy + (oh - 1) * stride + 1,
                 dx + (ow - 1) * stride + 1, cin),
                (1, stride, stride, 1)))
    patches = jnp.concatenate(cols, axis=-1)       # [N,OH,OW,kh*kw*cin]
    acc = lax.dot_general(
        patches.reshape(n * oh * ow, kh * kw * cin),
        wq.reshape(kh * kw * cin, cout),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.reshape(n, oh, ow, cout)


def _conv_i8_shift_acc(wq, x_i8, *, stride, padding):
    """Shift-add int8 conv: one thin [., cin] x [cin, cout] int8 dot per
    (dy, dx) tap, summed in int32 — same math as im2col without its
    kh*kw-times patch buffer. ``padding`` is the normalized pair-list
    form."""
    from jax import lax

    kh, kw, cin, cout = wq.shape
    x = jnp.pad(x_i8, ((0, 0), tuple(padding[0]), tuple(padding[1]),
                       (0, 0)))
    n = x.shape[0]
    oh = (x.shape[1] - kh) // stride + 1
    ow = (x.shape[2] - kw) // stride + 1
    acc = jnp.zeros((n * oh * ow, cout), jnp.int32)
    for dy in range(kh):
        for dx in range(kw):
            sl = lax.slice(
                x, (0, dy, dx, 0),
                (n, dy + (oh - 1) * stride + 1,
                 dx + (ow - 1) * stride + 1, cin),
                (1, stride, stride, 1))
            acc = acc + lax.dot_general(
                sl.reshape(n * oh * ow, cin), wq[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
    return acc.reshape(n, oh, ow, cout)


def apply_resnet26_int8(qparams, scales, x, *, act_fn=None, impl="conv"):
    """Quantized forward: x [N, H, W, 3] f32 tiles -> [N, embed] f32.

    Same topology as :func:`resnet.apply_resnet26` (conv7 stem);
    elementwise glue (dequant -> lrelu -> residual add -> requant) stays
    f32 and fuses into the adjacent convs under XLA, so the tensors that
    actually land in HBM between convs are the int8 operands.
    ``impl`` picks the conv lowering (see :func:`_conv_i8`).
    """
    act = act_fn or N.leaky_relu
    h = _conv_i8(qparams["conv1"], _quant(x, scales["conv1"]),
                 scales["conv1"], stride=2, padding=3, impl=impl)
    h = N.max_pool(act(h))
    for stage_idx, (stage, sstage) in enumerate(
            zip(qparams["stages"], scales["stages"])):
        for b, (block, sb) in enumerate(zip(stage, sstage)):
            stride = 2 if (stage_idx > 0 and b == 0) else 1
            h_i8 = _quant(h, sb["conv1"])
            out = act(_conv_i8(block["conv1"], h_i8, sb["conv1"],
                               stride=stride, padding=1, impl=impl))
            out = _conv_i8(block["conv2"], _quant(out, sb["conv2"]),
                           sb["conv2"], stride=1, padding=1, impl=impl)
            if "downsample" in block:
                identity = _conv_i8(block["downsample"], h_i8, sb["conv1"],
                                    stride=stride, padding=0, impl=impl)
            else:
                identity = h
            h = act(out + identity)
    h = N.global_avg_pool(h)
    h_i8 = _quant(h, scales["fc"])
    out = jnp.dot(h_i8.astype(jnp.int32),
                  qparams["fc"]["wq"].astype(jnp.int32))
    return out.astype(jnp.float32) * (scales["fc"] * qparams["fc"]["sw"])


def quantize_and_calibrate(params, calib_tiles):
    """One-call convenience: (qparams, scales) for apply_resnet26_int8."""
    return quantize_resnet26(params), calibrate_resnet26(params, calib_tiles)


def calib_tiles_from_builder(builder, want: int, resolution: int):
    """First ``want`` eval-transformed tiles of a slide WITHOUT
    materializing the full bag: the raw uint8 cache is memory-mapped and
    only the leading slice is transformed — safe on 50k-tile slides whose
    full eval bag would exhaust host+device memory. Returns None for a
    tile-less slide (calibrating on the zeros fallback would floor every
    activation scale to 1e-8 and corrupt all subsequent predictions)."""
    import numpy as np

    raw = builder._load_cache(mmap=True)
    n = min(int(want), int(raw.shape[0]))
    if n == 0:
        return None
    from ..data import transforms

    return transforms.eval_transform(jnp.asarray(np.asarray(raw[:n])),
                                     resolution=resolution)


def make_int8_transform_extract(cnn_params, calib_tiles, resolution: int,
                                *, qp_sc=None, impl="conv"):
    """Per-chunk streaming program for the int8 serving path: raw uint8
    tiles -> eval_transform -> int8 forward, one jitted dispatch. Drop-in
    for ``parallel.inference.classify_slide_streaming(...,
    transform_extract=...)`` — same ``(cnn, raw_u8) -> [N, L]`` contract
    as the default fused program (the live cnn arg is ignored; quantized
    weights are baked at build time)."""
    import jax

    from ..data import transforms

    qp, sc = (qp_sc if qp_sc is not None
              else quantize_and_calibrate(cnn_params, calib_tiles))

    @jax.jit
    def run(_cnn_params_unused, raw_u8):
        tiles = transforms.eval_transform(raw_u8, resolution=resolution)
        return apply_resnet26_int8(qp, sc, tiles, impl=impl)

    return run


def make_int8_extractor(cnn_params, calib_tiles, *, qp_sc=None,
                        impl="conv"):
    """Quantize + calibrate once, return an ``extractor`` callable for
    ``apply_attention_mil(..., extractor=...)`` (the pluggable tile
    embedder). The returned closure ignores the live cnn params — the
    quantized weights are baked at build time (serving semantics).
    Pass ``qp_sc`` to share one calibration across several closures."""
    qp, sc = (qp_sc if qp_sc is not None
              else quantize_and_calibrate(cnn_params, calib_tiles))

    def extract(_cnn_params_unused, tiles):
        return apply_resnet26_int8(qp, sc, tiles, impl=impl)

    return extract
