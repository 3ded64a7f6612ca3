"""Bidirectional checkpoint interop with the reference PyTorch stack.

A reference user arrives with trained checkpoints written by
``gbm/classify_combined.py:468-474`` — torch pickles of
``{'classifier': state_dict, 'optimizer': state_dict}`` named
``train_step-<epoch:03d>[_FINAL].model``. ``import_state_dict`` maps such a
state_dict onto our flattened npz checkpoint format (the one
``train.checkpoint`` reads), so ``--ckpt imported.model`` /
``--transfer`` work on reference-trained weights unchanged.
``export_state_dict`` goes the other way: our params become a state_dict
the reference ``Attention`` model loads with ``strict=False``
(reference: gbm/classify_combined.py:521-535).

Key-name contract (reference: gbm/model.py:114-157, 14-48;
nnBlocks.py:157-185):

* ``cnn.module.conv1.{weight,bias}`` — the 7x7 stem (DataParallel adds
  the ``module.`` segment, gbm/model.py:132-135)
* ``cnn.module.layer{1..4}.{b}.conv{1,2}.{weight,bias}`` and
  ``...{b}.downsample.0.weight`` on shape-changing blocks
* ``cnn.module.fc.weight`` — the bias-free embedding head
* ``context.bn.{weight,bias}`` — BatchNorm1d without running stats, so
  no ``running_mean``/``running_var`` keys exist
* ``attention.lin{1,2}.{weight,bias}``, ``buffer.lin1.*``,
  ``buffer.classifier.*`` — the OrderedDict-named MLPs
* ``weight_mask`` — the learnable per-map gate

Layout transforms: torch conv weights are [O, I, kh, kw] vs our NHWC
[kh, kw, I, O]; torch linear weights are [O, I] vs our [I, O]. The
optimizer state_dict is NOT importable — torch Adam keys slots by
positional parameter index — so imports restart with a fresh optimizer,
which matches the reference's own ``--transfer`` semantics.

CLI:

    python -m <pkg>.utils.torch_interop import  ref.model  out.model
    python -m <pkg>.utils.torch_interop export  ours.model out_ref.model
"""

import re

import numpy as np

# ref-key regexes -> ('/'-joined our-key template, layout transform).
# Matched against state_dict keys so downsample presence, stage count,
# and block count all come from the checkpoint itself (any widths/blocks
# config round-trips without a schema).
_CONV = "conv"   # [O,I,kh,kw] <-> [kh,kw,I,O]
_LIN = "lin"     # [O,I] <-> [I,O]
_VEC = "vec"     # identity

_IMPORT_RULES = [
    (re.compile(r"^cnn\.conv1\.weight$"), "cnn/conv1/w", _CONV),
    (re.compile(r"^cnn\.conv1\.bias$"), "cnn/conv1/b", _VEC),
    (re.compile(r"^cnn\.layer(\d+)\.(\d+)\.conv([12])\.weight$"),
     "cnn/stages/{s}/{b}/conv{c}/w", _CONV),
    (re.compile(r"^cnn\.layer(\d+)\.(\d+)\.conv([12])\.bias$"),
     "cnn/stages/{s}/{b}/conv{c}/b", _VEC),
    (re.compile(r"^cnn\.layer(\d+)\.(\d+)\.downsample\.0\.weight$"),
     "cnn/stages/{s}/{b}/downsample/w", _CONV),
    (re.compile(r"^cnn\.fc\.weight$"), "cnn/fc/w", _LIN),
    (re.compile(r"^context\.bn\.weight$"), "context/gamma", _VEC),
    (re.compile(r"^context\.bn\.bias$"), "context/beta", _VEC),
    (re.compile(r"^attention\.lin([12])\.weight$"),
     "attention/lin{c}/w", _LIN),
    (re.compile(r"^attention\.lin([12])\.bias$"),
     "attention/lin{c}/b", _VEC),
    (re.compile(r"^buffer\.lin1\.weight$"), "buffer/lin1/w", _LIN),
    (re.compile(r"^buffer\.lin1\.bias$"), "buffer/lin1/b", _VEC),
    (re.compile(r"^buffer\.classifier\.weight$"),
     "buffer/classifier/w", _LIN),
    (re.compile(r"^buffer\.classifier\.bias$"),
     "buffer/classifier/b", _VEC),
    (re.compile(r"^weight_mask$"), "weight_mask", _VEC),
]


def _to_ours(arr, kind):
    arr = np.asarray(arr)
    if kind == _CONV:
        return np.transpose(arr, (2, 3, 1, 0))
    if kind == _LIN:
        return arr.T
    return arr


def _to_torch(arr, kind):
    arr = np.asarray(arr)
    if kind == _CONV:
        return np.transpose(arr, (3, 2, 0, 1))
    if kind == _LIN:
        return arr.T
    return arr


def _normalize_key(key: str) -> str:
    """Strip DataParallel wrapper segments so rules see canonical names.

    The reference wraps only the ResNet in DataParallel
    (``cnn.module.conv1...``), but users who re-wrapped the whole model
    produce a leading ``module.`` too — tolerate both.
    """
    if key.startswith("module."):
        key = key[len("module."):]
    return key.replace("cnn.module.", "cnn.", 1)


def import_state_dict(sd) -> tuple[dict, list, list]:
    """Reference state_dict -> our flat ``classifier/...`` blob.

    Returns (blob, imported_ref_keys, skipped_ref_keys). Unknown keys
    (``loss.*`` buffers, ``num_batches_tracked``...) are skipped, which
    mirrors the reference's own ``strict=False`` restore.
    """
    blob, imported, skipped = {}, [], []
    for key, value in sd.items():
        norm = _normalize_key(key)
        for rx, template, kind in _IMPORT_RULES:
            m = rx.match(norm)
            if not m:
                continue
            g = m.groups()
            if template.startswith("cnn/stages"):
                if norm.startswith("cnn.layer"):
                    fields = {"s": int(g[0]) - 1, "b": int(g[1])}
                    if len(g) > 2:
                        fields["c"] = g[2]
                    ours = template.format(**fields)
                else:  # pragma: no cover - defensive
                    ours = template
            elif "{c}" in template:
                ours = template.format(c=g[0])
            else:
                ours = template
            blob[f"classifier/{ours}"] = _to_ours(
                value.numpy() if hasattr(value, "numpy") else value, kind)
            imported.append(key)
            break
        else:
            skipped.append(key)
    return blob, imported, skipped


# our-key regexes -> reference-key template (inverse direction).
_EXPORT_RULES = [
    (re.compile(r"^cnn/conv1/w$"), "cnn.module.conv1.weight", _CONV),
    (re.compile(r"^cnn/conv1/b$"), "cnn.module.conv1.bias", _VEC),
    (re.compile(r"^cnn/stages/(\d+)/(\d+)/conv([12])/w$"),
     "cnn.module.layer{s}.{b}.conv{c}.weight", _CONV),
    (re.compile(r"^cnn/stages/(\d+)/(\d+)/conv([12])/b$"),
     "cnn.module.layer{s}.{b}.conv{c}.bias", _VEC),
    (re.compile(r"^cnn/stages/(\d+)/(\d+)/downsample/w$"),
     "cnn.module.layer{s}.{b}.downsample.0.weight", _CONV),
    (re.compile(r"^cnn/fc/w$"), "cnn.module.fc.weight", _LIN),
    (re.compile(r"^context/gamma$"), "context.bn.weight", _VEC),
    (re.compile(r"^context/beta$"), "context.bn.bias", _VEC),
    (re.compile(r"^attention/lin([12])/w$"),
     "attention.lin{c}.weight", _LIN),
    (re.compile(r"^attention/lin([12])/b$"), "attention.lin{c}.bias", _VEC),
    (re.compile(r"^buffer/lin1/w$"), "buffer.lin1.weight", _LIN),
    (re.compile(r"^buffer/lin1/b$"), "buffer.lin1.bias", _VEC),
    (re.compile(r"^buffer/classifier/w$"),
     "buffer.classifier.weight", _LIN),
    (re.compile(r"^buffer/classifier/b$"),
     "buffer.classifier.bias", _VEC),
    (re.compile(r"^weight_mask$"), "weight_mask", _VEC),
]


def _export_flat(flat: dict) -> dict:
    """'/'-keyed attention-MIL leaves -> reference-keyed numpy arrays."""
    out = {}
    for okey, value in flat.items():
        for rx, template, kind in _EXPORT_RULES:
            m = rx.match(okey)
            if not m:
                continue
            g = m.groups()
            if okey.startswith("cnn/stages"):
                fields = {"s": int(g[0]) + 1, "b": int(g[1])}
                if len(g) > 2:
                    fields["c"] = g[2]
                ref = template.format(**fields)
            elif "{c}" in template:
                ref = template.format(c=g[0])
            else:
                ref = template
            out[ref] = _to_torch(value, kind)
            break
        else:
            raise KeyError(f"no reference mapping for parameter {okey!r}")
    return out


def export_state_dict(params) -> dict:
    """Our attention-MIL params -> reference-keyed numpy state_dict."""
    from ..train.checkpoint import _flatten

    return _export_flat(_flatten(params))


def import_checkpoint(src: str, dest: str, *,
                      unsafe_pickle: bool = False) -> tuple[list, list]:
    """Convert a reference torch checkpoint file into our .model npz."""
    import torch

    from ..train.checkpoint import save_blob

    try:
        ckpt = torch.load(src, map_location="cpu",
                          weights_only=not unsafe_pickle)
    except Exception as e:  # torch raises pickle.UnpicklingError subclasses
        if unsafe_pickle:
            raise
        raise RuntimeError(
            f"weights_only load of {src!r} failed ({e}); if you trust this "
            "file, retry with --unsafe-pickle") from e
    sd = ckpt.get("classifier", ckpt) if isinstance(ckpt, dict) else ckpt
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    blob, imported, skipped = import_state_dict(sd)
    if not imported:
        raise ValueError(
            f"{src!r} contains no recognizable reference parameters "
            f"(saw keys like {list(sd)[:3]})")
    blob["extra/imported_from"] = np.asarray(src)
    blob["extra/format"] = np.asarray("torch-reference")
    save_blob(dest, blob)
    return imported, skipped


def export_checkpoint(src: str, dest: str) -> list:
    """Convert our .model npz into a reference-loadable torch checkpoint."""
    import torch

    from ..train.checkpoint import load_raw

    blob = load_raw(src)
    params_flat = {k[len("classifier/"):]: v for k, v in blob.items()
                   if k.startswith("classifier/")}
    out = {k: torch.from_numpy(np.ascontiguousarray(v))
           for k, v in _export_flat(params_flat).items()}
    torch.save({"classifier": out}, dest)
    return sorted(out)


# ------------------------------------------------------------------
# StyleGAN interop (style-based-gan-pytorch checkpoints)
#
# The reference GAN trainer saves torch pickles of
# ``{'generator': sd, 'discriminator': sd, 'g_optimizer': ...,
#    'd_optimizer': ..., 'g_running': sd}``
# (reference: style-based-gan-pytorch-master-512/train.py:209-216) plus
# bare g_running snapshots (``checkpoint/NNNNNN.model``, :195-196).
# These map onto our 5-section npz (train/gan.py::save_gan_checkpoint).
#
# EqualLR stores weights unit-normal under ``weight_orig`` and applies
# sqrt(2/fan_in) at forward (model.py:24-53) — exactly our convention
# (models/stylegan.py::equal_scale) — so values copy over verbatim;
# only layouts change. Blur ``weight``/``weight_flip`` buffers are
# deterministic (model.py:165-179) and are regenerated on export so
# strict ``load_state_dict`` succeeds.

_FUP = "fup"      # FusedUpsample [I,O,k,k] <-> [k,k,I,O]
_NOISE = "noise"  # NoiseInjection [1,C,1,1] <-> [C]
_CONST = "const"  # ConstantInput [1,C,4,4] <-> [1,4,4,C]

_SKIP = object()    # known non-parameter (blur buffers)
_UNKNOWN = object() # unrecognized -> reported


def _sg_to_ours(arr, kind):
    arr = np.asarray(arr)
    if kind == _FUP:
        return np.transpose(arr, (2, 3, 0, 1))
    if kind == _NOISE:
        return arr.reshape(-1)
    if kind == _CONST:
        return np.transpose(arr, (0, 2, 3, 1))
    return _to_ours(arr, kind)


def _sg_to_torch(arr, kind):
    arr = np.asarray(arr)
    if kind == _FUP:
        return np.transpose(arr, (2, 3, 0, 1))
    if kind == _NOISE:
        return arr.reshape(1, -1, 1, 1)
    if kind == _CONST:
        return np.transpose(arr, (0, 3, 1, 2))
    return _to_torch(arr, kind)


def _wb(name):
    return "w" if name == "weight_orig" else "b"


def _sg_gen_map(key):
    """StyledGenerator state_dict key -> (our flat key, kind)."""
    m = re.match(r"^style\.(\d+)\.linear\.(weight_orig|bias)$", key)
    if m:  # Sequential: PixelNorm at 0, EqualLinear at 1,3,5,...
        j = (int(m.group(1)) - 1) // 2
        s = _wb(m.group(2))
        return f"style/{j}/{s}", (_LIN if s == "w" else _VEC)
    m = re.match(r"^generator\.to_rgb\.(\d+)\.conv\.(weight_orig|bias)$", key)
    if m:
        s = _wb(m.group(2))
        return (f"generator/to_rgb/{m.group(1)}/{s}",
                _CONV if s == "w" else _VEC)
    m = re.match(r"^generator\.progression\.(\d+)\.(.+)$", key)
    if not m:
        return None, _UNKNOWN
    base, rest = f"generator/progression/{m.group(1)}", m.group(2)
    if rest == "conv1.input":
        return f"{base}/constant", _CONST
    if rest in ("conv1.conv.weight_orig", "conv1.1.conv.weight_orig"):
        return f"{base}/conv1/w", _CONV
    if rest in ("conv1.conv.bias", "conv1.1.conv.bias", "conv1.0.bias"):
        return f"{base}/conv1/b", _VEC
    if rest == "conv1.0.weight":
        return f"{base}/conv1/w", _FUP
    if re.match(r"^conv1\.[12]\.(weight|weight_flip)$", rest):
        return None, _SKIP  # blur buffers
    m2 = re.match(r"^noise([12])\.weight_orig$", rest)
    if m2:
        return f"{base}/noise{m2.group(1)}", _NOISE
    m2 = re.match(r"^adain([12])\.style\.linear\.(weight_orig|bias)$", rest)
    if m2:
        s = _wb(m2.group(2))
        return (f"{base}/adain{m2.group(1)}/{s}", _LIN if s == "w" else _VEC)
    m2 = re.match(r"^conv2\.conv\.(weight_orig|bias)$", rest)
    if m2:
        s = _wb(m2.group(1))
        return f"{base}/conv2/{s}", (_CONV if s == "w" else _VEC)
    return None, _UNKNOWN


def _sg_disc_map(key):
    """Discriminator state_dict key -> (our flat key, kind)."""
    m = re.match(r"^linear\.linear\.(weight_orig|bias)$", key)
    if m:
        s = _wb(m.group(1))
        return f"linear/{s}", (_LIN if s == "w" else _VEC)
    m = re.match(r"^from_rgb\.(\d+)\.(?:0\.)?conv\.(weight_orig|bias)$", key)
    if m:  # with/without the from_rgb_activate Sequential wrapper
        s = _wb(m.group(2))
        return f"from_rgb/{m.group(1)}/{s}", (_CONV if s == "w" else _VEC)
    m = re.match(r"^progression\.(\d+)\.(.+)$", key)
    if not m:
        return None, _UNKNOWN
    base, rest = f"progression/{m.group(1)}", m.group(2)
    if rest == "conv1.0.conv.weight_orig":
        return f"{base}/conv1/w", _CONV
    if rest == "conv1.0.conv.bias":
        return f"{base}/conv1/b", _VEC
    # conv2 variants (reference model.py:238-262): plain final block has
    # EqualConv2d at Sequential index 0; downsample has Blur at 0 and
    # EqualConv2d at 1; fused has Blur at 0 and FusedDownsample at 1
    # (whose params sit directly at conv2.1.weight, layout [O,I,k,k])
    if rest in ("conv2.0.conv.weight_orig", "conv2.1.conv.weight_orig",
                "conv2.1.weight"):
        return f"{base}/conv2/w", _CONV
    if rest in ("conv2.0.conv.bias", "conv2.1.conv.bias", "conv2.1.bias"):
        return f"{base}/conv2/b", _VEC
    if re.match(r"^conv2\.0\.(weight|weight_flip)$", rest):
        return None, _SKIP  # blur buffers
    return None, _UNKNOWN


def _convert_gan_sd(sd, mapper):
    out, imported, skipped = {}, [], []
    for key, value in sd.items():
        norm = key[len("module."):] if key.startswith("module.") else key
        ours, kind = mapper(norm)
        if kind is _SKIP:
            continue
        if kind is _UNKNOWN:
            skipped.append(key)
            continue
        arr = value.numpy() if hasattr(value, "numpy") else value
        out[ours] = _sg_to_ours(arr, kind)
        imported.append(key)
    return out, imported, skipped


def import_gan_checkpoint(src: str, dest: str, *,
                          unsafe_pickle: bool = False):
    """Reference StyleGAN torch checkpoint -> our 5-section npz.

    Accepts the full trainer checkpoint (sections converted to
    ``generator/``, ``discriminator/``, ``g_running/``) or a bare
    g_running snapshot (written to BOTH ``g_running/`` and
    ``generator/`` so trainer resume fine-tunes the EMA weights instead
    of silently keeping random generator init). Optimizer slots are
    positional in torch and are never imported.
    """
    import torch

    from ..train.checkpoint import save_blob

    try:
        ckpt = torch.load(src, map_location="cpu",
                          weights_only=not unsafe_pickle)
    except Exception as e:
        if unsafe_pickle:
            raise
        raise RuntimeError(
            f"weights_only load of {src!r} failed ({e}); if you trust this "
            "file, retry with --unsafe-pickle") from e
    if hasattr(ckpt, "state_dict"):
        ckpt = ckpt.state_dict()
    if not isinstance(ckpt, dict):
        raise ValueError(f"{src!r} is not a checkpoint dict")

    blob, imported, skipped = {}, [], []
    if any(k in ckpt for k in ("generator", "g_running", "discriminator")):
        sections = [("generator", "generator", _sg_gen_map),
                    ("g_running", "g_running", _sg_gen_map),
                    ("discriminator", "discriminator", _sg_disc_map)]
        for tkey, section, mapper in sections:
            if tkey not in ckpt:
                continue
            conv, imp, skp = _convert_gan_sd(ckpt[tkey], mapper)
            blob.update({f"{section}/{k}": v for k, v in conv.items()})
            imported += [f"{tkey}.{k}" for k in imp]
            skipped += [f"{tkey}.{k}" for k in skp]
        skipped += [k for k in ckpt
                    if k not in ("generator", "g_running", "discriminator")]
    else:  # bare StyledGenerator state_dict (g_running snapshot)
        conv, imported, skipped = _convert_gan_sd(ckpt, _sg_gen_map)
        for section in ("g_running", "generator"):
            blob.update({f"{section}/{k}": v for k, v in conv.items()})
    if not imported:
        raise ValueError(
            f"{src!r} contains no recognizable StyleGAN parameters "
            f"(saw keys like {list(ckpt)[:3]})")
    blob["extra/imported_from"] = np.asarray(src)
    blob["extra/format"] = np.asarray("torch-stylegan")
    save_blob(dest, blob)
    return imported, skipped


# generator blocks >= _GEN_FUSED_FROM and discriminator blocks <
# _DISC_FUSED_BELOW use the fused resample convs — fixed per-resolution
# split hardcoded by the reference (model.py:383-391, 515-523) and by
# our layouts (models/stylegan.py::_gen_layout/_disc_layout)
_GEN_FUSED_FROM = 5
_DISC_FUSED_BELOW = 4
_N_BLOCKS = 9


def _blur_buffers(channels: int):
    k = np.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], np.float32)
    k = (k / k.sum()).reshape(1, 1, 3, 3).repeat(channels, 0)
    return k, k.copy()  # symmetric kernel: flip == identity


def export_gan_checkpoint(src: str, dest: str):
    """Our GAN npz checkpoint -> reference-loadable torch checkpoint.

    Emits ``generator``/``g_running``/``discriminator`` state_dicts with
    EqualLR naming, from_rgb_activate-style keys (the trainers' default,
    reference train.py:248-272), and regenerated Blur buffers so even a
    strict ``load_state_dict`` (generate.py) succeeds.
    """
    import torch

    from ..train.checkpoint import load_raw

    blob = load_raw(src)
    sections = sorted({k.split("/", 1)[0] for k in blob
                       if not k.startswith("extra/")})
    out = {}
    for section in sections:
        flat = {k.split("/", 1)[1]: v for k, v in blob.items()
                if k.startswith(f"{section}/")}
        if section in ("generator", "g_running"):
            out[section] = _export_gen_sd(flat)
        elif section == "discriminator":
            out[section] = _export_disc_sd(flat)
        # optimizer sections are optax pytrees; torch cannot consume them
    if not out:
        raise ValueError(f"{src!r} has no generator/discriminator sections")
    out = {sec: {k: torch.from_numpy(np.ascontiguousarray(v))
                 for k, v in sd.items()} for sec, sd in out.items()}
    torch.save(out, dest)
    return {sec: len(sd) for sec, sd in out.items()}


def _export_gen_sd(flat):
    sd = {}
    n_blocks = 1 + max(int(k.split("/")[2]) for k in flat
                       if k.startswith("generator/progression/"))
    if n_blocks != _N_BLOCKS:
        raise ValueError(
            f"expected {_N_BLOCKS} generator blocks, found {n_blocks}; "
            "the reference layout is fixed (model.py:383-391)")
    for okey, value in flat.items():
        parts = okey.split("/")
        if parts[0] == "style":
            torch_idx = 2 * int(parts[1]) + 1
            name = "weight_orig" if parts[2] == "w" else "bias"
            sd[f"style.{torch_idx}.linear.{name}"] = _sg_to_torch(
                value, _LIN if parts[2] == "w" else _VEC)
        elif parts[1] == "to_rgb":
            name = "weight_orig" if parts[3] == "w" else "bias"
            sd[f"generator.to_rgb.{parts[2]}.conv.{name}"] = _sg_to_torch(
                value, _CONV if parts[3] == "w" else _VEC)
        elif parts[1] == "progression":
            i, leaf = int(parts[2]), parts[3]
            base = f"generator.progression.{i}"
            fused = i >= _GEN_FUSED_FROM
            if leaf == "constant":
                sd[f"{base}.conv1.input"] = _sg_to_torch(value, _CONST)
            elif leaf == "conv1":
                name = "weight" if parts[4] == "w" else "bias"
                prefix = (f"{base}.conv1.0.{name}" if fused
                          else f"{base}.conv1.1.conv."
                               + ("weight_orig" if parts[4] == "w" else "bias"))
                kind = (_FUP if fused else _CONV) if parts[4] == "w" else _VEC
                sd[prefix] = _sg_to_torch(value, kind)
            elif leaf in ("noise1", "noise2"):
                sd[f"{base}.{leaf}.weight_orig"] = _sg_to_torch(value, _NOISE)
            elif leaf in ("adain1", "adain2"):
                name = "weight_orig" if parts[4] == "w" else "bias"
                sd[f"{base}.{leaf}.style.linear.{name}"] = _sg_to_torch(
                    value, _LIN if parts[4] == "w" else _VEC)
            elif leaf == "conv2":
                name = "weight_orig" if parts[4] == "w" else "bias"
                sd[f"{base}.conv2.conv.{name}"] = _sg_to_torch(
                    value, _CONV if parts[4] == "w" else _VEC)
            else:  # pragma: no cover - defensive
                raise KeyError(f"no reference mapping for {okey!r}")
        else:  # pragma: no cover - defensive
            raise KeyError(f"no reference mapping for {okey!r}")
    # blur buffers: generator blurs follow conv1 on upsample blocks
    for i in range(1, _N_BLOCKS):
        c = flat[f"generator/progression/{i}/conv2/w"].shape[2]
        w, wf = _blur_buffers(c)
        blur_idx = 1 if i >= _GEN_FUSED_FROM else 2
        base = f"generator.progression.{i}.conv1.{blur_idx}"
        sd[f"{base}.weight"], sd[f"{base}.weight_flip"] = w, wf
    return sd


def _export_disc_sd(flat):
    sd = {}
    n_blocks = 1 + max(int(k.split("/")[1]) for k in flat
                       if k.startswith("progression/"))
    if n_blocks != _N_BLOCKS:
        raise ValueError(
            f"expected {_N_BLOCKS} discriminator blocks, found {n_blocks}; "
            "the reference layout is fixed (model.py:515-523)")
    for okey, value in flat.items():
        parts = okey.split("/")
        if parts[0] == "linear":
            name = "weight_orig" if parts[1] == "w" else "bias"
            sd[f"linear.linear.{name}"] = _sg_to_torch(
                value, _LIN if parts[1] == "w" else _VEC)
        elif parts[0] == "from_rgb":
            # from_rgb_activate=True keys (the reference trainers' default)
            name = "weight_orig" if parts[2] == "w" else "bias"
            sd[f"from_rgb.{parts[1]}.0.conv.{name}"] = _sg_to_torch(
                value, _CONV if parts[2] == "w" else _VEC)
        elif parts[0] == "progression":
            i, leaf = int(parts[1]), parts[2]
            base, is_w = f"progression.{i}", parts[3] == "w"
            fused, plain = i < _DISC_FUSED_BELOW, i == _N_BLOCKS - 1
            if leaf == "conv1":
                name = "weight_orig" if is_w else "bias"
                sd[f"{base}.conv1.0.conv.{name}"] = _sg_to_torch(
                    value, _CONV if is_w else _VEC)
            elif leaf == "conv2":
                if fused:  # FusedDownsample params sit directly at conv2.1
                    name = "weight" if is_w else "bias"
                    sd[f"{base}.conv2.1.{name}"] = _sg_to_torch(
                        value, _CONV if is_w else _VEC)
                else:
                    idx = 0 if plain else 1
                    name = "weight_orig" if is_w else "bias"
                    sd[f"{base}.conv2.{idx}.conv.{name}"] = _sg_to_torch(
                        value, _CONV if is_w else _VEC)
            else:  # pragma: no cover - defensive
                raise KeyError(f"no reference mapping for {okey!r}")
        else:  # pragma: no cover - defensive
            raise KeyError(f"no reference mapping for {okey!r}")
    for i in range(_N_BLOCKS - 1):  # blur precedes every downsample conv2
        c = flat[f"progression/{i}/conv2/w"].shape[2]
        w, wf = _blur_buffers(c)
        base = f"progression.{i}.conv2.0"
        sd[f"{base}.weight"], sd[f"{base}.weight_flip"] = w, wf
    return sd


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(
        description="Convert checkpoints between the reference torch "
                    "format and this framework's npz format.")
    sub = p.add_subparsers(dest="cmd", required=True)
    imp = sub.add_parser("import", help="reference torch .model -> ours")
    imp.add_argument("src")
    imp.add_argument("dest")
    imp.add_argument("--unsafe-pickle", action="store_true",
                     help="allow full pickle load for pre-weights_only "
                          "checkpoints you trust")
    exp = sub.add_parser("export", help="our .model npz -> reference torch")
    exp.add_argument("src")
    exp.add_argument("dest")
    gimp = sub.add_parser(
        "import-gan", help="reference StyleGAN torch checkpoint -> ours")
    gimp.add_argument("src")
    gimp.add_argument("dest")
    gimp.add_argument("--unsafe-pickle", action="store_true")
    gexp = sub.add_parser(
        "export-gan", help="our GAN npz checkpoint -> reference torch")
    gexp.add_argument("src")
    gexp.add_argument("dest")
    args = p.parse_args(argv)

    if args.cmd == "import-gan":
        imported, skipped = import_gan_checkpoint(
            args.src, args.dest, unsafe_pickle=args.unsafe_pickle)
        print(f"imported {len(imported)} tensors -> {args.dest}")
        if skipped:
            print(f"skipped {len(skipped)} keys (optimizer state / "
                  f"buffers): {skipped[:4]}"
                  f"{'...' if len(skipped) > 4 else ''}")
        print("note: torch optimizer state is positional and is not "
              "imported; GAN training resumes with fresh Adam state")
    elif args.cmd == "export-gan":
        counts = export_gan_checkpoint(args.src, args.dest)
        print(f"exported {counts} -> {args.dest}")
    elif args.cmd == "import":
        imported, skipped = import_checkpoint(
            args.src, args.dest, unsafe_pickle=args.unsafe_pickle)
        print(f"imported {len(imported)} tensors -> {args.dest}")
        if skipped:
            print(f"skipped {len(skipped)} non-parameter keys: "
                  f"{skipped[:6]}{'...' if len(skipped) > 6 else ''}")
        print("note: torch optimizer state is positional and is not "
              "imported; training resumes with a fresh optimizer "
              "(reference --transfer semantics)")
    else:
        keys = export_checkpoint(args.src, args.dest)
        print(f"exported {len(keys)} tensors -> {args.dest}")


if __name__ == "__main__":
    main()
