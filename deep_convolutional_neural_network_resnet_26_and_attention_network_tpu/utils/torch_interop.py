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


def export_state_dict(params) -> dict:
    """Our attention-MIL params -> reference-keyed numpy state_dict."""
    from ..train.checkpoint import _flatten

    out = {}
    for okey, value in _flatten(params).items():
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
    # _EXPORT_RULES run on flat '/'-keys; reuse export_state_dict's loop
    # via a shim pytree (flat dict of one level is itself a valid pytree,
    # but _flatten would re-join keys containing '/' — map directly).
    out = {}
    for okey, value in params_flat.items():
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
            out[ref] = torch.from_numpy(np.ascontiguousarray(
                _to_torch(value, kind)))
            break
        else:
            raise KeyError(f"no reference mapping for parameter {okey!r}")
    torch.save({"classifier": out}, dest)
    return sorted(out)


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
    args = p.parse_args(argv)

    if args.cmd == "import":
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
