"""AOT deployment bundles: ship compiled serving programs, not Python.

``export_serving_bundle`` serializes the two streaming-inference
programs — the fused uint8-transform→ResNet-26 extractor at every chunk
shape the streaming loop can mint, and the bucketed masked attention
pool — to StableHLO via ``jax.export``, next to the weights
(checkpoint .model format) and a JSON manifest. A serving host then
classifies slides through ``DeployedClassifier`` with NO model-building
code on the import path: the programs are data, the weights are data,
and the host-side loop (chunking, padding, assembly, softmax) is ~50
lines of numpy. This is the TPU-native analog of the torch ecosystem's
TorchScript/ONNX export, which the reference lacks entirely (its
deployment story is "run classify_combined.py --interface",
gbm/classify_combined.py:221-298).

Why it matters for production: the training/serving skew surface
shrinks to a directory of immutable artifacts; model-code upgrades
cannot silently change a deployed classifier; and the compile happens
at EXPORT time semantics-wise — the target host just lowers the
embedded StableHLO (multi-platform bundles cover cpu+tpu hosts).

Exported programs take the weights as ARGUMENTS, so a re-trained
checkpoint with identical shapes reuses the same bundle programs via
``swap_weights``.

CLI::

    python -m ...deploy export --ckpt run/train_step-340.model \
        --out bundle/ [--tiles 4096] [--platforms cpu,tpu]
    python -m ...deploy run --bundle bundle/ --slide GHP_x.npy
"""

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

from .models import attention_mil as amil

MANIFEST = "manifest.json"
WEIGHTS = "weights.model"
BUNDLE_VERSION = 1


def _spec_tree(tree):
    return jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype),
        tree)


def _program_shapes(chunk: int, tiles: int, n_dev: int = 1):
    """The exact (extractor chunk shapes, pool bucket sizes) the
    streaming loop can mint for slides up to ``tiles`` tiles — THE shared
    enumeration (parallel/inference.py), same one serve --prewarm uses."""
    from .parallel.inference import streaming_program_shapes

    return streaming_program_shapes(chunk, tiles, n_dev)


def export_serving_bundle(params, cfg: amil.MILConfig, out_dir: str, *,
                          resolution: int = 300, roi_size: int = 1200,
                          chunk: int = 1024, tiles: int = 4096,
                          platforms=None, compute_dtype=jnp.bfloat16
                          ) -> dict:
    """Serialize the streaming serving programs + weights + manifest.

    Returns the manifest dict. ``platforms=None`` lowers for the current
    backend only; pass e.g. ``("cpu", "tpu")`` for a bundle that serves
    on either host type."""
    from jax import export as jexport

    from .parallel import inference
    from .train import checkpoint

    os.makedirs(out_dir, exist_ok=True)
    chunks, pools = _program_shapes(chunk, tiles)

    extract = inference._cached_transform_extract(cfg, compute_dtype,
                                                  resolution)
    pool = inference._cached_pool(cfg)
    cnn_spec = _spec_tree(params["cnn"])
    params_spec = _spec_tree(params)
    kw = {"platforms": tuple(platforms)} if platforms else {}

    files = {}
    for b in chunks:
        exp = jexport.export(extract, **kw)(
            cnn_spec, jax.ShapeDtypeStruct((b, roi_size, roi_size, 3),
                                           jnp.uint8))
        name = f"extract_{b}.shlo"
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(exp.serialize())
        files[f"extract/{b}"] = name
    for t in pools:
        exp = jexport.export(pool, **kw)(
            params_spec, jax.ShapeDtypeStruct((t, cfg.L), jnp.float32),
            jax.ShapeDtypeStruct((), jnp.int32))
        name = f"pool_{t}.shlo"
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(exp.serialize())
        files[f"pool/{t}"] = name

    checkpoint.save(os.path.join(out_dir, WEIGHTS), params)
    manifest = {
        "bundle_version": BUNDLE_VERSION,
        "jax_version": jax.__version__,
        # record canonical jax.export platform names: default_backend()
        # says 'gpu' but export/lowering names are 'cuda'/'rocm', and the
        # load-time re-export hint must only ever suggest canonical names
        "platforms": list(platforms) if platforms
        else [_canonical_backend()],
        "resolution": resolution, "roi_size": roi_size,
        "compute_dtype": jnp.dtype(compute_dtype).name,
        "chunk": chunk, "max_tiles": tiles,
        "chunk_shapes": chunks, "pool_buckets": pools,
        "feature_dim": cfg.L, "n_classes": cfg.n_classes,
        "config": dataclasses.asdict(cfg),
        "programs": files,
    }
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def _canonical_backend() -> str:
    """jax.default_backend() in jax.export's canonical platform names.
    'gpu' is not a lowering platform — and it also conflates two
    incompatible vendor stacks: a bundle lowered for cuda cannot run on
    a rocm host. The backend's platform_version is the one runtime
    string that records which stack this jaxlib targets."""
    backend = jax.default_backend()
    if backend != "gpu":
        return backend
    try:
        version = jax.devices()[0].client.platform_version
    except Exception:
        version = ""
    return "rocm" if "rocm" in version.lower() else "cuda"


def _unflatten(flat: dict):
    """Rebuild the exact init_attention_mil pytree from '/'-joined keys
    (checkpoint._flatten's inverse): dicts for named nodes, LISTS for
    all-digit key groups (the resnet 'stages' nesting) — the treedef
    must match export-time params or Exported.call rejects the args."""
    tree = {}
    for key in sorted(flat):
        parts = key.split("/")
        d = tree
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(flat[key])

    def listify(node):
        if not isinstance(node, dict):
            return node
        node = {k: listify(v) for k, v in node.items()}
        if node and all(k.isdigit() for k in node):
            return [node[k] for k in sorted(node, key=int)]
        return node

    return listify(tree)


class DeployedClassifier:
    """Streaming slide classification from a bundle directory alone.

    Mirrors ``parallel.inference.classify_slide_streaming``'s host loop
    (chunk off the ladder, pad, extract, host-assemble, bucketed masked
    pool, host softmax) with the two device programs coming from the
    serialized StableHLO instead of the model code. Slides above
    ``max_tiles`` raise — export with a larger ``--tiles``."""

    def __init__(self, bundle_dir: str):
        from jax import export as jexport

        from .train import checkpoint

        with open(os.path.join(bundle_dir, MANIFEST)) as f:
            self.manifest = json.load(f)
        if self.manifest["bundle_version"] != BUNDLE_VERSION:
            raise ValueError(
                f"bundle version {self.manifest['bundle_version']} != "
                f"supported {BUNDLE_VERSION}")
        # fail at LOAD time on a platform-mismatched bundle: without this
        # a tpu-only bundle on a cpu host starts serving and every slide
        # dies with a low-level jax.export platform error deep in the
        # drain loop's retry/backoff
        backend = jax.default_backend()
        # jax.default_backend() says 'gpu' while jax.export platform
        # names are 'cuda'/'rocm' — and the two gpu stacks are NOT
        # interchangeable, so resolve which one this host actually is
        # instead of accepting any gpu-family name. Legacy manifests
        # that stored the non-canonical 'gpu' still match a gpu host
        # (we cannot know which stack stamped them).
        canon_backend = _canonical_backend()
        matching = {canon_backend} | ({"gpu"} if backend == "gpu"
                                      else set())
        plats = self.manifest.get("platforms") or []
        if plats and not (matching & set(plats)):
            # canonicalize BOTH sides of the hint: 'gpu' is rejected by
            # jax.export as a lowering platform. A legacy 'gpu' manifest
            # entry resolves to this host's stack when the host IS a
            # gpu, else to 'cuda' (the common stack) as the best guess.
            legacy_gpu = canon_backend if backend == "gpu" else "cuda"
            canon = lambda p: {"gpu": legacy_gpu}.get(p, p)  # noqa: E731
            hint = sorted({canon(p) for p in plats} | {canon_backend})
            raise ValueError(
                f"bundle was lowered for platforms {plats} but the "
                f"current backend is {canon_backend!r}; re-export with "
                f"--platforms {','.join(hint)}")
        blob = checkpoint.load_raw(os.path.join(bundle_dir, WEIGHTS))
        self.params = _unflatten(
            {k[len("classifier/"):]: v for k, v in blob.items()
             if k.startswith("classifier/")})
        self._extract, self._pool = {}, {}
        for key, name in self.manifest["programs"].items():
            kind, size = key.split("/")
            with open(os.path.join(bundle_dir, name), "rb") as f:
                prog = jexport.deserialize(f.read())
            (self._extract if kind == "extract" else self._pool)[
                int(size)] = prog

    def classify(self, raw_tiles: np.ndarray):
        """[T, roi, roi, 3] uint8 -> (probs [n_classes], outs dict).

        Program selection reads the MANIFEST's recorded shape lists, not
        the live library's bucket ladder: a bundle must keep serving
        after a library upgrade that tweaks ``DEFAULT_BUCKETS`` (the
        exported programs are immutable; choosing the smallest recorded
        shape that fits reproduces the export-time arithmetic exactly
        when the ladders agree and stays total when they don't)."""
        T = int(raw_tiles.shape[0])
        if T == 0:
            raise ValueError("deploy bundles serve tiled slides only; "
                             "a tile-less slide has no exported program "
                             "(the library's zero-bag fallback needs the "
                             "one-pass forward)")
        if T > self.manifest["max_tiles"]:
            raise ValueError(f"slide has {T} tiles > bundle max_tiles "
                             f"{self.manifest['max_tiles']}; re-export "
                             "with a larger --tiles")
        chunks = sorted(self._extract)
        chunk = next((c for c in chunks if c >= T), chunks[-1])
        extract = self._extract[chunk]
        cnn = self.params["cnn"]
        feats = []
        for start in range(0, T, chunk):
            part = np.asarray(raw_tiles[start:start + chunk])
            valid = part.shape[0]
            if valid < chunk:
                part = np.pad(part, [(0, chunk - valid)] + [(0, 0)] * 3)
            feats.append((extract.call(cnn, part), valid))
        H = np.concatenate([np.asarray(f)[:v] for f, v in feats], axis=0)
        pools = sorted(self._pool)
        Tb = next(b for b in pools if b >= T)  # exists: T <= max_tiles
        Hp = H
        if Tb > T:
            Hp = np.zeros((Tb, H.shape[1]), H.dtype)
            Hp[:T] = H
        pooled = self._pool[Tb].call(self.params, jnp.asarray(Hp),
                                     jnp.int32(T))
        pooled = {k: np.asarray(v) for k, v in pooled.items()}
        # exact-T output contract, same as classify_slide_streaming:
        # consumers zip Aterm/wROIs/Bterm against the T-row coords raster
        pooled = {**pooled, "Aterm": pooled["Aterm"][:, :T],
                  "wROIs": pooled["wROIs"][:, :T],
                  "Bterm": pooled["Bterm"][:T]}
        z = pooled["logits"].astype(np.float32)
        z = np.exp(z - z.max(axis=1, keepdims=True))
        probs = z / z.sum(axis=1, keepdims=True)
        outs = {**pooled, "y_pred": probs,
                "y_pred_hat": int(np.argmax(probs)), "Fterm": H}
        return probs.ravel(), outs

    def classify_builder(self, builder, *, mmap: bool = True):
        """RoiBuilder -> (probs, outs, coords); resolution comes from the
        bundle (the transform is baked into the extractor program)."""
        raw, coords = builder._load_cache(with_coords=True, mmap=mmap)
        probs, outs = self.classify(raw)
        return probs, outs, coords

    def swap_weights(self, params):
        """Point the bundle at a re-trained pytree of identical
        shapes/dtypes (programs take weights as arguments, so no
        re-export needed). Dtype is part of the traced signature: a bf16
        pytree against f32-exported programs would otherwise fail deep in
        Exported.call instead of here."""
        def check(a, b):
            if (np.shape(a) != np.shape(b)
                    or np.asarray(a).dtype != np.asarray(b).dtype):
                raise ValueError(
                    f"swap_weights: leaf {np.shape(b)}/"
                    f"{np.asarray(b).dtype} does not match bundle "
                    f"{np.shape(a)}/{np.asarray(a).dtype}")

        jax.tree_util.tree_map(check, self.params, params)
        self.params = params


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="AOT serving bundles")
    sub = p.add_subparsers(dest="cmd", required=True)
    pe = sub.add_parser("export")
    pe.add_argument("--ckpt", default=None,
                    help=".model checkpoint (random init with a warning "
                         "if unset — smoke tests only)")
    pe.add_argument("--out", required=True)
    pe.add_argument("--arch", default="full", choices=["full", "tiny"])
    pe.add_argument("--stem", default="conv7", choices=["conv7", "s2d"],
                    help="s2d = space-to-depth stem fast path (identical "
                         "math, faster TPU ingest — see PROFILE.md); "
                         "baked into the exported extractor programs")
    pe.add_argument("--resolution", default=300, type=int)
    pe.add_argument("--roi_size", default=1200, type=int)
    pe.add_argument("--chunk", default=1024, type=int)
    pe.add_argument("--tiles", default=4096, type=int)
    pe.add_argument("--platforms", default=None,
                    help="comma-separated lowering targets, e.g. cpu,tpu "
                         "(default: current backend)")
    pe.add_argument("--f32", action="store_true",
                    help="trace the extractor at f32 instead of bf16")
    pe.add_argument("--seed", default=0, type=int)
    pr = sub.add_parser("run")
    pr.add_argument("--bundle", required=True)
    pr.add_argument("--slide", required=True)
    args = p.parse_args(argv)

    if args.cmd == "export":
        from .train import checkpoint
        from .train.classify import make_config

        cfg = make_config(args)
        params = amil.init_attention_mil(jax.random.PRNGKey(args.seed), cfg)
        if args.ckpt:
            params, loaded, skipped = checkpoint.restore_params(
                params, args.ckpt)
            print(f"deploy: loaded {len(loaded)} tensors "
                  f"({len(skipped)} skipped) from {args.ckpt}")
        else:
            print("deploy: WARNING — no --ckpt, exporting random weights "
                  "(smoke-test mode)")
        platforms = (tuple(s.strip() for s in args.platforms.split(","))
                     if args.platforms else None)
        manifest = export_serving_bundle(
            params, cfg, args.out, resolution=args.resolution,
            roi_size=args.roi_size, chunk=args.chunk, tiles=args.tiles,
            platforms=platforms,
            compute_dtype=jnp.float32 if args.f32 else jnp.bfloat16)
        n = len(manifest["programs"])
        print(f"deploy: exported {n} programs "
              f"(chunks {manifest['chunk_shapes']}, "
              f"pools {manifest['pool_buckets']}) -> {args.out}")
        return 0

    from .data.roibuilder import RoiBuilder

    clf = DeployedClassifier(args.bundle)
    builder = RoiBuilder(args.slide,
                         {"roi_size": clf.manifest["roi_size"]})
    if "MISSING" in builder.params["status"] and not builder.build():
        print(f"deploy: cache build failed for {args.slide}",
              file=sys.stderr)
        return 1
    builder.update_resolution_and_buffer(clf.manifest["resolution"])
    try:
        probs, outs, _ = clf.classify_builder(builder)
    except ValueError as e:  # tile-less slide / over max_tiles
        print(f"deploy: {e}", file=sys.stderr)
        return 1
    print(json.dumps({"name": builder.getname(),
                      "probs": [round(float(x), 6) for x in probs],
                      "pred": int(outs["y_pred_hat"]),
                      "ntiles": builder.getsize()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
