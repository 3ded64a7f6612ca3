"""AOT deployment bundles (deploy.py): export -> serialized StableHLO +
weights + manifest; DeployedClassifier must match the live streaming
path bit-for-bit-ish (f32 pool tolerance) WITHOUT building the model.
"""

import json
import os

import numpy as np
import pytest

import jax

from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu import (
    deploy,
)
from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.models import (
    attention_mil as amil,
)

CFG = amil.MILConfig(widths=(8, 8, 8, 8), blocks=(1, 1, 1, 1))


@pytest.fixture
def bundle(tmp_path):
    params = amil.init_attention_mil(jax.random.PRNGKey(0), CFG)
    out = str(tmp_path / "bundle")
    manifest = deploy.export_serving_bundle(
        params, CFG, out, resolution=16, roi_size=32, chunk=16, tiles=64)
    return out, params, manifest


def _tiles(n, roi=32, seed=0):
    rng = np.random.default_rng(seed)
    return np.clip(np.array([140, 60, 170], np.int16)
                   + rng.integers(-40, 40, (n, roi, roi, 3)),
                   0, 255).astype(np.uint8)


def test_bundle_matches_live_streaming(bundle, tmp_path, monkeypatch):
    """Exported programs == live classify_slide_streaming, at a size
    below one chunk AND a size spanning chunks with pool pad."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.data import (
        roibuilder,
    )
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.parallel import (
        inference,
    )

    out, params, manifest = bundle
    clf = deploy.DeployedClassifier(out)
    cache = tmp_path / "cache"
    cache.mkdir()
    monkeypatch.setenv("CACHE_DIR", str(cache))
    for i, T in enumerate((5, 41)):  # below chunk; 3 chunks + pool pad
        tiles = _tiles(T, seed=i)
        base = f"GHP_{i}_A_H&E"
        np.save(cache / f"data_{base}_rois_size32_hsvcut_v3.npy", tiles)
        np.save(cache / f"coor_{base}_rois_size32_hsvcut_v3.npy",
                np.zeros((T, 2), np.int64))
        b = roibuilder.RoiBuilder(str(tmp_path / f"{base}.npy"),
                                  {"roi_size": 32})
        b.update_resolution_and_buffer(16)
        probs_live, outs_live, _ = inference.classify_slide_streaming(
            params, CFG, b, resolution=16, chunk=16)
        probs_dep, outs_dep, _ = clf.classify_builder(b)
        np.testing.assert_allclose(probs_dep, probs_live, atol=1e-5)
        np.testing.assert_allclose(outs_dep["Aterm"], outs_live["Aterm"],
                                   atol=1e-4)
        assert outs_dep["Aterm"].shape[1] == T


def test_bundle_is_model_code_free(bundle):
    """The load path must not call the model builders: poison them."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.models import (
        resnet,
    )

    out, params, _ = bundle

    def boom(*a, **k):  # noqa: ANN001
        raise AssertionError("model builder called on the deploy path")

    orig_init, orig_apply = resnet.init_resnet26, resnet.apply_resnet26
    orig_mil = amil.init_attention_mil
    try:
        resnet.init_resnet26 = boom
        resnet.apply_resnet26 = boom
        amil.init_attention_mil = boom
        clf = deploy.DeployedClassifier(out)
        probs, outs = clf.classify(_tiles(7))
    finally:
        resnet.init_resnet26, resnet.apply_resnet26 = orig_init, orig_apply
        amil.init_attention_mil = orig_mil
    assert abs(probs.sum() - 1.0) < 1e-5
    assert outs["Fterm"].shape == (7, CFG.L)


def test_bundle_guards(bundle):
    out, _, manifest = bundle
    clf = deploy.DeployedClassifier(out)
    with pytest.raises(ValueError, match="max_tiles"):
        clf.classify(_tiles(manifest["max_tiles"] + 1))
    with pytest.raises(ValueError, match="tile-less"):
        clf.classify(_tiles(0))
    # version gate
    mpath = os.path.join(out, deploy.MANIFEST)
    m = json.load(open(mpath))
    m["bundle_version"] = 999
    json.dump(m, open(mpath, "w"))
    with pytest.raises(ValueError, match="bundle version"):
        deploy.DeployedClassifier(out)


def test_bundle_survives_ladder_drift(bundle, monkeypatch):
    """Program selection must read the MANIFEST's recorded shapes, not
    the live library's bucket ladder: a library upgrade that tweaks
    the ladder must not KeyError existing bundles. Patching the
    CONSTANT is not enough (bucket_for binds DEFAULT_BUCKETS as a
    def-time default), so poison the behavior itself: any call into
    the live ladder helpers during bundle classify fails the test."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.data import (
        loader,
    )
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.parallel import (
        inference,
    )

    out, params, manifest = bundle
    clf = deploy.DeployedClassifier(out)

    def poisoned(*a, **k):
        raise AssertionError("bundle classify consulted the live bucket "
                             "ladder instead of the manifest")

    monkeypatch.setattr(loader, "bucket_for", poisoned)
    monkeypatch.setattr(inference, "streaming_chunk_for", poisoned)
    for T in (5, 17, 41, 64):  # below chunk, off-ladder, multi-chunk, max
        probs, outs = clf.classify(_tiles(T, seed=T))
        assert abs(probs.sum() - 1.0) < 1e-5
        # exact-T output contract (same as classify_slide_streaming)
        assert outs["Aterm"].shape[1] == T
        assert outs["wROIs"].shape[1] == T
        assert outs["Bterm"].shape[0] == T


def test_bundle_platform_gate(bundle):
    """A platform-mismatched bundle fails at LOAD, not per-slide in the
    serve drain loop."""
    out, _, _ = bundle
    mpath = os.path.join(out, deploy.MANIFEST)
    m = json.load(open(mpath))
    m["platforms"] = ["nonexistent_backend"]
    json.dump(m, open(mpath, "w"))
    with pytest.raises(ValueError, match="lowered for platforms"):
        deploy.DeployedClassifier(out)


def test_bundle_platform_gate_gpu_canonicalization(bundle, monkeypatch):
    """The gate must distinguish the two gpu stacks (a cuda bundle is
    NOT loadable on a rocm host) and its re-export hint must only name
    canonical jax.export platforms — 'gpu' is not one."""
    out, _, _ = bundle
    mpath = os.path.join(out, deploy.MANIFEST)
    m = json.load(open(mpath))
    m["platforms"] = ["cuda"]
    json.dump(m, open(mpath, "w"))

    # a rocm host must reject a cuda-only bundle, naming both stacks
    monkeypatch.setattr(deploy.jax, "default_backend", lambda: "gpu")
    monkeypatch.setattr(deploy, "_canonical_backend", lambda: "rocm")
    with pytest.raises(ValueError) as e:
        deploy.DeployedClassifier(out)
    assert "--platforms cuda,rocm" in str(e.value)
    assert "'gpu'" not in str(e.value)

    # the matching cuda host loads it
    monkeypatch.setattr(deploy, "_canonical_backend", lambda: "cuda")
    deploy.DeployedClassifier(out)

    # legacy manifests that stored the non-canonical 'gpu' still load
    # on a gpu host of either stack (we cannot know which stamped them)
    m["platforms"] = ["gpu"]
    json.dump(m, open(mpath, "w"))
    deploy.DeployedClassifier(out)

    # but a cpu host rejects them, and the hint canonicalizes the
    # legacy 'gpu' to 'cuda' rather than suggesting an invalid platform
    monkeypatch.setattr(deploy.jax, "default_backend", lambda: "cpu")
    monkeypatch.setattr(deploy, "_canonical_backend", lambda: "cpu")
    with pytest.raises(ValueError) as e:
        deploy.DeployedClassifier(out)
    assert "--platforms cpu,cuda" in str(e.value)


def test_swap_weights(bundle):
    """Re-trained same-shape weights reuse the programs; wrong shapes
    are rejected."""
    out, params, _ = bundle
    clf = deploy.DeployedClassifier(out)
    tiles = _tiles(9)
    p0 = clf.classify(tiles)[0]
    bumped = jax.tree_util.tree_map(lambda x: x * 1.5, params)
    clf.swap_weights(bumped)
    p1 = clf.classify(tiles)[0]
    assert not np.allclose(p0, p1)
    wrong = amil.init_attention_mil(
        jax.random.PRNGKey(1),
        amil.MILConfig(widths=(4, 4, 4, 4), blocks=(1, 1, 1, 1)))
    with pytest.raises(Exception):
        clf.swap_weights(wrong)
    # dtype is part of the traced signature — reject before Exported.call
    import jax.numpy as jnp

    bf16 = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.bfloat16), params)
    with pytest.raises(ValueError, match="does not match bundle"):
        clf.swap_weights(bf16)


@pytest.mark.slow
def test_deploy_cli_roundtrip(tmp_path, monkeypatch):
    cache = tmp_path / "cache"
    cache.mkdir()
    monkeypatch.setenv("CACHE_DIR", str(cache))
    tiles = _tiles(12)
    base = "GHP_7_B_H&E"
    np.save(cache / f"data_{base}_rois_size32_hsvcut_v3.npy", tiles)
    np.save(cache / f"coor_{base}_rois_size32_hsvcut_v3.npy",
            np.zeros((12, 2), np.int64))
    slide = tmp_path / f"{base}.npy"
    slide.write_bytes(b"fake")  # cache hit: file content never read

    out = str(tmp_path / "bundle")
    rc = deploy.main(["export", "--out", out, "--arch", "tiny",
                      "--resolution", "16", "--roi_size", "32",
                      "--chunk", "16", "--tiles", "64"])
    assert rc == 0
    assert os.path.isfile(os.path.join(out, deploy.MANIFEST))
    rc = deploy.main(["run", "--bundle", out, "--slide", str(slide)])
    assert rc == 0
