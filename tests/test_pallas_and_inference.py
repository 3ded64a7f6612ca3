"""Fused Pallas pooling kernel parity + sharded inference paths."""

import numpy as np
import pytest

import conftest  # noqa: F401
import jax
import jax.numpy as jnp

from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.models import (
    attention_mil as amil,
)
from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.ops import (
    nn as N,
    pallas_pool,
)
from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.parallel import (
    inference,
    mesh as M,
)

TINY = amil.MILConfig(widths=(8, 8, 8, 8), blocks=(1, 1, 1, 1))


def _reference_pool(a_raw, b, mask, wm):
    act = jax.nn.softplus(a_raw)
    gated = (jax.nn.sigmoid(-10.0 * wm) * act + jax.nn.sigmoid(10.0 * wm))
    gated = gated * mask[:, None]
    a1 = N.l1_normalize(gated, axis=0)
    return a1.T @ b, a1.T, a1.T * b[:, 0][None, :]


@pytest.mark.parametrize("t,k,o", [(64, 3, 1), (100, 3, 1), (7, 5, 2)])
def test_pallas_pool_matches_reference(t, k, o):
    rng = np.random.default_rng(0)
    a_raw = jnp.asarray(rng.standard_normal((t, k)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((t, o)), jnp.float32)
    mask = jnp.asarray((rng.random(t) > 0.3).astype(np.float32))
    wm = jnp.asarray(rng.standard_normal((k,)), jnp.float32)

    m_got, a1t_got, w_got = pallas_pool.gated_attention_pool(a_raw, b, mask, wm)
    m_want, a1t_want, w_want = _reference_pool(a_raw, b, mask, wm)
    np.testing.assert_allclose(np.asarray(m_got), np.asarray(m_want),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(a1t_got), np.asarray(a1t_want),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(w_got), np.asarray(w_want),
                               atol=1e-6)


def test_model_pallas_pool_path_matches_default():
    params = amil.init_attention_mil(jax.random.PRNGKey(0), TINY)
    rng = np.random.default_rng(1)
    tiles = jnp.asarray(rng.random((24, 32, 32, 3)), jnp.float32)
    mask = jnp.ones((24,), jnp.float32).at[20:].set(0.0)
    out_a = amil.apply_attention_mil(params, tiles, 1, TINY, mask=mask,
                                     train=False)
    out_b = amil.apply_attention_mil(params, tiles, 1, TINY, mask=mask,
                                     train=False, use_pallas_pool=True)
    np.testing.assert_allclose(np.asarray(out_a["y_pred"]),
                               np.asarray(out_b["y_pred"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_a["Mterm"]),
                               np.asarray(out_b["Mterm"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_a["Aterm"]),
                               np.asarray(out_b["Aterm"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_a["wROIs"]),
                               np.asarray(out_b["wROIs"]), atol=1e-5)


def test_classify_slides_batched_sharded_matches_single():
    params = amil.init_attention_mil(jax.random.PRNGKey(0), TINY)
    rng = np.random.default_rng(2)
    bags = [rng.random((t, 32, 32, 3)).astype(np.float32)
            for t in (10, 16, 13, 16)]
    mesh = M.make_mesh(8)
    probs_sharded, _ = inference.classify_slides_batched(
        params, TINY, bags, mesh=mesh, compute_dtype=None)
    probs_single, _ = inference.classify_slides_batched(
        params, TINY, bags, mesh=None, compute_dtype=None)
    np.testing.assert_allclose(probs_sharded, probs_single, atol=1e-5)
    # and vs the unpadded per-bag forward
    for bag, p_row in zip(bags, probs_single):
        out = amil.apply_attention_mil(params, jnp.asarray(bag), 0, TINY,
                                       train=False)
        np.testing.assert_allclose(p_row, np.asarray(out["y_pred"]).ravel(),
                                   atol=1e-4)


def test_classify_slide_full_pipeline(tmp_path, monkeypatch):
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.data import (
        roibuilder,
        slide_io,
    )

    monkeypatch.setenv("CACHE_DIR", str(tmp_path))
    rng = np.random.default_rng(3)
    base = np.array([140, 60, 170], np.int16)
    img = np.clip(base + rng.integers(-40, 40, (300, 300, 3)), 0,
                  255).astype(np.uint8)
    path = slide_io.write_synthetic_slide(str(tmp_path / "s.npy"), img)
    builder = roibuilder.RoiBuilder(path, {"roi_size": 64})
    builder.build()
    params = amil.init_attention_mil(jax.random.PRNGKey(0), TINY)
    probs, outs, coords = inference.classify_slide(
        params, TINY, builder, resolution=32, compute_dtype=None,
        use_pallas_pool=False)
    assert probs.shape == (3,)
    np.testing.assert_allclose(probs.sum(), 1.0, atol=1e-5)
    assert outs["Aterm"].shape[1] == len(coords) == builder.getsize()


def test_streaming_empty_slide_matches_onepass(tmp_path, monkeypatch):
    """A tile-less slide must classify IDENTICALLY on the streaming and
    one-pass paths: both feed the post-transform f32 zero bag
    (RoiBuilder._empty_bag). Streaming previously pushed uint8 zeros
    through the fused eval transform (-1.0 per pixel) and disagreed with
    validation on the same slide."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.data import (
        roibuilder,
    )

    monkeypatch.setenv("CACHE_DIR", str(tmp_path))
    (tmp_path / "empty_H&E.npy").write_bytes(b"fake")
    np.save(tmp_path / "data_empty_H&E_rois_size64_hsvcut_v3.npy",
            np.zeros((0, 64, 64, 3), np.uint8))
    np.save(tmp_path / "coor_empty_H&E_rois_size64_hsvcut_v3.npy",
            np.zeros((0, 2), np.int64))
    builder = roibuilder.RoiBuilder(str(tmp_path / "empty_H&E.npy"),
                                    {"roi_size": 64})
    params = amil.init_attention_mil(jax.random.PRNGKey(0), TINY)
    p_stream, outs_s, coords_s = inference.classify_slide_streaming(
        params, TINY, builder, resolution=32, chunk=8, compute_dtype=None)
    p_once, outs_o, coords_o = inference.classify_slide(
        params, TINY, builder, resolution=32, compute_dtype=None,
        use_pallas_pool=False)
    assert coords_s.shape[0] == coords_o.shape[0] == 0
    np.testing.assert_array_equal(p_stream, p_once)  # same program now
    assert int(outs_s["y_pred_hat"]) == int(outs_o["y_pred_hat"])


def test_classify_slide_streaming_matches_onepass(tmp_path, monkeypatch):
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.data import (
        roibuilder,
        slide_io,
    )

    monkeypatch.setenv("CACHE_DIR", str(tmp_path))
    rng = np.random.default_rng(4)
    base = np.array([140, 60, 170], np.int16)
    img = np.clip(base + rng.integers(-40, 40, (400, 400, 3)), 0,
                  255).astype(np.uint8)
    path = slide_io.write_synthetic_slide(str(tmp_path / "s2.npy"), img)
    builder = roibuilder.RoiBuilder(path, {"roi_size": 64})
    builder.build()
    params = amil.init_attention_mil(jax.random.PRNGKey(0), TINY)

    p_stream, outs_s, coords_s = inference.classify_slide_streaming(
        params, TINY, builder, resolution=32, chunk=7, compute_dtype=None)
    p_once, outs_o, coords_o = inference.classify_slide(
        params, TINY, builder, resolution=32, compute_dtype=None,
        use_pallas_pool=False)
    np.testing.assert_array_equal(coords_s, coords_o)
    np.testing.assert_allclose(p_stream, p_once, atol=1e-5)
    np.testing.assert_allclose(np.asarray(outs_s["Aterm"]),
                               np.asarray(outs_o["Aterm"]), atol=1e-5)


def test_streaming_pool_compiles_once_per_bucket():
    """The streaming pool takes the tile count as a TRACED scalar over a
    bucketed feature matrix, so a heterogeneous serving cohort reuses one
    compiled program per bucket instead of compiling per slide size."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.data.loader import (
        bucket_for,
    )

    cfg = amil.MILConfig(widths=(8, 8, 8, 8), blocks=(1, 1, 1, 1),
                         L=24, D=8)  # unique cfg -> fresh _FWD_CACHE entry
    params = amil.init_attention_mil(jax.random.PRNGKey(1), cfg)
    pool = inference._cached_pool(cfg)
    for t in (5, 20, 31):  # all land on the 32 bucket
        tb = bucket_for(t)
        pool(params, jnp.zeros((tb, cfg.L)), jnp.int32(t))
    assert pool._cache_size() == 1
    pool(params, jnp.zeros((64, cfg.L)), jnp.int32(40))  # next bucket
    assert pool._cache_size() == 2


def test_bucketed_masked_pool_matches_exact_pool():
    """Zero-padding + mask must reproduce the exact-size pool bit-for-bit
    (to float tolerance): padded rows are excluded from the context
    batch-norm stats and zeroed before the L1 normalization."""
    cfg = amil.MILConfig(widths=(8, 8, 8, 8), blocks=(1, 1, 1, 1),
                         L=16, D=8)
    params = amil.init_attention_mil(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(5)
    t, tb = 20, 32
    h = jnp.asarray(rng.standard_normal((t, cfg.L)), jnp.float32)

    exact = amil.attention_pool(params, h, cfg, train=False)
    pool = inference._cached_pool(cfg)
    padded = pool(params, jnp.pad(h, ((0, tb - t), (0, 0))), jnp.int32(t))

    np.testing.assert_allclose(np.asarray(padded["logits"]),
                               np.asarray(exact["logits"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(padded["Aterm"])[:, :t],
                               np.asarray(exact["Aterm"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(padded["Aterm_var"]),
                               np.asarray(exact["Aterm_var"]), atol=1e-5)
    # padded attention columns are exactly zero (mask ran before L1)
    assert np.all(np.asarray(padded["Aterm"])[:, t:] == 0.0)


def test_pallas_pool_gradients_match_unfused():
    """The custom VJP of the fused kernel must match autodiff through the
    unfused chain for every differentiable input (training path)."""
    rng = np.random.default_rng(7)
    t, k, o = 40, 3, 1
    a_raw = jnp.asarray(rng.standard_normal((t, k)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((t, o)), jnp.float32)
    mask = jnp.ones((t,)).at[33:].set(0.0)
    wm = jnp.asarray(rng.standard_normal((k,)), jnp.float32)
    cm = jnp.asarray(rng.standard_normal((k, o)), jnp.float32)
    ca = jnp.asarray(rng.standard_normal((k, t)), jnp.float32)
    cw = jnp.asarray(rng.standard_normal((k, t)), jnp.float32)

    def fused_loss(a_raw, b, wm):
        m, a1t, w = pallas_pool.gated_attention_pool(a_raw, b, mask, wm)
        return jnp.sum(m * cm) + jnp.sum(a1t * ca) + jnp.sum(w * cw)

    def unfused_loss(a_raw, b, wm):
        m, a1t, w = _reference_pool(a_raw, b, mask, wm)
        return jnp.sum(m * cm) + jnp.sum(a1t * ca) + jnp.sum(w * cw)

    g_fused = jax.grad(fused_loss, argnums=(0, 1, 2))(a_raw, b, wm)
    g_ref = jax.grad(unfused_loss, argnums=(0, 1, 2))(a_raw, b, wm)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=2e-5)


@pytest.mark.slow
def test_model_trains_through_pallas_pool():
    """A full model grad with use_pallas_pool=True matches the XLA path."""
    params = amil.init_attention_mil(jax.random.PRNGKey(0), TINY)
    rng = np.random.default_rng(8)
    tiles = jnp.asarray(rng.random((16, 32, 32, 3)), jnp.float32)
    mask = jnp.ones((16,))

    def loss(p, fused):
        return amil.apply_attention_mil(
            p, tiles, 1, TINY, mask=mask, train=False,
            use_pallas_pool=fused)["loss"]

    g_fused = jax.grad(lambda p: loss(p, True))(params)
    g_plain = jax.grad(lambda p: loss(p, False))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_fused),
                    jax.tree_util.tree_leaves(g_plain)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_pallas_stem_u8_matches_conv7():
    """The fused u8-ingest stem kernel (implicit-GEMM halo formulation)
    must match conv7x7s2p3(normalize(x)) at bf16 tolerance for both
    normalize conventions, including the border correction for beta != 0
    (interpret mode; the on-chip A/B lives in tools/exp_stem_pallas.py
    and PROFILE.md)."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.ops import (
        nn as N,
        pallas_stem,
    )
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.models import (
        resnet,
    )

    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, (2, 300, 300, 3), np.uint8)
    params = resnet.init_resnet26(jax.random.PRNGKey(0))
    conv1 = params["conv1"]
    for alpha, beta in [(1 / 255.0, 0.0), (1 / 127.5, -1.0)]:
        ref_in = jnp.asarray(x, jnp.float32) * alpha + beta
        ref = N.conv2d(ref_in, conv1["w"], conv1["b"], stride=2, padding=3)
        got = pallas_stem.stem_u8_conv(conv1, jnp.asarray(x), alpha=alpha,
                                       beta=beta, interpret=True)
        scale = float(jnp.max(jnp.abs(ref)))
        err = float(jnp.max(jnp.abs(got - ref))) / scale
        assert err < 0.02, (alpha, beta, err)  # bf16 matmul tolerance

    with pytest.raises(ValueError, match="expects uint8"):
        pallas_stem.stem_u8_conv(conv1, jnp.zeros((1, 300, 300, 3)),
                                 alpha=1.0, beta=0.0)


def test_streaming_chunk_for_covers_granule_sizes():
    """The shared helper must mint, for every slide size, the exact chunk
    shape the streaming loop compiles — serve --prewarm enumerates its
    ladder through this function, so a drift here is a request-path
    compile spike prewarm promised to remove (advisor round 3)."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.parallel.inference import (  # noqa: E501
        streaming_chunk_for,
    )

    # slides >= the chunk stream at the chunk itself
    assert streaming_chunk_for(10_000, 1024) == 1024
    # small slides clamp to their ladder bucket, not the full chunk
    assert streaming_chunk_for(100, 1024) == 128
    # sizes between the top ladder bucket (2560) and the chunk land on
    # 1024-granules — the shapes the old prewarm enumeration missed
    assert streaming_chunk_for(3000, 4096) == 3072
    assert streaming_chunk_for(3500, 4096) == 4096
    # mesh: round UP to a device multiple, on bucket_for's own ladder
    assert streaming_chunk_for(30, 32, n_dev=6) == 36
    assert streaming_chunk_for(10_000, 1000, n_dev=6) == 1002
