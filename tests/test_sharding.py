"""Multi-device mesh execution: sharded eval/train must match single-device
numerics (the GSPMD replacement for the reference's nn.DataParallel)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gbmnet  # noqa: F401
from gbmnet.models import attention_mil as amil
from gbmnet.parallel import mesh as M
from gbmnet.parallel import steps


@pytest.fixture(scope="module")
def world():
    assert jax.device_count() >= 8, "conftest should provide 8 CPU devices"
    cfg = amil.MILConfig()
    params = amil.init_attention_mil(jax.random.PRNGKey(0), cfg)
    tiles = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 32, 32, 3))
    masks = jnp.ones((2, 8)).at[1, 6:].set(0.0)
    labels = jnp.array([0, 2])
    return cfg, params, tiles, masks, labels


def test_mesh_shape():
    m = M.make_mesh(8)
    assert m.devices.shape == (2, 4)
    assert m.axis_names == (M.SLIDES_AXIS, M.TILES_AXIS)
    m1 = M.make_mesh(1)
    assert m1.devices.shape == (1, 1)


def test_sharded_eval_matches_single_device(world):
    cfg, params, tiles, masks, labels = world
    ev = steps.make_eval_step(cfg)
    ref = ev(params, tiles, masks, labels)

    mesh = M.make_mesh(8)
    s_tiles, s_masks, s_labels = steps.shard_batch(mesh, tiles, masks, labels)
    sharded = ev(params, s_tiles, s_masks, s_labels)

    np.testing.assert_allclose(np.asarray(sharded["y_pred"]),
                               np.asarray(ref["y_pred"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sharded["loss"]),
                               np.asarray(ref["loss"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sharded["Aterm"]),
                               np.asarray(ref["Aterm"]), atol=1e-5)


def test_sharded_train_step_matches_single_device(world):
    cfg, params, tiles, masks, labels = world
    step = steps.make_train_step(cfg, donate=False)
    rng = jax.random.PRNGKey(42)
    lr = jnp.float32(2e-4)

    st0 = steps.init_train_state(params)
    ref_state, ref_metrics = step(st0, tiles, masks, labels, lr, rng)

    mesh = M.make_mesh(8)
    st1 = steps.replicate_state(mesh, steps.init_train_state(params))
    s_tiles, s_masks, s_labels = steps.shard_batch(mesh, tiles, masks, labels)
    sh_state, sh_metrics = step(st1, s_tiles, s_masks, s_labels, lr, rng)

    np.testing.assert_allclose(float(sh_metrics["loss"]),
                               float(ref_metrics["loss"]), atol=1e-5)
    ref_w = np.asarray(ref_state.params["attention"]["lin1"]["w"])
    sh_w = np.asarray(sh_state.params["attention"]["lin1"]["w"])
    np.testing.assert_allclose(sh_w, ref_w, atol=1e-5)
    cnn_ref = np.asarray(ref_state.params["cnn"]["conv1"]["w"])
    cnn_sh = np.asarray(sh_state.params["cnn"]["conv1"]["w"])
    np.testing.assert_allclose(cnn_sh, cnn_ref, atol=1e-5)


def test_explicit_shard_map_pool_matches_unsharded():
    """shard_map+psum pooling (parallel/shard_pool.py) == attention_pool
    on one device, including masked padding and the batch-norm stats."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.models import (
        attention_mil as amil,
    )
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.parallel import (
        mesh as M,
        shard_pool,
    )

    cfg = amil.MILConfig(L=16, D=8)
    params = amil.init_attention_mil(jax.random.PRNGKey(0), cfg)
    mesh = M.make_mesh(8, slides=1)  # all 8 devices on the tile axis
    rng = np.random.default_rng(3)
    T = 64  # divisible by 8
    H = jnp.asarray(rng.standard_normal((T, cfg.L)), jnp.float32)
    mask = jnp.zeros((T,)).at[:50].set(1.0)  # ragged bag: 50 real tiles

    ref = amil.attention_pool(params, H, cfg, mask=mask, train=False)
    pool = shard_pool.make_sharded_pool(cfg, mesh)
    Hs, ms = shard_pool.shard_features(mesh, H, mask)
    got = pool(params, Hs, ms)

    np.testing.assert_allclose(np.asarray(got["logits"]),
                               np.asarray(ref["logits"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got["Mterm"]),
                               np.asarray(ref["Mterm"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got["Aterm"]),
                               np.asarray(ref["Aterm"]), atol=1e-5)


def test_streaming_inference_sharded_matches_single(tmp_path, monkeypatch):
    """Streaming + mesh: chunks stream in time while each chunk's tile
    axis shards over all 8 devices — probabilities must match the
    unsharded streaming pass exactly (per-tile extractor, no collectives)."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.data import (
        roibuilder,
        slide_io,
    )
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.parallel import (
        inference,
        mesh as M,
    )

    monkeypatch.setenv("CACHE_DIR", str(tmp_path))
    rng = np.random.default_rng(9)
    base = np.array([140, 60, 170], np.int16)
    img = np.clip(base + rng.integers(-40, 40, (400, 400, 3)), 0,
                  255).astype(np.uint8)
    path = slide_io.write_synthetic_slide(str(tmp_path / "s.npy"), img)
    builder = roibuilder.RoiBuilder(path, {"roi_size": 64})
    builder.build()
    cfg = amil.MILConfig(widths=(8, 8, 8, 8), blocks=(1, 1, 1, 1))
    params = amil.init_attention_mil(jax.random.PRNGKey(0), cfg)

    p_single, _, coords = inference.classify_slide_streaming(
        params, cfg, builder, resolution=32, chunk=16, compute_dtype=None)
    mesh = M.make_mesh(8)
    p_mesh, outs, coords_m = inference.classify_slide_streaming(
        params, cfg, builder, resolution=32, chunk=16, compute_dtype=None,
        mesh=mesh)
    np.testing.assert_array_equal(coords, coords_m)
    np.testing.assert_allclose(p_mesh, p_single, atol=1e-6)
    assert outs["Fterm"].shape[0] == builder.getsize()


def test_six_device_mesh_with_lcm_bucketing():
    """Non-power-of-two mesh: a 6-device (1, 6) tile axis needs bags whose
    tile count is a multiple of 6 — bucket_for's lcm granule provides it —
    and the sharded eval must still match single-device exactly."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.data.loader import (
        bucket_for,
        pad_bag,
    )

    mesh = M.make_mesh(6, slides=1)  # all 6 devices on the tile axis
    mult = mesh.shape[M.TILES_AXIS]
    assert mesh.devices.size == 6 and mult == 6

    cfg = amil.MILConfig(widths=(4, 4, 4, 4), blocks=(1, 1, 1, 1), L=8, D=4)
    params = amil.init_attention_mil(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)

    T_real = 17  # awkward bag size
    target = bucket_for(T_real, multiple_of=mult)
    assert target % mult == 0 and target >= T_real
    bag = jnp.asarray(rng.random((T_real, 16, 16, 3)), jnp.float32)
    tiles, mask = pad_bag(bag, n_tiles=target)
    tiles = tiles[None]
    masks = mask[None]
    labels = jnp.asarray([1], jnp.int32)

    ev = steps.make_eval_step(cfg)
    ref = ev(params, tiles, masks, labels)
    s_tiles, s_masks, s_labels = steps.shard_batch(mesh, tiles, masks,
                                                   labels)
    sharded = ev(params, s_tiles, s_masks, s_labels)
    np.testing.assert_allclose(np.asarray(sharded["y_pred"]),
                               np.asarray(ref["y_pred"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sharded["loss"]),
                               np.asarray(ref["loss"]), atol=1e-6)
