"""Aux-component tests: nnBlocks misc ops, WAE encoder/decoder/critic,
LatentUNet + cluster layer, stain deconvolution, cell/IHC datasets."""

import numpy as np
import pytest

import conftest  # noqa: F401
import jax
import jax.numpy as jnp

from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.data import (
    stain,
)
from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.models import (
    blocks,
    unet,
    wae,
)


# ------------------------------------------------------------------ blocks
def test_zero_dropout_unscaled():
    x = jnp.ones((1000,))
    out = blocks.zero_dropout(x, 0.5, jax.random.PRNGKey(0), train=True)
    vals = set(np.unique(np.asarray(out)).tolist())
    assert vals <= {0.0, 1.0}  # no 1/(1-p) rescale
    assert 0.3 < float(out.mean()) < 0.7
    np.testing.assert_array_equal(
        np.asarray(blocks.zero_dropout(x, 0.5, jax.random.PRNGKey(0),
                                       train=False)), np.asarray(x))


def test_rgb_to_he_res_identity_shape():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 8, 8, 3)), jnp.float32)
    out = blocks.rgb_to_he_res(x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_conv_block_variants_shapes():
    key = jax.random.PRNGKey(0)
    x = jnp.ones((2, 16, 16, 8))
    for kwargs, expect_hw in [
        (dict(downsample=False), 16),                 # padding=1 keeps size
        (dict(downsample=True, max2d=True), 8),
        (dict(downsample=True, fused=True), 8),
        (dict(downsample=True, fast=True), 4),        # stride2 + maxpool
        (dict(downsample=True), 8),                   # plain strided
    ]:
        p = blocks.init_conv_block(key, 8, 12, 3, **kwargs)
        out = blocks.apply_conv_block(p, x, padding=1, **kwargs)
        assert out.shape == (2, expect_hw, expect_hw, 12), kwargs


def test_tiny_extractor():
    key = jax.random.PRNGKey(1)
    p = blocks.init_tiny_extractor(key, 48)
    x = jnp.ones((3, 128, 128, 3))
    out = blocks.apply_tiny_extractor(p, x, 48)
    assert out.shape == (3, 48)


def test_ml_classifier():
    key = jax.random.PRNGKey(2)
    p = blocks.init_ml_classifier(key, 5)
    out = blocks.apply_ml_classifier(p, jnp.ones((3, 5)))
    assert out.shape == (1, 3)


def test_conv_to_channel_only():
    p = blocks.init_conv_to_channel_only(jax.random.PRNGKey(3), 8, 4, 6)
    out = blocks.apply_conv_to_channel_only(p, jnp.ones((2, 6, 6, 8)))
    assert out.shape == (2, 1, 1, 4)


def test_reset_linear_reinits_linears_only():
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.models import (
        attention_mil as amil,
    )

    cfg = amil.MILConfig(widths=(8, 8, 8, 8), blocks=(1, 1, 1, 1))
    params = amil.init_attention_mil(jax.random.PRNGKey(0), cfg)
    reset = blocks.reset_linear(params, jax.random.PRNGKey(9))
    # linear weights change, conv kernels don't
    assert not np.allclose(np.asarray(reset["attention"]["lin1"]["w"]),
                           np.asarray(params["attention"]["lin1"]["w"]))
    np.testing.assert_array_equal(reset["cnn"]["conv1"]["w"],
                                  params["cnn"]["conv1"]["w"])
    np.testing.assert_array_equal(
        np.asarray(reset["attention"]["lin1"]["b"]), 0.0)


# --------------------------------------------------------------------- wae
@pytest.mark.slow
def test_wae_roundtrip_shapes():
    key = jax.random.PRNGKey(0)
    # tiny channel schedule, 2 levels: 32px -> 8px at latent_size 8
    channels = ((3, 8), (8, 12))
    enc = wae.init_encoder(key, latent_size=8, channels=channels)
    x = jnp.ones((2, 32, 32, 3))
    z = wae.apply_encoder(enc, x, latent_size=8)
    assert z.shape == (2, 512)

    dchannels = ((3, 8), (8, 12))
    dec = wae.init_decoder(key, latent_size=8, channels=dchannels)
    img = wae.apply_decoder(dec, z, latent_size=8, channels=dchannels)
    assert img.shape == (2, 32, 32, 3)

    disc = wae.init_wae_discriminator(key)
    score = wae.apply_wae_discriminator(disc, z)
    assert score.shape == (2, 1)
    assert (np.asarray(score) >= 0).all() and (np.asarray(score) <= 1).all()


def test_conv_transpose_2x2_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 5, 5, 3)).astype(np.float32)
    w = rng.standard_normal((2, 2, 3, 4)).astype(np.float32)
    b = rng.standard_normal((4,)).astype(np.float32)
    got = np.asarray(wae.conv_transpose_2x2(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    wt = torch.from_numpy(w.transpose(2, 3, 0, 1))
    want = F.conv_transpose2d(torch.from_numpy(x.transpose(0, 3, 1, 2)), wt,
                              torch.from_numpy(b), stride=2)
    want = want.numpy().transpose(0, 2, 3, 1)
    assert got.shape == want.shape == (2, 10, 10, 4)
    np.testing.assert_allclose(got, want, atol=1e-5)


# -------------------------------------------------------------------- unet
@pytest.mark.slow
def test_latent_unet_forward_and_early_stop():
    key = jax.random.PRNGKey(0)
    p = unet.init_latent_unet(key, depth=3, start_filts=4, input_size=32,
                              latent_dim=64)
    x = jnp.ones((2, 32, 32, 3))
    recon, latent, tap = unet.apply_latent_unet(p, x, latent_dim=64)
    assert latent.shape == (2, 64)
    assert recon.shape[0] == 2 and recon.shape[-1] == 3
    bottom, latent2, _ = unet.apply_latent_unet(p, x, early_stop=True,
                                                latent_dim=64)
    np.testing.assert_allclose(np.asarray(latent), np.asarray(latent2))


def test_cluster_layer():
    key = jax.random.PRNGKey(0)
    p = unet.init_cluster_layer(key, n_clusters=3, dim=8)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((5, 8)),
                    jnp.float32)
    inertia, xe, cl = unet.apply_cluster_layer(p, x)
    assert cl.shape == (5,)
    assert float(inertia) > 0
    # assignments are nearest centers
    d2 = np.sum((np.asarray(x)[:, None] - np.asarray(p["centers"])[None]) ** 2,
                axis=2)
    np.testing.assert_array_equal(np.asarray(cl), d2.argmin(axis=1))


def test_smote_layer_jitters():
    x = jnp.zeros((4, 8))
    out = unet.smote_layer(x, jax.random.PRNGKey(0))
    assert float(np.abs(np.asarray(out)).max()) < 0.05
    assert float(np.abs(np.asarray(out)).max()) > 0


# ------------------------------------------------------------------- stain
def test_rgb2hed_roundtrip():
    rng = np.random.default_rng(0)
    rgb = rng.random((6, 6, 3)) * 0.9 + 0.05
    hed = stain.rgb2hed(rgb)
    back = stain.hed2rgb(hed)
    np.testing.assert_allclose(back, rgb, atol=1e-6)


def test_dab_channel_range_and_sensitivity():
    # brown (DAB-heavy) pixel should score higher than blue-ish
    brown = np.full((4, 4, 3), (120, 80, 40), np.uint8)
    blue = np.full((4, 4, 3), (60, 80, 160), np.uint8)
    assert 0.0 <= stain.dab_channel(blue).mean() <= 1.0
    assert 0.0 <= stain.dab_channel(brown).mean() <= 1.0
    # raw DAB density: brown (DAB-stained) > blue (hematoxylin-ish)
    hed_brown = stain.rgb2hed(stain.img_as_float(brown))[..., 2].mean()
    hed_blue = stain.rgb2hed(stain.img_as_float(blue))[..., 2].mean()
    assert hed_brown > hed_blue


def test_rescale_intensity():
    x = np.array([-0.5, -0.45, -0.375, -0.3, 0.0])
    out = stain.rescale_intensity(x, (-0.45, -0.3))
    np.testing.assert_allclose(out, [0.0, 0.0, 0.5, 1.0, 1.0])


# ----------------------------------------------------------- cell datasets
@pytest.fixture
def ihc_tree(tmp_path):
    import cv2

    rng = np.random.default_rng(0)
    d = tmp_path / "cells"
    d.mkdir()
    for i in range(3):
        img = rng.integers(0, 256, (96, 96, 3), np.uint8)
        name = f"c77_{10+i}_{20+i}_{30}_{40}_wholecell-raw.png.jpg"
        cv2.imwrite(str(d / name), img)
        mask = np.full((96, 96), 255, np.uint8)
        cv2.imwrite(str(d / name.replace("wholecell-raw.png.jpg",
                                         "wholecell-mask.png")), mask)
        cv2.imwrite(str(d / name.replace("wholecell-raw.png.jpg",
                                         "nucleus-mask.png")),
                    np.zeros((96, 96), np.uint8))
    return str(d) + "/"


def test_cell_image_dataset(ihc_tree):
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.data import (
        cell_datasets,
    )

    ds = cell_datasets.CellImageDataset(ihc_tree)
    assert len(ds) == 3
    item = ds[0]
    assert item["image"].shape == (96, 96, 3)


def test_cell_image_dataset_he(ihc_tree):
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.data import (
        cell_datasets,
    )

    ds = cell_datasets.CellImageDatasetHE(ihc_tree, seed=0)
    item = ds[0]
    assert item["image"].shape == (64, 64, 1)   # DAB plane
    assert item["raw"].shape == (64, 64, 3)
    assert item["xy"].shape == (2,)
    assert item["xy"][0] > 0  # parsed from the filename


def test_ihc_mixed_bag_dataset(ihc_tree, tmp_path):
    import pandas as pd

    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.data import (
        cell_datasets,
    )

    import glob as g

    files = sorted(g.glob(ihc_tree + "*raw.png.jpg"))
    df = pd.DataFrame({"image_path": files + files[:1],
                       "label": [0, 1, 0, 1]})
    csv = tmp_path / "driver.csv"
    df.to_csv(csv)
    ds = cell_datasets.IHCMixedBagDataset(str(csv), mini_batch_size=4)
    rgb, dab, coords, labels = ds[0]
    assert rgb.shape == (4, 256, 256, 3)
    assert dab.shape == (4, 256, 256, 1)
    assert coords.shape == (4, 2) and labels.shape == (4, 1)


def test_dab_channel_has_contrast():
    """Regression: the DAB plane must use the 2019-era stain math its
    (-0.45, -0.3) rescale window was calibrated for — the modern
    rgb2hed's non-negative stains all clip to the ceiling and the plane
    degenerates to a constant 1.0."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.data import (
        stain,
    )

    px = np.array([[[255, 255, 255], [30, 30, 120], [140, 90, 30],
                    [200, 160, 120]]], np.uint8)
    d = stain.dab_channel(px)
    assert d.shape == (1, 4)
    assert d.min() < 0.4 and d.max() > 0.6  # white bg low, DAB brown high
    assert len(np.unique(np.round(d, 3))) >= 3
