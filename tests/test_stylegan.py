"""StyleGAN tests: op parity vs torch (fused up/down-sample, blur),
progression shapes, mixing selection, and trainer/generate smoke runs."""

import math
import os

import numpy as np
import pytest

import conftest  # noqa: F401
import jax
import jax.numpy as jnp

from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.models import (
    stylegan as sg,
)

WM = 1.0 / 32  # tiny width multiplier: channels 16,16,16,16,8,4,4,4,4


# ----------------------------------------------------- op parity vs torch
def test_fused_upsample_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 6, 6, 8)).astype(np.float32)
    w = rng.standard_normal((5, 5, 8, 4)).astype(np.float32)
    b = rng.standard_normal((4,)).astype(np.float32)

    got = np.asarray(sg.fused_upsample(jnp.asarray(x), jnp.asarray(w),
                                       jnp.asarray(b), padding=2))

    mult = math.sqrt(2.0 / (8 * 5 * 5))
    wt = torch.from_numpy(w.transpose(2, 3, 0, 1)) * mult  # [in, out, k, k]
    wt = F.pad(wt, [1, 1, 1, 1])
    wt = (wt[:, :, 1:, 1:] + wt[:, :, :-1, 1:] + wt[:, :, 1:, :-1]
          + wt[:, :, :-1, :-1]) / 4
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    want = F.conv_transpose2d(xt, wt, torch.from_numpy(b), stride=2,
                              padding=2).numpy().transpose(0, 2, 3, 1)
    assert got.shape == want.shape == (2, 12, 12, 4)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_fused_downsample_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 12, 12, 4)).astype(np.float32)
    w = rng.standard_normal((5, 5, 4, 8)).astype(np.float32)
    b = np.zeros((8,), np.float32)

    got = np.asarray(sg.fused_downsample(jnp.asarray(x), jnp.asarray(w),
                                         jnp.asarray(b), padding=2))
    mult = math.sqrt(2.0 / (4 * 5 * 5))
    wt = torch.from_numpy(w.transpose(3, 2, 0, 1)) * mult  # [out, in, k, k]
    wt = F.pad(wt, [1, 1, 1, 1])
    wt = (wt[:, :, 1:, 1:] + wt[:, :, :-1, 1:] + wt[:, :, 1:, :-1]
          + wt[:, :, :-1, :-1]) / 4
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    want = F.conv2d(xt, wt, torch.from_numpy(b), stride=2,
                    padding=2).numpy().transpose(0, 2, 3, 1)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_blur_matches_torch_depthwise():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    got = np.asarray(sg.blur(jnp.asarray(x)))
    k = torch.tensor([[1., 2., 1.], [2., 4., 2.], [1., 2., 1.]]) / 16.0
    k = k.view(1, 1, 3, 3).repeat(3, 1, 1, 1)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    want = F.conv2d(xt, k, padding=1, groups=3).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=1e-5)

    # gradient parity: the separable shift-add form's autodiff VJP must
    # equal torch's depthwise-conv backward (the reference implements this
    # by hand as BlurFunctionBackward, model.py:141-162)
    ct = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    _, vjp = jax.vjp(sg.blur, jnp.asarray(x))
    got_g = np.asarray(vjp(jnp.asarray(ct))[0])
    xt_g = torch.from_numpy(x.transpose(0, 3, 1, 2)).requires_grad_(True)
    out = F.conv2d(xt_g, k, padding=1, groups=3)
    out.backward(torch.from_numpy(ct.transpose(0, 3, 1, 2)))
    want_g = xt_g.grad.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got_g, want_g, atol=1e-5)


def test_pixel_and_instance_norm():
    rng = np.random.default_rng(3)
    z = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    pn = sg.pixel_norm(z)
    np.testing.assert_allclose(np.mean(np.asarray(pn) ** 2, axis=-1),
                               1.0, atol=1e-4)
    x = jnp.asarray(rng.standard_normal((2, 6, 6, 5)).astype(np.float32))
    inorm = np.asarray(sg.instance_norm(x))
    np.testing.assert_allclose(inorm.mean(axis=(1, 2)), 0.0, atol=1e-5)
    np.testing.assert_allclose(inorm.std(axis=(1, 2)), 1.0, atol=1e-3)


def test_minibatch_stddev_adds_constant_plane():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((4, 4, 4, 8)).astype(np.float32))
    out = np.asarray(sg.minibatch_stddev(x))
    assert out.shape == (4, 4, 4, 9)
    plane = out[..., -1]
    assert np.allclose(plane, plane.ravel()[0])


# -------------------------------------------------------------- shapes
@pytest.mark.parametrize("step", [0, 1, 2])
@pytest.mark.slow
def test_generator_discriminator_progression(step):
    key = jax.random.PRNGKey(0)
    params_g = sg.init_styled_generator(key, style_dim=32, width_mult=WM)
    params_d = sg.init_discriminator(key, width_mult=WM)
    b = 2
    zs = jax.random.normal(key, (1, b, 32))
    noise = sg.make_noise(key, b, step)
    img = sg.apply_styled_generator(params_g, zs, noise, step=step,
                                    alpha=1.0, width_mult=WM)
    size = 4 * 2 ** step
    assert img.shape == (b, size, size, 3)
    score = sg.apply_discriminator(params_d, img, step=step, alpha=1.0,
                                   width_mult=WM)
    assert score.shape == (b, 1)
    assert np.isfinite(np.asarray(score)).all()


def test_alpha_fade_in_blends():
    key = jax.random.PRNGKey(1)
    params_g = sg.init_styled_generator(key, style_dim=32, width_mult=WM)
    zs = jax.random.normal(key, (1, 2, 32))
    noise = sg.make_noise(key, 2, 1)
    a0 = sg.apply_styled_generator(params_g, zs, noise, step=1, alpha=0.0,
                                   width_mult=WM)
    a1 = sg.apply_styled_generator(params_g, zs, noise, step=1, alpha=1.0,
                                   width_mult=WM)
    mid = sg.apply_styled_generator(params_g, zs, noise, step=1, alpha=0.5,
                                    width_mult=WM)
    np.testing.assert_allclose(np.asarray(mid),
                               0.5 * np.asarray(a0) + 0.5 * np.asarray(a1),
                               atol=1e-5)


def test_style_sel_crossover():
    import random

    rng = random.Random(0)
    sel = sg.sample_style_sel(rng, 2, step=5, n_blocks=9)
    assert sel[0] == 0 and max(sel) == 1 and sorted(sel) == sel
    assert sg.sample_style_sel(rng, 1, step=5, n_blocks=9) == [0] * 9


def test_style_mixing_changes_output():
    key = jax.random.PRNGKey(2)
    params_g = sg.init_styled_generator(key, style_dim=32, width_mult=WM)
    zs = jax.random.normal(key, (2, 2, 32))
    noise = sg.make_noise(key, 2, 2)
    sel0 = jnp.zeros((9,), jnp.int32)
    sel_mix = jnp.asarray([0, 0, 1, 1, 1, 1, 1, 1, 1], jnp.int32)
    img0 = sg.apply_styled_generator(params_g, zs, noise, step=2, alpha=1.0,
                                     style_sel=sel0, width_mult=WM)
    img1 = sg.apply_styled_generator(params_g, zs, noise, step=2, alpha=1.0,
                                     style_sel=sel_mix, width_mult=WM)
    assert not np.allclose(np.asarray(img0), np.asarray(img1))


# ------------------------------------------------------------- training
@pytest.fixture
def image_dir(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(5)
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(12):
        arr = rng.integers(0, 256, (32, 32, 3), np.uint8)
        Image.fromarray(arr).save(d / f"im{i}.png")
    return str(d)


@pytest.mark.slow
def test_gan_trainer_smoke(image_dir, tmp_path):
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
        gan,
    )

    out = str(tmp_path / "gan_out")
    args = gan.build_argparser().parse_args([
        "--data_dir", image_dir, "--output_dir", out,
        "--epochs", "2", "--step_every", "1", "--init_size", "4",
        "--max_size", "8", "--width_mult", str(WM), "--code_size", "32",
        "--batch_override", "4", "--max_batches", "2", "--phase", "8",
        "--mixing",
    ])
    params_g, params_d, g_running = gan.train_gan(args)
    assert os.path.exists(os.path.join(out, "checkpoint",
                                       "train_step-1.model"))
    samples = os.listdir(os.path.join(out, "sample"))
    assert any(s.endswith("_gen.png") for s in samples)

    # resume from the 5-part checkpoint
    tx = gan.make_optimizers(0.001)
    restored = gan.load_gan_checkpoint(
        os.path.join(out, "checkpoint", "train_step-1.model"),
        params_g, params_d, tx.init(params_g), tx.init(params_d), g_running)
    g2, d2, og2, od2, ema2 = restored
    leaves_a = jax.tree_util.tree_leaves(params_g)
    leaves_b = jax.tree_util.tree_leaves(g2)
    assert all(np.allclose(a, b) for a, b in zip(leaves_a, leaves_b))


def test_gan_mesh_schedule_check_honors_init_size(tmp_path):
    """The up-front --mesh batch-divisibility check must validate the
    SAME resolution schedule the training loop runs: with --init_size 512
    the very first epoch uses STEP_BATCH_SIZE[512]=100 (not divisible by
    8), and that must be rejected at startup, not mid-flight."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
        gan,
    )

    with pytest.raises(RuntimeError, match="not divisible over --mesh"):
        gan.main(["--data_dir", str(tmp_path), "--output_dir",
                  str(tmp_path / "out"), "--mesh", "8",
                  "--init_size", "512", "--max_size", "512",
                  "--epochs", "1", "--width_mult", "0.0625"])


def test_gan_grad_accum_schedule_checked_at_startup(tmp_path):
    """--grad_accum divisibility is validated against the WHOLE
    progressive batch schedule at startup (STEP_BATCH_SIZE[512]=100 is
    not divisible by 8 — reject before a multi-day run reaches 512px),
    and the --mesh check shards the MICROBATCH: batch 256 over mesh 8
    is fine plain, but with --grad_accum 64 the 4-sample microbatch no
    longer divides over 8 devices."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
        gan,
    )

    with pytest.raises(RuntimeError,
                       match="not divisible by --grad_accum"):
        gan.main(["--data_dir", str(tmp_path), "--output_dir",
                  str(tmp_path / "out"), "--grad_accum", "8",
                  "--init_size", "512", "--max_size", "512",
                  "--epochs", "1", "--width_mult", "0.0625"])

    # 0 / negative values must be rejected up front too (0 would pass
    # a bare divisibility check and ZeroDivisionError mid-flight)
    for bad in ("0", "-1"):
        with pytest.raises(RuntimeError, match="must be >= 1"):
            gan.main(["--data_dir", str(tmp_path), "--output_dir",
                      str(tmp_path / "out"), "--grad_accum", bad,
                      "--init_size", "4", "--max_size", "4",
                      "--epochs", "1", "--width_mult", "0.0625"])

    # microbatch (256/64=4) smaller than the mesh (8): must be rejected
    # up front with the combined hint
    with pytest.raises(RuntimeError, match="after --grad_accum"):
        gan.main(["--data_dir", str(tmp_path), "--output_dir",
                  str(tmp_path / "out"), "--mesh", "8",
                  "--grad_accum", "64",
                  "--init_size", "4", "--max_size", "4",
                  "--epochs", "1", "--width_mult", "0.0625"])


@pytest.mark.slow
def test_gan_trainer_mesh_smoke(image_dir, tmp_path):
    """--mesh 8: the data-parallel trainer runs end to end (device_puts,
    batch divisibility, replicated state through the checkpoint)."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
        gan,
    )

    out = str(tmp_path / "gan_mesh_out")
    args = gan.build_argparser().parse_args([
        "--data_dir", image_dir, "--output_dir", out,
        "--epochs", "1", "--step_every", "1", "--init_size", "4",
        "--max_size", "8", "--width_mult", str(WM), "--code_size", "32",
        "--batch_override", "8", "--max_batches", "2", "--phase", "8",
        "--mixing", "--mesh", "8",
    ])
    params_g, _, _ = gan.train_gan(args)
    assert os.path.exists(os.path.join(out, "checkpoint",
                                       "train_step-0.model"))
    assert all(np.isfinite(np.asarray(leaf)).all()
               for leaf in jax.tree_util.tree_leaves(params_g))


@pytest.mark.slow
def test_gan_generate_smoke(image_dir, tmp_path):
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
        gan,
        gan_generate,
    )

    out = str(tmp_path / "gen_out")
    os.makedirs(out)
    key = jax.random.PRNGKey(0)
    params_g = sg.init_styled_generator(key, style_dim=32, width_mult=WM)
    params_d = sg.init_discriminator(key, width_mult=WM)
    tx = gan.make_optimizers(0.001)
    ckpt = gan.save_gan_checkpoint(
        os.path.join(out, "ck.model"), params_g, params_d,
        tx.init(params_g), tx.init(params_d), params_g)
    rc = gan_generate.main([
        ckpt, "--size", "8", "--n_row", "2", "--n_col", "2",
        "--code_size", "32", "--width_mult", str(WM), "--n_mixing", "1",
        "--output_dir", out,
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "sample.png"))
    assert os.path.exists(os.path.join(out, "sample_mixing_0.png"))


def test_disc_extractor_plugs_into_mil():
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.models import (
        attention_mil as amil,
        disc_extractor,
    )

    key = jax.random.PRNGKey(0)
    disc = sg.init_discriminator(key, width_mult=WM)
    step, cutoff = 3, 2
    L = disc_extractor.feature_dim(step, cutoff=cutoff, width_mult=WM)
    tiles = jax.random.normal(key, (10, 4 * 2 ** step, 4 * 2 ** step, 3))
    feats = disc_extractor.apply_disc_extractor(disc, tiles, step=step,
                                                cutoff=cutoff, width_mult=WM)
    assert feats.shape == (10, L)

    cfg = amil.MILConfig(L=L, D=4, widths=(4, 4, 4, 4), blocks=(1, 1, 1, 1))
    params = amil.init_attention_mil(key, cfg)
    extractor = disc_extractor.make_extractor(disc, step=step, cutoff=cutoff,
                                              width_mult=WM)
    out = amil.apply_attention_mil(params, tiles, 1, cfg, train=False,
                                   extractor=extractor)
    assert out["y_pred"].shape == (1, 3)
    assert np.isfinite(np.asarray(out["loss"]))


def test_gan_dataset_mixed_sizes_resize_full_frame(tmp_path):
    """Mixed-size images must each resize full-frame (no zero-pad borders)."""
    from PIL import Image

    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.data.gan_dataset import (
        ImageFolderDataset,
    )

    d = tmp_path / "mixed"
    d.mkdir()
    Image.fromarray(np.full((16, 16, 3), 200, np.uint8)).save(d / "a.png")
    Image.fromarray(np.full((32, 32, 3), 200, np.uint8)).save(d / "b.png")
    ds = ImageFolderDataset(str(d), seed=0)
    ds.NewResolution(8, 2)
    batch = next(iter(ds.batches(shuffle=False)))
    arr = np.asarray(batch)
    # constant-color inputs -> constant outputs; zero-padding would leave
    # black (-1.0) borders on the smaller image
    expected = 200 / 127.5 - 1.0
    np.testing.assert_allclose(arr, expected, atol=1e-2)


# ------------------------------------------- resolution-keyed store (A10)
def test_multi_resolution_store_build_and_switch(image_dir, tmp_path):
    """Prebuilt per-resolution reads match resize-on-fetch (reference:
    style-based-gan-pytorch-master-512/dataset.py:8-40)."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.data.gan_dataset import (
        ImageFolderDataset,
        MultiResolutionStore,
    )

    out = str(tmp_path / "store")
    store = MultiResolutionStore.build(image_dir, out,
                                       resolutions=(4, 8, 16), seed=0)
    assert len(store) == 12
    for r in (4, 8, 16):
        assert os.path.exists(os.path.join(out, f"res_{r:04d}.npy"))

    # reopen from disk and switch resolutions: shapes + range per resolution
    store = MultiResolutionStore(out, seed=0)
    for r in (4, 16, 8):  # out-of-order switching
        store.NewResolution(r, 4)
        batch = next(iter(store.batches(shuffle=False)))
        assert batch.shape == (4, r, r, 3)
        assert float(batch.min()) >= -1.0 and float(batch.max()) <= 1.0

    # pre-resized values match the on-the-fly pipeline up to u8 rounding
    folder = ImageFolderDataset(image_dir, seed=0)
    folder.NewResolution(8, 4)
    live = next(iter(folder.batches(shuffle=False)))
    store.NewResolution(8, 4)
    pre = next(iter(store.batches(shuffle=False)))
    np.testing.assert_allclose(np.asarray(pre), np.asarray(live),
                               atol=1.5 / 127.5)

    # unknown resolution is a KeyError, not silent resize
    with pytest.raises(KeyError):
        store.NewResolution(6)


@pytest.mark.slow
def test_gan_trainer_uses_store(image_dir, tmp_path):
    """The trainer auto-detects a prebuilt store directory."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.data.gan_dataset import (
        MultiResolutionStore,
    )
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
        gan,
    )

    store_dir = str(tmp_path / "store")
    MultiResolutionStore.build(image_dir, store_dir, resolutions=(4, 8),
                               seed=0)
    out = str(tmp_path / "gan_out")
    args = gan.build_argparser().parse_args([
        "--data_dir", store_dir, "--output_dir", out,
        "--epochs", "2", "--step_every", "1", "--init_size", "4",
        "--max_size", "8", "--width_mult", str(WM), "--code_size", "32",
        "--batch_override", "4", "--max_batches", "2", "--phase", "8",
    ])
    gan.train_gan(args)
    assert os.path.exists(os.path.join(out, "checkpoint",
                                       "train_step-1.model"))


def test_multi_resolution_store_expands_tile_stacks(tmp_path):
    """A .npy tile stack contributes ALL its tiles to the store (the
    resize-on-fetch fallback samples one random tile per fetch; a prebuilt
    store must not collapse the stack)."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.data.gan_dataset import (
        MultiResolutionStore,
    )

    d = tmp_path / "stacks"
    d.mkdir()
    rng = np.random.default_rng(0)
    np.save(d / "slide.npy",
            rng.integers(0, 256, (7, 16, 16, 3)).astype(np.uint8))
    store = MultiResolutionStore.build(str(d), str(tmp_path / "store"),
                                       resolutions=(4, 8), seed=0)
    assert len(store) == 7
    store.NewResolution(8, 7)
    batch = next(iter(store.batches(shuffle=False)))
    assert batch.shape == (7, 8, 8, 3)


def test_gan_dataset_skips_non_image_npy(tmp_path):
    """A RoiBuilder cache dir holds coor_*.npy [T, 2] coordinate arrays
    next to the data_*.npy tile stacks; globbing such a dir must ingest
    only the image-shaped arrays (regression: the store builder crashed
    resizing a coordinate array)."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.data.gan_dataset import (
        ImageFolderDataset,
        MultiResolutionStore,
    )

    d = tmp_path / "cache"
    d.mkdir()
    rng = np.random.default_rng(0)
    np.save(d / "data_s1_rois_size32_hsvcut_v3.npy",
            rng.integers(0, 255, (5, 32, 32, 3)).astype(np.uint8))
    np.save(d / "coor_s1_rois_size32_hsvcut_v3.npy",
            np.zeros((5, 2), np.int64))

    ds = ImageFolderDataset(str(d), seed=0)
    assert len(ds.files) == 1 and "data_" in ds.files[0]

    store = MultiResolutionStore.build(str(d), str(tmp_path / "store"),
                                       resolutions=(4, 8), seed=0)
    assert len(store) == 5  # 5 tiles, no coordinate rows


@pytest.mark.slow
def test_gan_trainer_profile_flag(image_dir, tmp_path):
    """--profile captures an XProf trace of the first epoch + per-batch
    percentiles (the TPU equivalent of the reference's committed cProfile
    GPU-utilization artifact)."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
        gan,
    )

    out = str(tmp_path / "gan_prof")
    args = gan.build_argparser().parse_args([
        "--data_dir", image_dir, "--output_dir", out,
        "--epochs", "1", "--step_every", "1", "--init_size", "4",
        "--max_size", "4", "--width_mult", str(WM), "--code_size", "32",
        "--batch_override", "4", "--max_batches", "3", "--phase", "8",
        "--profile",
    ])
    gan.train_gan(args)
    prof = os.path.join(out, "profile")
    assert os.path.isdir(prof) and os.listdir(prof)


@pytest.mark.slow
def test_gan_resume_is_bit_exact(image_dir, tmp_path):
    """Same elastic-resume guarantee as the classifier: every stochastic
    stream of GAN epoch E (batch order, style-mixing coin flips, all jax
    keys) derives from (seed, E), and the 5-part checkpoint carries both
    optimizer states — so train 0..1 straight vs train 0, stop, resume 1
    produce BIT-IDENTICAL checkpoints. (init_size == max_size keeps
    alpha == 1.0 in both runs; at the init resolution a --ckpt resume
    fades alpha like the reference's `args.ckpt is None` check.)"""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
        gan,
    )

    common = ["--data_dir", image_dir, "--epochs", "2", "--step_every", "1",
              "--init_size", "4", "--max_size", "4", "--width_mult",
              str(WM), "--code_size", "32", "--batch_override", "4",
              "--max_batches", "2", "--phase", "8", "--mixing",
              "--seed", "11"]
    out_a = str(tmp_path / "a")
    gan.train_gan(gan.build_argparser().parse_args(
        common + ["--output_dir", out_a]))

    out_b = str(tmp_path / "b")
    first_leg = list(common)
    first_leg[first_leg.index("--epochs") + 1] = "1"
    gan.train_gan(gan.build_argparser().parse_args(
        first_leg + ["--output_dir", out_b]))
    ck_b0 = os.path.join(out_b, "checkpoint", "train_step-0.model")
    gan.train_gan(gan.build_argparser().parse_args(
        common + ["--output_dir", out_b, "--epoch_start", "1",
                  "--ckpt", ck_b0]))

    a = np.load(os.path.join(out_a, "checkpoint", "train_step-1.model"))
    b = np.load(os.path.join(out_b, "checkpoint", "train_step-1.model"))
    assert sorted(a.files) == sorted(b.files)
    for k in a.files:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_bf16_steps_finite_and_update():
    """Opt-in mixed precision (--compute_dtype bf16): one d_step and one
    g_step at bf16 compute produce finite f32 losses and actually move the
    f32 master params; master params/opt state stay f32 throughout."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
        gan,
    )

    step = 1  # 8px
    k_g, k_d = jax.random.split(jax.random.PRNGKey(0))
    params_g = sg.init_styled_generator(k_g, width_mult=WM)
    params_d = sg.init_discriminator(k_d, width_mult=WM)
    tx = gan.make_optimizers()
    opt_g, opt_d = tx.init(params_g), tx.init(params_d)
    d_step = gan.make_d_step(step, width_mult=WM, from_rgb_activate=True,
                             tx=tx, compute_dtype=jnp.bfloat16)
    g_step = gan.make_g_step(step, width_mult=WM, from_rgb_activate=True,
                             tx=tx, compute_dtype=jnp.bfloat16)
    n_blocks = len(sg._gen_layout(WM))
    sel = jnp.zeros((n_blocks,), jnp.int32)
    real = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 3))
    zs = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 512))
    pd, od, aux = d_step(params_d, opt_d, params_g, real, zs, sel,
                         jnp.float32(0.5), jnp.float32(1e-3),
                         jax.random.PRNGKey(3))
    pg, og, ema, gl = g_step(params_g, opt_g, params_g, pd, zs, sel,
                             jnp.float32(0.5), jnp.float32(1e-3),
                             jax.random.PRNGKey(4))
    assert np.isfinite(float(aux["disc_loss"]))
    assert np.isfinite(float(aux["grad_penalty"]))
    assert np.isfinite(float(gl))
    for tree in (pd, pg):
        for leaf in jax.tree_util.tree_leaves(tree):
            assert leaf.dtype == jnp.float32
            assert np.all(np.isfinite(np.asarray(leaf)))
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(params_d),
                        jax.tree_util.tree_leaves(pd)))
    assert moved


def test_remat_steps_match_plain():
    """--remat (jax.checkpoint over the G/D applies) only changes WHEN
    activations are computed, not the math: one d_step and one g_step
    with remat must reproduce the plain step's parameters — including
    through the GP double-backward, where the rematerialized inner grad
    is the HBM win the knob exists for."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
        gan,
    )

    step = 1  # 8px, fade-in blend path alive via alpha=0.5
    k_g, k_d = jax.random.split(jax.random.PRNGKey(0))
    params_g = sg.init_styled_generator(k_g, width_mult=WM)
    params_d = sg.init_discriminator(k_d, width_mult=WM)
    tx = gan.make_optimizers()
    n_blocks = len(sg._gen_layout(WM))
    sel = jnp.zeros((n_blocks,), jnp.int32)
    real = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 3))
    zs = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 512))
    args = (jnp.float32(0.5), jnp.float32(1e-3), jax.random.PRNGKey(3))

    def run(remat):
        opt_g, opt_d = tx.init(params_g), tx.init(params_d)
        d_step = gan.make_d_step(step, width_mult=WM,
                                 from_rgb_activate=True, tx=tx, remat=remat)
        g_step = gan.make_g_step(step, width_mult=WM,
                                 from_rgb_activate=True, tx=tx, remat=remat)
        pd, od, aux = d_step(params_d, opt_d, params_g, real, zs, sel,
                             *args)
        pg, og, ema, gl = g_step(params_g, opt_g, params_g, pd, zs, sel,
                                 *args)
        return pd, pg, ema, float(aux["disc_loss"]), \
            float(aux["grad_penalty"]), float(gl)

    pd0, pg0, ema0, dl0, gp0, gl0 = run(False)
    pd1, pg1, ema1, dl1, gp1, gl1 = run(True)
    assert abs(dl0 - dl1) < 1e-5
    assert abs(gp0 - gp1) < 1e-4
    assert abs(gl0 - gl1) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves((pd0, pg0, ema0)),
                    jax.tree_util.tree_leaves((pd1, pg1, ema1))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)


def test_grad_accum_matches_handrolled_microbatch_average():
    """--grad_accum N (lax.scan gradient accumulation inside the jitted
    step — the single-chip analog of the reference's nn.DataParallel
    batch split, and the knob that lifts the high-res HBM boundary in
    GAN512_r04.jsonl) must equal hand-averaged per-microbatch gradients
    through the exposed loss builders, followed by the same Adam update.
    Covers microbatch slicing (real axis 0, zs axis 1), the per-
    microbatch rng split, grad/aux averaging, and the optimizer wiring,
    for BOTH d_step and g_step."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
        gan,
    )

    step, accum = 1, 2
    k_g, k_d = jax.random.split(jax.random.PRNGKey(0))
    params_g = sg.init_styled_generator(k_g, width_mult=WM)
    params_d = sg.init_discriminator(k_d, width_mult=WM)
    tx = gan.make_optimizers()
    opt_g, opt_d = tx.init(params_g), tx.init(params_d)
    n_blocks = len(sg._gen_layout(WM))
    sel = jnp.zeros((n_blocks,), jnp.int32)
    real = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 3))
    zs = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 512))
    alpha, lr, rng = jnp.float32(0.5), jnp.float32(1e-3), jax.random.PRNGKey(3)

    # ---- fused path
    d_step = gan.make_d_step(step, width_mult=WM, from_rgb_activate=True,
                             tx=tx, grad_accum=accum)
    g_step = gan.make_g_step(step, width_mult=WM, from_rgb_activate=True,
                             tx=tx, grad_accum=accum)
    pd_f, od_f, aux_f = d_step(params_d, opt_d, params_g, real, zs, sel,
                               alpha, lr, rng)
    pg_f, og_f, ema_f, gl_f = g_step(params_g, opt_g, params_g, pd_f, zs,
                                     sel, alpha, lr, rng)

    # ---- hand-rolled expectation
    d_loss = gan.make_d_loss(step, width_mult=WM, from_rgb_activate=True)
    g_loss = gan.make_g_loss(step, width_mult=WM, from_rgb_activate=True)
    rngs = jax.random.split(rng, accum)
    reals = real.reshape(accum, 2, 8, 8, 3)
    zss = jnp.moveaxis(zs.reshape(1, accum, 2, 512), 1, 0)

    def avg(trees):
        return jax.tree_util.tree_map(
            lambda *xs: sum(xs) / len(xs), *trees)

    d_parts = [jax.value_and_grad(d_loss, has_aux=True)(
        params_d, params_g, reals[i], zss[i], sel, alpha, rngs[i])
        for i in range(accum)]
    grads_d = avg([p[1] for p in d_parts])
    aux_e = avg([p[0][1] for p in d_parts])
    upd, od_e = tx.update(grads_d, opt_d, params_d)
    pd_e = jax.tree_util.tree_map(lambda p, u: p - lr * u, params_d, upd)

    # post-Adam trees get extra headroom: the scale-free update is
    # g/(0.1|g| + eps), which amplifies benign float-reordering noise on
    # near-zero-grad elements (observed: one element in 16k at ~9e-5);
    # the loss/aux scalars stay at tight tolerance
    def check(fused, expected, atol):
        for a, b in zip(jax.tree_util.tree_leaves(fused),
                        jax.tree_util.tree_leaves(expected)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=atol, rtol=1e-4)

    check((pd_f, od_f), (pd_e, od_e), atol=5e-4)
    check(aux_f, aux_e, atol=1e-5)

    g_parts = [jax.value_and_grad(g_loss, has_aux=True)(
        params_g, pd_f, zss[i], sel, alpha, rngs[i]) for i in range(accum)]
    grads_g = avg([p[1] for p in g_parts])
    gl_e = sum(p[0][0] for p in g_parts) / accum
    upd, og_e = tx.update(grads_g, opt_g, params_g)
    mask = gan.style_lr_mask(params_g)
    pg_e = jax.tree_util.tree_map(lambda p, u, m: p - lr * m * u,
                                  params_g, upd, mask)
    ema_e = gan.accumulate(params_g, pg_e)

    np.testing.assert_allclose(float(gl_f), float(gl_e), atol=1e-5,
                               rtol=1e-5)
    check((pg_f, og_f, ema_f), (pg_e, og_e, ema_e), atol=5e-4)

    with pytest.raises(ValueError, match="not divisible"):
        d_step_bad = gan.make_d_step(step, width_mult=WM,
                                     from_rgb_activate=True, tx=tx,
                                     grad_accum=3)
        d_step_bad(params_d, opt_d, params_g, real, zs, sel, alpha, lr,
                   rng)


@pytest.mark.slow
def test_gan_mesh_composes_with_grad_accum():
    """SCALING.md claims mesh data parallelism and --grad_accum compose
    (shard each scan microbatch over the mesh). Verify: d_step+g_step
    with grad_accum=2 on an 8-device data mesh must equal the same
    grad_accum=2 step single-device — GSPMD's collectives are the only
    difference (sum reordering)."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.parallel import (
        mesh as M,
    )
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
        gan,
    )

    key = jax.random.PRNGKey(7)
    step = 1
    params_g = sg.init_styled_generator(key, style_dim=32, width_mult=WM)
    params_d = sg.init_discriminator(key, width_mult=WM)
    tx = gan.make_optimizers(0.001)
    opt_g, opt_d = tx.init(params_g), tx.init(params_d)
    d_step = gan.make_d_step(step, width_mult=WM, from_rgb_activate=True,
                             tx=tx, grad_accum=2)
    g_step = gan.make_g_step(step, width_mult=WM, from_rgb_activate=True,
                             tx=tx, grad_accum=2)

    b = 16  # -> 2 microbatches of 8, each sharded over the 8 devices
    real = jax.random.normal(jax.random.fold_in(key, 1), (b, 8, 8, 3))
    zs = jax.random.normal(jax.random.fold_in(key, 2), (2, b, 32))
    n_blocks = len(sg._gen_layout(WM))
    sel = jnp.zeros((n_blocks,), jnp.int32)
    args = (jnp.float32(0.7), jnp.float32(1e-3), jax.random.fold_in(key, 3))

    def run(mesh):
        pd, od, pg, og, ema = params_d, opt_d, params_g, opt_g, params_g
        r, z = real, zs
        if mesh is not None:
            rep = M.replicated(mesh)
            put = lambda t: jax.tree_util.tree_map(  # noqa: E731
                lambda x: jax.device_put(x, rep), t)
            pd, od, pg, og, ema = map(put, (pd, od, pg, og, ema))
            r = jax.device_put(r, M.data_batch_sharding(mesh))
            z = jax.device_put(z, M.style_batch_sharding(mesh))
        pd, od, aux = d_step(pd, od, pg, r, z, sel, *args)
        pg, og, ema, gl = g_step(pg, og, ema, pd, z, sel, *args)
        return pd, pg, ema, float(aux["disc_loss"]), float(gl)

    pd1, pg1, ema1, dl1, gl1 = run(None)
    pd8, pg8, ema8, dl8, gl8 = run(M.data_mesh(8))

    assert abs(dl1 - dl8) < 1e-5 and abs(gl1 - gl8) < 1e-5
    for a, b_ in zip(jax.tree_util.tree_leaves((pd1, pg1, ema1)),
                     jax.tree_util.tree_leaves((pd8, pg8, ema8))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_gan_data_parallel_step_matches_single_device():
    """--mesh data parallelism (the reference's nn.DataParallel on the
    GAN, train.py:267-274): one d_step + g_step with batch/latents
    sharded over an 8-device data mesh must produce the same parameters
    as the single-device step — GSPMD's inserted all-reduce is the only
    difference, and it is numerically a sum reordering."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.parallel import (
        mesh as M,
    )
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
        gan,
    )

    key = jax.random.PRNGKey(0)
    step = 1  # 8 px
    params_g = sg.init_styled_generator(key, style_dim=32, width_mult=WM)
    params_d = sg.init_discriminator(key, width_mult=WM)
    tx = gan.make_optimizers(0.001)
    opt_g, opt_d = tx.init(params_g), tx.init(params_d)
    d_step = gan.make_d_step(step, width_mult=WM, from_rgb_activate=True,
                             tx=tx)
    g_step = gan.make_g_step(step, width_mult=WM, from_rgb_activate=True,
                             tx=tx)

    b = 16
    real = jax.random.normal(jax.random.fold_in(key, 1), (b, 8, 8, 3))
    zs = jax.random.normal(jax.random.fold_in(key, 2), (2, b, 32))
    n_blocks = len(sg._gen_layout(WM))
    sel = jnp.zeros((n_blocks,), jnp.int32)  # no mixing
    args = (jnp.float32(0.7), jnp.float32(1e-3), jax.random.fold_in(key, 3))

    def run(mesh):
        pd, od, pg, og, ema = params_d, opt_d, params_g, opt_g, params_g
        r, z = real, zs
        if mesh is not None:
            rep = M.replicated(mesh)
            put = lambda t: jax.tree_util.tree_map(  # noqa: E731
                lambda x: jax.device_put(x, rep), t)
            pd, od, pg, og, ema = map(put, (pd, od, pg, og, ema))
            r = jax.device_put(r, M.data_batch_sharding(mesh))
            z = jax.device_put(z, M.style_batch_sharding(mesh))
        pd, od, aux = d_step(pd, od, pg, r, z, sel, *args)
        pg, og, ema, gl = g_step(pg, og, ema, pd, z, sel, *args)
        return pd, pg, ema, float(aux["disc_loss"]), float(gl)

    pd1, pg1, ema1, dl1, gl1 = run(None)
    mesh = M.data_mesh(8)
    pd8, pg8, ema8, dl8, gl8 = run(mesh)

    assert abs(dl1 - dl8) < 1e-5 and abs(gl1 - gl8) < 1e-5
    for a, b_ in zip(jax.tree_util.tree_leaves((pd1, pg1, ema1)),
                     jax.tree_util.tree_leaves((pd8, pg8, ema8))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_gan_nan_guard_halts_without_checkpoint(image_dir, tmp_path,
                                                monkeypatch):
    """A diverged GAN epoch (non-finite losses) halts before the 5-part
    checkpoint is written — same failure-detection contract as the
    classifier's NaN guard."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
        gan,
    )

    real = gan.make_d_step

    def poisoned(step, **kw):
        fn = real(step, **kw)

        def d_step(*a):
            pd, od, aux = fn(*a)
            aux = dict(aux)
            aux["disc_loss"] = jnp.float32(np.nan)
            return pd, od, aux

        return d_step

    monkeypatch.setattr(gan, "make_d_step", poisoned)
    out = str(tmp_path / "gan_nan_out")
    args = gan.build_argparser().parse_args([
        "--data_dir", image_dir, "--output_dir", out,
        "--epochs", "2", "--step_every", "1", "--init_size", "4",
        "--max_size", "8", "--width_mult", str(WM), "--code_size", "32",
        "--batch_override", "4", "--max_batches", "1", "--phase", "8",
    ])
    with pytest.raises(gan.Diverged):
        gan.train_gan(args)
    assert not os.path.exists(os.path.join(out, "checkpoint",
                                           "train_step-0.model"))


@pytest.mark.slow
def test_g_step_ema_decay_knob():
    """--ema_decay threads into g_running: decay 0.0 makes the EMA track
    the live generator exactly after one step; the default 0.999 leaves
    it ~unchanged from its previous value (init-mass arithmetic in
    PROFILE.md "g_running EMA lag")."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
        gan,
    )

    step = 1
    k_g, k_d = jax.random.split(jax.random.PRNGKey(5))
    params_g = sg.init_styled_generator(k_g, width_mult=WM)
    params_d = sg.init_discriminator(k_d, width_mult=WM)
    tx = gan.make_optimizers()
    opt_g = tx.init(params_g)
    n_blocks = len(sg._gen_layout(WM))
    sel = jnp.zeros((n_blocks,), jnp.int32)
    zs = jax.random.normal(jax.random.PRNGKey(6), (1, 2, 512))

    outs = {}
    for decay in (0.0, 0.999):
        g_step = gan.make_g_step(step, width_mult=WM,
                                 from_rgb_activate=True, tx=tx,
                                 ema_decay=decay)
        pg, _, ema, _ = g_step(params_g, opt_g, params_g, params_d, zs,
                               sel, jnp.float32(1.0), jnp.float32(1e-3),
                               jax.random.PRNGKey(7))
        outs[decay] = (pg, ema)

    pg0, ema0 = outs[0.0]
    for a, b in zip(jax.tree_util.tree_leaves(ema0),
                    jax.tree_util.tree_leaves(pg0)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    pg1, ema1 = outs[0.999]
    # decay 0.999 after ONE step: ema = 0.999*old + 0.001*new
    la, lo, ln = (jax.tree_util.tree_leaves(ema1),
                  jax.tree_util.tree_leaves(params_g),
                  jax.tree_util.tree_leaves(pg1))
    for a, o, n in zip(la, lo, ln):
        np.testing.assert_allclose(np.asarray(a),
                                   0.999 * np.asarray(o)
                                   + 0.001 * np.asarray(n),
                                   rtol=1e-5, atol=1e-7)

    with pytest.raises(ValueError):
        gan.make_g_step(step, width_mult=WM, from_rgb_activate=True,
                        tx=tx, ema_decay=1.0)

@pytest.mark.slow
def test_g_step_ema_warmup_schedule():
    """--ema_warmup uses effective decay min(ema_decay, (1+t)/(10+t)) over
    the Adam step count t: the first step keeps only 2/11 of the random
    init (vs 0.999 plain), so short runs' g_running is no longer anchored
    to the untrained generator (PROFILE.md "g_running EMA lag")."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
        gan,
    )

    step = 1
    k_g, k_d = jax.random.split(jax.random.PRNGKey(15))
    params_g = sg.init_styled_generator(k_g, width_mult=WM)
    params_d = sg.init_discriminator(k_d, width_mult=WM)
    tx = gan.make_optimizers()
    opt_g = tx.init(params_g)
    n_blocks = len(sg._gen_layout(WM))
    sel = jnp.zeros((n_blocks,), jnp.int32)
    zs = jax.random.normal(jax.random.PRNGKey(16), (1, 2, 512))

    g_step = gan.make_g_step(step, width_mult=WM, from_rgb_activate=True,
                             tx=tx, ema_decay=0.999, ema_warmup=True)

    # step 1: t = 1 after the update -> eff = min(0.999, 2/11)
    pg, og, ema, _ = g_step(params_g, opt_g, params_g, params_d, zs, sel,
                            jnp.float32(1.0), jnp.float32(1e-3),
                            jax.random.PRNGKey(17))
    eff1 = 2.0 / 11.0
    for a, o, n in zip(jax.tree_util.tree_leaves(ema),
                       jax.tree_util.tree_leaves(params_g),
                       jax.tree_util.tree_leaves(pg)):
        np.testing.assert_allclose(
            np.asarray(a), eff1 * np.asarray(o) + (1 - eff1) * np.asarray(n),
            rtol=1e-5, atol=1e-6)

    # step 2: t = 2 -> eff = min(0.999, 3/12); the schedule rides the
    # restored optimizer count, so resume continues it seamlessly
    pg2, _, ema2, _ = g_step(pg, og, ema, params_d, zs, sel,
                             jnp.float32(1.0), jnp.float32(1e-3),
                             jax.random.PRNGKey(18))
    eff2 = 3.0 / 12.0
    for a, e, n in zip(jax.tree_util.tree_leaves(ema2),
                       jax.tree_util.tree_leaves(ema),
                       jax.tree_util.tree_leaves(pg2)):
        np.testing.assert_allclose(
            np.asarray(a), eff2 * np.asarray(e) + (1 - eff2) * np.asarray(n),
            rtol=1e-5, atol=1e-6)


def test_ckpt_every_cadence_and_final_epoch(image_dir, tmp_path):
    """--ckpt_every N writes the 5-part checkpoint (and sample grid) only
    on the cadence, but ALWAYS writes the final epoch — the full-width
    checkpoint's D2H fetch + serialize gates the next epoch's submit on
    high-latency host links, so sparse cadence takes it off the epoch
    critical path without losing the resume anchor."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
        gan,
    )

    out = str(tmp_path / "gan_out")
    args = gan.build_argparser().parse_args([
        "--data_dir", image_dir, "--output_dir", out,
        "--epochs", "5", "--step_every", "3", "--init_size", "4",
        "--max_size", "8", "--width_mult", str(WM), "--code_size", "32",
        "--batch_override", "4", "--max_batches", "2", "--phase", "8",
        "--ckpt_every", "2",
    ])
    gan.train_gan(args)
    ckpt = os.path.join(out, "checkpoint")
    written = sorted(os.listdir(ckpt))
    # cadence epochs 1, 3 ((e+1) % 2 == 0) plus the forced final epoch 4
    assert written == ["train_step-1.model", "train_step-3.model",
                       "train_step-4.model"], written
    grids = sorted(os.listdir(os.path.join(out, "sample")))
    assert grids == ["e1_gen.png", "e3_gen.png", "e4_gen.png"], grids


def test_ckpt_every_validation():
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
        gan,
    )

    args = gan.build_argparser().parse_args([
        "--data_dir", "/nonexistent", "--output_dir", "/tmp/x",
        "--ckpt_every", "0",
    ])
    with pytest.raises(RuntimeError, match="ckpt_every"):
        gan.train_gan(args)


def test_ckpt_every_preemption_stop_writes_off_cadence(image_dir, tmp_path,
                                                       monkeypatch):
    """A preemption stop forces the 5-part checkpoint even when the epoch
    is off the --ckpt_every cadence — the resume anchor the SIGTERM
    contract promises must exist."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
        gan,
    )

    class FakeLatch:
        def install(self):
            return self

        def stop_requested(self):
            return True  # preempted from the very first epoch boundary

        def restore(self):
            pass

    monkeypatch.setattr(gan, "PreemptionLatch", FakeLatch)
    out = str(tmp_path / "gan_out")
    args = gan.build_argparser().parse_args([
        "--data_dir", image_dir, "--output_dir", out,
        "--epochs", "5", "--step_every", "3", "--init_size", "4",
        "--max_size", "8", "--width_mult", str(WM), "--code_size", "32",
        "--batch_override", "4", "--max_batches", "2", "--phase", "8",
        "--ckpt_every", "100",
    ])
    gan.train_gan(args)
    # epoch 0 is off-cadence ((0+1) % 100 != 0) but the stop forces it
    assert sorted(os.listdir(os.path.join(out, "checkpoint"))) == \
        ["train_step-0.model"]


def test_ema_decay_validated_before_dataset_work():
    """A bad --ema_decay must fail at argument time, not minutes later
    when epoch 0 lazily builds its g_step after the store open and any
    checkpoint restore."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
        gan,
    )

    args = gan.build_argparser().parse_args([
        "--data_dir", "/nonexistent", "--output_dir", "/tmp/x",
        "--ema_decay", "1.0",
    ])
    with pytest.raises(RuntimeError, match="ema_decay"):
        gan.train_gan(args)
