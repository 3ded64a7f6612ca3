"""Checkpoint interop with the reference torch format.

A migrating user's trained checkpoints are torch pickles of
``{'classifier': state_dict, 'optimizer': ...}``
(reference: gbm/classify_combined.py:468-474); these tests pin (a) the
exported key-name contract against the reference module tree
(gbm/model.py:114-157, DataParallel at :132-135), (b) bit-exact
import/export round-trips through a real torch.save file, and (c)
tolerance of the non-parameter keys a real reference checkpoint carries.
"""

import numpy as np
import pytest

import conftest  # noqa: F401
import jax
import torch

from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.models import (
    attention_mil as amil,
)
from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
    checkpoint,
)
from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.utils import (
    torch_interop as interop,
)

CFG = amil.MILConfig(widths=(8, 12, 12, 16), blocks=(1, 1, 1, 1), L=16, D=8,
                     K=3, O=1)


def _reference_keys(blocks=(3, 3, 3, 3)):
    """The exact state_dict key set the reference Attention model emits
    for its shipped config (gbm/model.py:14-48, 114-157)."""
    keys = {"cnn.module.conv1.weight", "cnn.module.conv1.bias",
            "cnn.module.fc.weight",
            "context.bn.weight", "context.bn.bias",
            "attention.lin1.weight", "attention.lin1.bias",
            "attention.lin2.weight", "attention.lin2.bias",
            "buffer.lin1.weight", "buffer.lin1.bias",
            "buffer.classifier.weight", "buffer.classifier.bias",
            "weight_mask"}
    for s, n in enumerate(blocks, start=1):
        for b in range(n):
            for c in ("conv1", "conv2"):
                keys.add(f"cnn.module.layer{s}.{b}.{c}.weight")
                keys.add(f"cnn.module.layer{s}.{b}.{c}.bias")
        if s > 1:  # layer1 keeps width 20 at stride 1 -> no downsample
            keys.add(f"cnn.module.layer{s}.0.downsample.0.weight")
    return keys


def test_export_key_set_matches_reference_contract():
    params = amil.init_attention_mil(jax.random.PRNGKey(0), amil.MILConfig())
    sd = interop.export_state_dict(params)
    assert set(sd) == _reference_keys()
    # torch layouts: conv [O,I,kh,kw], linear [O,I]
    assert sd["cnn.module.conv1.weight"].shape == (20, 3, 7, 7)
    assert sd["cnn.module.layer2.0.downsample.0.weight"].shape == (40, 20, 1, 1)
    assert sd["cnn.module.fc.weight"].shape == (80, 80)
    assert sd["attention.lin1.weight"].shape == (40, 80)


def test_round_trip_through_torch_file_is_bit_exact(tmp_path):
    params = amil.init_attention_mil(jax.random.PRNGKey(1), CFG)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in interop.export_state_dict(params).items()}
    src = tmp_path / "train_step-004.model"
    torch.save({"classifier": sd, "optimizer": {"state": {}}}, src)

    dest = tmp_path / "imported.model"
    imported, skipped = interop.import_checkpoint(str(src), str(dest))
    assert len(imported) == len(sd) and skipped == []

    fresh = amil.init_attention_mil(jax.random.PRNGKey(2), CFG)
    restored, loaded, skipped2 = checkpoint.restore_params(fresh, str(dest))
    assert skipped2 == []
    flat_orig = checkpoint._flatten(params)
    flat_rest = checkpoint._flatten(restored)
    assert set(flat_orig) == set(flat_rest) == set(loaded)
    for k in flat_orig:
        np.testing.assert_array_equal(flat_orig[k], flat_rest[k], err_msg=k)


def test_import_tolerates_wrapper_prefix_and_extra_keys(tmp_path):
    params = amil.init_attention_mil(jax.random.PRNGKey(3), CFG)
    sd = {f"module.{k}": torch.from_numpy(np.ascontiguousarray(v))
          for k, v in interop.export_state_dict(params).items()}
    # non-parameter keys a real reference checkpoint can carry
    sd["module.loss.weight"] = torch.ones(3)
    sd["module.off_diag"] = torch.zeros(3, 3)
    src = tmp_path / "ref.model"
    torch.save({"classifier": sd}, src)

    dest = tmp_path / "imported.model"
    imported, skipped = interop.import_checkpoint(str(src), str(dest))
    assert sorted(skipped) == ["module.loss.weight", "module.off_diag"]
    fresh = amil.init_attention_mil(jax.random.PRNGKey(4), CFG)
    restored, loaded, _ = checkpoint.restore_params(fresh, str(dest))
    np.testing.assert_array_equal(
        checkpoint._flatten(restored)["weight_mask"],
        checkpoint._flatten(params)["weight_mask"])
    assert len(loaded) == len(imported)


def test_export_checkpoint_cli_round_trip(tmp_path):
    params = amil.init_attention_mil(jax.random.PRNGKey(5), CFG)
    ours = tmp_path / "ours.model"
    checkpoint.save(str(ours), params)
    back = tmp_path / "for_reference.model"
    interop.main(["export", str(ours), str(back)])

    ckpt = torch.load(back, map_location="cpu", weights_only=True)
    sd = ckpt["classifier"]
    assert set(sd) == set(interop.export_state_dict(params))

    # and a CLI import of that export lands back on identical leaves
    dest = tmp_path / "again.model"
    interop.main(["import", str(back), str(dest)])
    fresh = amil.init_attention_mil(jax.random.PRNGKey(6), CFG)
    restored, _, skipped = checkpoint.restore_params(fresh, str(dest))
    assert skipped == []
    for k, v in checkpoint._flatten(params).items():
        np.testing.assert_array_equal(checkpoint._flatten(restored)[k], v)


def test_import_rejects_garbage(tmp_path):
    src = tmp_path / "weird.model"
    torch.save({"classifier": {"totally.unknown": torch.ones(2)}}, src)
    with pytest.raises(ValueError, match="no recognizable"):
        interop.import_checkpoint(str(src), str(tmp_path / "out.model"))


# ---------------------------------------------------------------- StyleGAN
from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.models import (  # noqa: E402
    stylegan,
)
from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (  # noqa: E402
    gan,
)

WM = 1 / 64  # tiny widths (512 -> 8ch), full 9-block reference layout


def _tiny_gan(seed):
    pg = stylegan.init_styled_generator(jax.random.PRNGKey(seed),
                                        width_mult=WM)
    pd = stylegan.init_discriminator(jax.random.PRNGKey(seed + 1),
                                     width_mult=WM)
    return pg, pd


def test_gan_export_key_names_match_reference_contract(tmp_path):
    pg, pd = _tiny_gan(10)
    ours = tmp_path / "gan.model"
    gan.save_gan_checkpoint(str(ours), pg, pd, {}, {}, pg)
    back = tmp_path / "ref_gan.model"
    counts = interop.export_gan_checkpoint(str(ours), str(back))
    assert set(counts) == {"generator", "g_running", "discriminator"}

    ckpt = torch.load(back, map_location="cpu", weights_only=True)
    g, d = ckpt["generator"], ckpt["discriminator"]
    # style MLP sits at odd Sequential indices after PixelNorm
    assert "style.1.linear.weight_orig" in g
    assert "style.15.linear.weight_orig" in g
    # block 0 is the ConstantInput; blocks 1-4 plain upsample (EqualConv2d
    # at Sequential index 1, blur at 2); blocks 5-8 fused (weights at
    # index 0, blur at 1)  (reference model.py:383-391)
    assert g["generator.progression.0.conv1.input"].shape == (1, 8, 4, 4)
    assert "generator.progression.1.conv1.1.conv.weight_orig" in g
    assert "generator.progression.1.conv1.2.weight" in g  # blur buffer
    assert "generator.progression.5.conv1.0.weight" in g  # FusedUpsample
    assert "generator.progression.5.conv1.1.weight_flip" in g
    assert g["generator.progression.8.noise2.weight_orig"].ndim == 4
    # discriminator: fused blocks 0-3, plain final block 8
    # (reference model.py:515-523); from_rgb_activate keys
    assert "progression.0.conv2.1.weight" in d  # FusedDownsample
    assert "progression.4.conv2.1.conv.weight_orig" in d
    assert "progression.8.conv2.0.conv.weight_orig" in d
    assert "from_rgb.0.0.conv.weight_orig" in d
    assert "linear.linear.weight_orig" in d
    # blur buffers are the normalized binomial kernel, flip == original
    np.testing.assert_allclose(
        d["progression.0.conv2.0.weight"].numpy().sum(axis=(2, 3)),
        np.ones((d["progression.0.conv2.0.weight"].shape[0], 1)), atol=1e-6)
    np.testing.assert_array_equal(d["progression.0.conv2.0.weight"].numpy(),
                                  d["progression.0.conv2.0.weight_flip"].numpy())


def test_gan_round_trip_through_torch_file_is_bit_exact(tmp_path):
    pg, pd = _tiny_gan(20)
    ours = tmp_path / "gan.model"
    gan.save_gan_checkpoint(str(ours), pg, pd, {}, {}, pg)
    back = tmp_path / "ref_gan.model"
    interop.export_gan_checkpoint(str(ours), str(back))

    imported_npz = tmp_path / "imported.model"
    imported, skipped = interop.import_gan_checkpoint(str(back),
                                                      str(imported_npz))
    assert skipped == []  # blur buffers are known-skips, not reported

    fg, fd = _tiny_gan(30)  # different seeds: every leaf must be overlaid
    with np.load(imported_npz, allow_pickle=False) as z:
        blob = {k: z[k] for k in z.files}
    rg, lg, tg = gan.restore_section(fg, blob, "generator")
    rr, lr, tr = gan.restore_section(fg, blob, "g_running")
    rd, ld, td = gan.restore_section(fd, blob, "discriminator")
    assert (lg, lr, ld) == (tg, tr, td)

    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train.checkpoint import (
        _flatten,
    )
    for orig, rest in ((pg, rg), (pg, rr), (pd, rd)):
        fo, fr = _flatten(orig), _flatten(rest)
        assert set(fo) == set(fr)
        for k in fo:
            np.testing.assert_array_equal(fo[k], fr[k], err_msg=k)


def test_gan_bare_g_running_snapshot_imports_to_both_sections(tmp_path):
    pg, pd = _tiny_gan(40)
    ours = tmp_path / "gan.model"
    gan.save_gan_checkpoint(str(ours), pg, pd, {}, {}, pg)
    back = tmp_path / "ref_gan.model"
    interop.export_gan_checkpoint(str(ours), str(back))
    # rebuild the reference's bare snapshot form: just g_running's sd
    # (reference train.py:195-196)
    sd = torch.load(back, map_location="cpu", weights_only=True)["g_running"]
    bare = tmp_path / "012000.model"
    torch.save(sd, bare)

    dest = tmp_path / "imported.model"
    interop.main(["import-gan", str(bare), str(dest)])
    with np.load(dest, allow_pickle=False) as z:
        sections = {k.split("/", 1)[0] for k in z.files}
        mask = z["g_running/generator/progression/0/constant"]
    assert {"g_running", "generator"} <= sections
    np.testing.assert_array_equal(
        mask, np.asarray(pg["generator"]["progression"][0]["constant"]))
