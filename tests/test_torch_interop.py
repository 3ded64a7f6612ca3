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
