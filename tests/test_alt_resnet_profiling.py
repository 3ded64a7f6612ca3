"""alt_resnet (torchvision-template, no-norm) + profiling utils tests."""

import numpy as np
import pytest

import conftest  # noqa: F401
import jax
import jax.numpy as jnp

from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.models import (
    alt_resnet,
)
from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.utils import (
    profiling,
)


@pytest.mark.slow
def test_alt_resnet_forward_shapes():
    key = jax.random.PRNGKey(0)
    params = alt_resnet.init_resnet(key, [1, 1, 1, 1], num_classes=10,
                                    widths=(8, 16, 16, 16))
    x = jnp.ones((2, 64, 64, 3))
    out = alt_resnet.apply_resnet(params, x)
    assert out.shape == (2, 10)
    assert np.isfinite(np.asarray(out)).all()


def test_alt_resnet_matches_torch():
    """Forward parity vs an equivalently stripped torch model."""
    import torch
    import torch.nn as nn

    key = jax.random.PRNGKey(1)
    widths = (8, 8, 8, 8)
    params = alt_resnet.init_resnet(key, [1, 1, 1, 1], num_classes=5,
                                    widths=widths)

    class Block(nn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.relu = nn.ReLU()
            self.down = (nn.Conv2d(cin, cout, 1, stride, bias=False)
                         if stride != 1 or cin != cout else None)

        def forward(self, x):
            idt = self.down(x) if self.down is not None else x
            return self.relu(self.conv2(self.relu(self.conv1(x))) + idt)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, widths[0], 7, 2, 3, bias=False)
            self.relu = nn.ReLU()
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            blocks = []
            cin = widths[0]
            for si, w in enumerate(widths):
                blocks.append(Block(cin, w, 2 if si > 0 else 1))
                cin = w
            self.blocks = nn.Sequential(*blocks)
            self.fc = nn.Linear(widths[-1], 5)

        def forward(self, x):
            h = self.maxpool(self.relu(self.conv1(x)))
            h = self.blocks(h)
            return self.fc(h.mean(dim=(2, 3)))

    net = Net().eval()
    # copy OUR params into torch, then compare outputs
    with torch.no_grad():
        net.conv1.weight.copy_(torch.from_numpy(
            np.asarray(params["conv1"]["w"]).transpose(3, 2, 0, 1)))
        for si in range(4):
            blk = net.blocks[si]
            p = params["layers"][si][0]
            blk.conv1.weight.copy_(torch.from_numpy(
                np.asarray(p["conv1"]["w"]).transpose(3, 2, 0, 1)))
            blk.conv2.weight.copy_(torch.from_numpy(
                np.asarray(p["conv2"]["w"]).transpose(3, 2, 0, 1)))
            if blk.down is not None:
                blk.down.weight.copy_(torch.from_numpy(
                    np.asarray(p["downsample"]["w"]).transpose(3, 2, 0, 1)))
        net.fc.weight.copy_(torch.from_numpy(
            np.asarray(params["fc"]["w"]).T))
        net.fc.bias.copy_(torch.from_numpy(np.asarray(params["fc"]["b"])))

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x)).numpy()
    got = np.asarray(alt_resnet.apply_resnet(
        params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_from_torch_state_dict_roundtrip():
    key = jax.random.PRNGKey(2)
    widths = (8, 8, 8, 8)
    src = alt_resnet.init_resnet(key, [1, 1, 1, 1], num_classes=5,
                                 widths=widths)
    # build a torch-style state dict FROM src, load into a fresh pytree
    sd = {"conv1.weight": np.asarray(src["conv1"]["w"]).transpose(3, 2, 0, 1),
          "fc.weight": np.asarray(src["fc"]["w"]).T,
          "fc.bias": np.asarray(src["fc"]["b"])}
    for si in range(4):
        p = src["layers"][si][0]
        sd[f"layer{si+1}.0.conv1.weight"] = np.asarray(
            p["conv1"]["w"]).transpose(3, 2, 0, 1)
        sd[f"layer{si+1}.0.conv2.weight"] = np.asarray(
            p["conv2"]["w"]).transpose(3, 2, 0, 1)
        if "downsample" in p:
            sd[f"layer{si+1}.0.downsample.weight"] = np.asarray(
                p["downsample"]["w"]).transpose(3, 2, 0, 1)
    fresh = alt_resnet.init_resnet(jax.random.PRNGKey(3), [1, 1, 1, 1],
                                   num_classes=5, widths=widths)
    restored, loaded = alt_resnet.from_torch_state_dict(fresh, sd)
    assert len(loaded) == len(sd)
    x = jnp.ones((1, 32, 32, 3))
    np.testing.assert_allclose(
        np.asarray(alt_resnet.apply_resnet(restored, x)),
        np.asarray(alt_resnet.apply_resnet(src, x)), atol=1e-6)


def test_step_timer_and_memory_stats():
    timer = profiling.StepTimer(warmup=1)
    for _ in range(4):
        with timer.step():
            pass
    s = timer.summary()
    assert s["steps"] == 3 and s["mean_s"] >= 0
    stats = profiling.memory_stats()
    assert isinstance(stats, dict) and stats


def test_trace_writes_files(tmp_path):
    with profiling.trace(str(tmp_path)):
        with profiling.annotate("bench"):
            jnp.ones((8, 8)).sum().block_until_ready()
    import os

    found = []
    for root, _, files in os.walk(tmp_path):
        found.extend(files)
    assert found  # some trace artifact landed


@pytest.mark.slow
def test_from_pretrained_offline_error_and_delegation(monkeypatch):
    """from_pretrained fetches via torch.hub and overlays; offline it
    raises an actionable error (reference: alt_resnet.py:148-165)."""
    import pytest
    import torch

    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.models import (
        alt_resnet,
    )

    params = alt_resnet.resnet18(jax.random.PRNGKey(0))

    def boom(*a, **k):
        raise OSError("no egress")

    monkeypatch.setattr(torch.hub, "load_state_dict_from_url", boom)
    with pytest.raises(RuntimeError, match="from_torch_state_dict"):
        alt_resnet.from_pretrained(params, "resnet18")

    # with a reachable "url" it must delegate to the state-dict overlay
    sd = {"conv1.weight": torch.zeros(64, 3, 7, 7)}
    monkeypatch.setattr(torch.hub, "load_state_dict_from_url",
                        lambda *a, **k: sd)
    out, loaded = alt_resnet.from_pretrained(params, "resnet18")
    assert loaded == ["conv1.weight"]
    assert float(np.abs(np.asarray(out["conv1"]["w"])).max()) == 0.0


def test_from_torch_state_dict_skips_downsample_batchnorm():
    """torchvision state dicts carry 'layer*.downsample.1.*' BatchNorm
    vectors next to the '.downsample.0.weight' conv; the converter must
    take only the 4-D conv (regression: the unconditional transpose
    crashed on every real torchvision checkpoint)."""
    params = alt_resnet.init_resnet(jax.random.PRNGKey(0), [2, 2, 2, 2])
    stage, block = 1, 0  # first downsampling block
    w = np.asarray(params["layers"][stage][block]["downsample"]["w"])
    conv = np.random.default_rng(0).standard_normal(
        w.transpose(3, 2, 0, 1).shape).astype(np.float32)
    sd = {
        "layer2.0.downsample.0.weight": conv,
        "layer2.0.downsample.1.weight": np.ones((w.shape[-1],), np.float32),
        "layer2.0.downsample.1.bias": np.zeros((w.shape[-1],), np.float32),
        "layer2.0.downsample.1.running_mean":
            np.zeros((w.shape[-1],), np.float32),
    }
    restored, loaded = alt_resnet.from_torch_state_dict(params, sd)
    assert loaded == ["layer2.0.downsample.0.weight"]
    np.testing.assert_array_equal(
        np.asarray(restored["layers"][stage][block]["downsample"]["w"]),
        conv.transpose(2, 3, 1, 0))
