"""Slide-level probability parity: full attention-MIL forward vs a PyTorch
replica built from the reference's architecture spec (gbm/model.py:89-264),
weights copied from our pytree. BASELINE.md target: probabilities within
1e-3 — we assert much tighter in f32."""

import numpy as np
import pytest

import conftest  # noqa: F401
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn
import torch.nn.functional as F

from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.models import (
    attention_mil as amil,
)

CFG = amil.MILConfig(widths=(8, 12, 12, 16), blocks=(1, 1, 1, 1), L=16, D=8,
                     K=3, O=1, class_weights=(0.7, 1.2, 1.1))


class TorchBlock(nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=True)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=True)
        self.act = nn.LeakyReLU(0.1)
        self.down = (nn.Conv2d(cin, cout, 1, stride, bias=False)
                     if stride != 1 or cin != cout else None)

    def forward(self, x):
        idt = self.down(x) if self.down is not None else x
        return self.act(self.conv2(self.act(self.conv1(x))) + idt)


class TorchResNet26(nn.Module):
    def __init__(self, widths, blocks, embed):
        super().__init__()
        self.stem = nn.Conv2d(3, widths[0], 7, 2, 3, bias=True)
        self.act = nn.LeakyReLU(0.1)
        self.pool = nn.MaxPool2d(3, 2, 1)
        layers, cin = [], widths[0]
        for si, (w, n) in enumerate(zip(widths, blocks)):
            for b in range(n):
                layers.append(TorchBlock(cin, w, 2 if (si > 0 and b == 0) else 1))
                cin = w
        self.layers = nn.Sequential(*layers)
        self.fc = nn.Linear(widths[-1], embed, bias=False)

    def forward(self, x):
        h = self.pool(self.act(self.stem(x)))
        h = self.layers(h)
        return self.fc(h.mean(dim=(2, 3)))


class TorchAttention(nn.Module):
    """The reference Attention head (gbm/model.py:114-264) in eval mode."""

    def __init__(self, cfg):
        super().__init__()
        self.cnn = TorchResNet26(cfg.widths, cfg.blocks, cfg.L)
        self.bn = nn.BatchNorm1d(cfg.L, track_running_stats=False)
        self.attention = nn.Sequential(
            nn.Linear(cfg.L, cfg.D), nn.Tanh(), nn.Linear(cfg.D, cfg.K))
        self.buffer = nn.Sequential(
            nn.Linear(cfg.L, cfg.D), nn.LeakyReLU(0.1), nn.Linear(cfg.D, cfg.O))
        self.weight_mask = nn.Parameter(torch.full((cfg.K,), 0.25))
        self.cfg = cfg

    def forward(self, tiles):
        H = self.cnn(tiles)
        Hz0 = self.bn(H)
        Hm0 = F.leaky_relu(H, 0.1)  # dropout inert in eval
        A_raw = self.attention(Hz0)
        act = F.softplus(A_raw)
        gated = (torch.sigmoid(-10.0 * self.weight_mask) * act
                 + torch.sigmoid(10.0 * self.weight_mask))
        A1 = F.normalize(gated, p=1, dim=0).T          # [K, T]
        B = self.buffer(Hm0)                            # [T, 1]
        M = A1 @ B
        logits = M.view(1, self.cfg.K)
        return torch.softmax(logits, dim=1), logits, A1


def _copy_weights(params, net: TorchAttention, cfg):
    def t(x):
        return torch.from_numpy(np.asarray(x))

    with torch.no_grad():
        cnn = params["cnn"]
        net.cnn.stem.weight.copy_(t(cnn["conv1"]["w"]).permute(3, 2, 0, 1))
        net.cnn.stem.bias.copy_(t(cnn["conv1"]["b"]))
        i = 0
        for stage in cnn["stages"]:
            for block in stage:
                tb = net.cnn.layers[i]
                tb.conv1.weight.copy_(t(block["conv1"]["w"]).permute(3, 2, 0, 1))
                tb.conv1.bias.copy_(t(block["conv1"]["b"]))
                tb.conv2.weight.copy_(t(block["conv2"]["w"]).permute(3, 2, 0, 1))
                tb.conv2.bias.copy_(t(block["conv2"]["b"]))
                if tb.down is not None:
                    tb.down.weight.copy_(
                        t(block["downsample"]["w"]).permute(3, 2, 0, 1))
                i += 1
        net.cnn.fc.weight.copy_(t(cnn["fc"]["w"]).T)
        net.bn.weight.copy_(t(params["context"]["gamma"]))
        net.bn.bias.copy_(t(params["context"]["beta"]))
        net.attention[0].weight.copy_(t(params["attention"]["lin1"]["w"]).T)
        net.attention[0].bias.copy_(t(params["attention"]["lin1"]["b"]))
        net.attention[2].weight.copy_(t(params["attention"]["lin2"]["w"]).T)
        net.attention[2].bias.copy_(t(params["attention"]["lin2"]["b"]))
        net.buffer[0].weight.copy_(t(params["buffer"]["lin1"]["w"]).T)
        net.buffer[0].bias.copy_(t(params["buffer"]["lin1"]["b"]))
        net.buffer[2].weight.copy_(t(params["buffer"]["classifier"]["w"]).T)
        net.buffer[2].bias.copy_(t(params["buffer"]["classifier"]["b"]))
        net.weight_mask.copy_(t(params["weight_mask"]))


def test_slide_probability_parity():
    params = amil.init_attention_mil(jax.random.PRNGKey(0), CFG)
    net = TorchAttention(CFG).eval()
    _copy_weights(params, net, CFG)

    rng = np.random.default_rng(0)
    tiles = rng.standard_normal((40, 64, 64, 3)).astype(np.float32)

    ours = amil.apply_attention_mil(params, jnp.asarray(tiles), 1, CFG,
                                    train=False)
    with torch.no_grad():
        probs_t, logits_t, a1_t = net(
            torch.from_numpy(tiles.transpose(0, 3, 1, 2)))

    np.testing.assert_allclose(np.asarray(ours["y_pred"]),
                               probs_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours["Aterm"]), a1_t.numpy(),
                               atol=1e-5)
    # BASELINE target is 1e-3; we hold 1e-5 in f32
    assert float(np.abs(np.asarray(ours["y_pred"]) -
                        probs_t.numpy()).max()) < 1e-3


def test_loss_parity_with_class_weights():
    """Smoothed prob-target CE == the reference's accumulated
    per-class F.cross_entropy construction (nnBlocks.py:87-138)."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.ops import (
        loss as L,
    )

    rng = np.random.default_rng(1)
    logits = rng.standard_normal((1, 3)).astype(np.float32)
    weights = np.asarray(CFG.class_weights, np.float32)
    label = 2
    ours = float(L.smoothed_ce_loss(
        jnp.asarray(logits), jnp.asarray([label]), num_classes=3,
        smoothing=0.25, weight=jnp.asarray(weights)))

    # torch re-derivation: sum_y target[y] * w[y] * CE_to_class_y
    lt = torch.from_numpy(logits)
    target = torch.full((3,), 0.25 / 2)
    target[label] = 0.75
    want = 0.0
    for y in range(3):
        ce = F.cross_entropy(lt, torch.tensor([y]), reduction="none")
        want += float(target[y] * weights[y] * ce)
    assert ours == pytest.approx(want, rel=1e-5)


def test_padded_bag_matches_torch_too():
    """Padding + mask keeps parity with the ragged torch original."""
    params = amil.init_attention_mil(jax.random.PRNGKey(0), CFG)
    net = TorchAttention(CFG).eval()
    _copy_weights(params, net, CFG)
    rng = np.random.default_rng(2)
    tiles = rng.standard_normal((25, 64, 64, 3)).astype(np.float32)
    padded = np.zeros((32, 64, 64, 3), np.float32)
    padded[:25] = tiles
    mask = jnp.zeros((32,)).at[:25].set(1.0)
    ours = amil.apply_attention_mil(params, jnp.asarray(padded), 0, CFG,
                                    mask=mask, train=False)
    with torch.no_grad():
        probs_t, _, _ = net(torch.from_numpy(tiles.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(ours["y_pred"]), probs_t.numpy(),
                               atol=1e-5)
