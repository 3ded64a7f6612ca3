"""PyTorch replica of the reference architecture, shared by the parity
tests and the benchmark baselines (ADVICE r1: one copy, two users).

Faithful to the reference spec (reference: gbm/model.py:14-61 ResNet,
gbm/model.py:89-264 Attention head): narrow no-norm ResNet-26 with
LeakyReLU(0.1), BatchNorm1d context layer without running stats, gated
softplus attention with L1 normalization. ``copy_weights`` loads our JAX
parameter pytree into the torch modules so both stacks compute the same
function.
"""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


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
    def __init__(self, widths=(20, 40, 60, 80), blocks=(3, 3, 3, 3),
                 embed=80):
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
    """The reference Attention head (gbm/model.py:114-264)."""

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


def copy_weights(params, net: TorchAttention, cfg):
    """Load a JAX attention-MIL parameter pytree into the torch replica."""
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
