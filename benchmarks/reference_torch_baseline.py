#!/usr/bin/env python
"""Measure the reference implementation's training throughput.

The reference (urancon/StereoSpike) is a torch model trained single-device
at batch 1 (train.py:32,63); the hardware available to it in this image is
torch-CPU. This script times an equivalent torch training step (fwd + BPTT +
Adam) of the flagship architecture and records frames/sec to
``BASELINE_MEASURED.json`` for bench.py's ``vs_baseline``.

The IF-neuron autograd function below is a minimal self-contained stand-in
for SpikingJelly (not installed here): Heaviside forward with ATan surrogate
backward, hard reset — the exact dynamics the reference runs with
``is_cext_model = False``.
"""

import json
import math
import os
import time

import torch
import torch.nn as nn
import torch.nn.functional as F


class _ATanSpike(torch.autograd.Function):
    @staticmethod
    def forward(ctx, x):
        ctx.save_for_backward(x)
        return (x >= 0).to(x)

    @staticmethod
    def backward(ctx, g):
        (x,) = ctx.saved_tensors
        return g * 2.0 / (2 * (1 + (math.pi / 2 * 2.0 * x) ** 2))


def _fire(x):
    # stateless single-step IF with v_threshold=1 (v starts at 0 each chunk)
    return _ATanSpike.apply(x - 1.0)


class _UpConv(nn.Module):
    def __init__(self, cin, cout, k, target, bias=False):
        super().__init__()
        self.target = (target[0] + k - 1, target[1] + k - 1)
        self.conv = nn.Conv2d(cin, cout, k, 1, 0, bias=bias)

    def forward(self, x):
        return self.conv(F.interpolate(x, size=self.target, mode="nearest"))


class TorchStereoSpike(nn.Module):
    """Flagship topology: k5 encoder 4→32→64→128→256→512, 2 SEW blocks,
    NN-upsample decoder with additive skips, 4 cumulative depth heads."""

    def __init__(self):
        super().__init__()
        c = [32, 64, 128, 256, 512]
        self.bottom = nn.Conv2d(4, c[0], 5, 1, 2, bias=False)
        self.enc = nn.ModuleList(
            [nn.Conv2d(c[i], c[i + 1], 5, 2, 2, bias=False) for i in range(4)])
        self.sew = nn.ModuleList(
            [nn.Conv2d(c[4], c[4], 3, 1, 1, bias=False) for _ in range(4)])
        sizes = [(260, 346), (130, 173), (65, 87), (33, 44)]
        self.dec = nn.ModuleList(
            [_UpConv(c[i + 1], c[i], 5, sizes[i]) for i in range(4)])
        self.heads = nn.ModuleList(
            [_UpConv(c[i], 1, 3, (260, 346), bias=True) for i in range(4)])

    def forward(self, x):
        feats = [_fire(self.bottom(x))]
        for conv in self.enc:
            feats.append(_fire(conv(feats[-1])))
        out = feats[-1]
        for i in (0, 2):  # two SEW blocks, ADD connect
            y = _fire(self.sew[i](out))
            out = _fire(self.sew[i + 1](y)) + out
        v = 0.0
        depths = []
        for s in (3, 2, 1, 0):
            out = _fire(self.dec[s](out)) + feats[s]
            v = v + self.heads[s](out)
            depths.append(v)
        return depths[::-1]


def main():
    torch.manual_seed(0)
    net = TorchStereoSpike()
    opt = torch.optim.Adam(net.parameters(), lr=2e-4)
    x = torch.poisson(torch.full((1, 4, 260, 346), 0.35))
    gt = torch.rand(1, 1, 260, 346) * 5 + 1
    iters = int(os.environ.get("BASE_ITERS", "10"))

    def step():
        opt.zero_grad()
        depths = net(x)
        loss = sum(F.mse_loss(d, gt) for d in depths)
        loss.backward()
        opt.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = time.perf_counter() - t0
    fps = iters / dt  # batch 1, T=1

    out = {
        "frames_per_sec": round(fps, 3),
        "config": "torch-cpu, batch 1, T=1, 260x346 (reference train.py settings)",
    }
    path = os.path.join(os.path.dirname(__file__), "..", "BASELINE_MEASURED.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
