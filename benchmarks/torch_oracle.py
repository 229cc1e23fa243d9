"""Stand-in "reference" implementation: the same DMV3D architecture in torch
on CPU.

The real reference (TF1-era CPU/GPU code) is unavailable — its checkout is
empty (SURVEY.md §0) — so the >=5x throughput target's denominator
(BASELINE.json:5 "reference CPU/GPU per-chip throughput") is measured against
this architecturally-identical torch CPU model, clearly labeled as a stand-in
(SURVEY.md §6 action). torch 2.13 CPU is installed; no torch code runs in the
framework itself — this file exists only for benchmarking and as a gradient
oracle.

Architecture mirrors models/dmv3d.py one-to-one (kept in lockstep with the
round-2 decoder rework so the stand-in benefits from the SAME FLOP
reductions): stride-2 conv encoder with GroupNorm, ConvGRU, pose-MLP
bottleneck, subpixel (2x2 conv + pixel-shuffle) decoder with split skip
fusion computed once per example, merged flow/mask/rgb head conv,
grid_sample flow warp, mask compositing.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def _features(base, cap, level):
    return min(base * (2 ** level), cap)


def _gn(ch):
    g = min(8, ch)
    while ch % g:
        g -= 1
    return nn.GroupNorm(g, ch)


class ConvBlock(nn.Module):
    def __init__(self, cin, cout, stride=1, kernel=3):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, kernel, stride,
                              padding=kernel // 2)
        self.norm = _gn(cout)

    def forward(self, x):
        return F.relu(self.norm(self.conv(x)))


class ConvGRUCell(nn.Module):
    def __init__(self, cin, ch):
        super().__init__()
        self.gates = nn.Conv2d(cin + ch, 2 * ch, 3, padding=1)
        self.cand = nn.Conv2d(cin + ch, ch, 3, padding=1)

    def forward(self, h, x):
        zr = self.gates(torch.cat([h, x], 1))
        z, r = zr.chunk(2, 1)
        z, r = torch.sigmoid(z), torch.sigmoid(r)
        c = torch.tanh(self.cand(torch.cat([r * h, x], 1)))
        return (1 - z) * h + z * c


class TorchDMV3D(nn.Module):
    """NCHW torch mirror of the flax model (same layer plan & widths)."""

    def __init__(self, image_size=128, base=32, cap=256, levels=5,
                 gru=256, pose_dim=64, pose_feat=8, max_flow=0.5):
        super().__init__()
        self.levels = levels
        self.image_size = image_size
        self.max_flow = max_flow
        f = lambda i: _features(base, cap, i)

        self.stem = ConvBlock(3, f(0))
        self.downs = nn.ModuleList()
        self.res = nn.ModuleList()
        for i in range(1, levels + 1):
            self.downs.append(ConvBlock(f(i - 1), f(i), stride=2))
            self.res.append(ConvBlock(f(i), f(i)))
        self.gru = ConvGRUCell(f(levels), gru)
        self.pose_fc = nn.Sequential(
            nn.Linear(pose_feat, pose_dim), nn.ReLU(),
            nn.Linear(pose_dim, pose_dim))
        self.mix1 = ConvBlock(gru + pose_dim, gru, kernel=1)
        self.mix2 = ConvBlock(gru, gru)
        self.ups = nn.ModuleList()       # 2x2 conv -> 4f -> pixel shuffle
        self.up_norms = nn.ModuleList()
        self.fuse_x = nn.ModuleList()
        self.fuse_s = nn.ModuleList()
        self.fuse_norms = nn.ModuleList()
        cin = gru
        for i in range(levels - 1, -1, -1):
            self.ups.append(nn.Conv2d(cin, 4 * f(i), 2, padding="same"))
            self.up_norms.append(_gn(f(i)))
            self.fuse_x.append(nn.Conv2d(f(i), f(i), 3, padding=1))
            self.fuse_s.append(nn.Conv2d(f(i) if i > 0 else f(0), f(i), 3,
                                         padding=1, bias=False))
            self.fuse_norms.append(_gn(f(i)))
            cin = f(i)
        self.heads = nn.Conv2d(f(0), 6, 3, padding=1)

    def encode(self, x):
        x = self.stem(x)
        skips = [x]
        for i, (down, res) in enumerate(zip(self.downs, self.res)):
            x = res(down(x))
            if i + 1 < self.levels:
                skips.append(x)
        return x, skips

    def forward(self, image_seq, pose_code):
        """image_seq [B,T,3,H,W]; pose_code [B*K, pose_feat] (K folded by
        caller tiling, as in the JAX model). Returns composite view."""
        b, t = image_seq.shape[:2]
        k = pose_code.shape[0] // b
        h = None
        for ti in range(t):
            bott, skips = self.encode(image_seq[:, ti])
            if h is None:
                h = torch.zeros(b, self.gru.cand.out_channels,
                                *bott.shape[-2:])
            h = self.gru(h, bott)

        h = h.repeat_interleave(k, 0)
        emb = self.pose_fc(pose_code)
        emb = emb[:, :, None, None].expand(-1, -1, *h.shape[-2:])
        x = self.mix2(self.mix1(torch.cat([h, emb], 1)))
        for idx, i in enumerate(range(self.levels - 1, -1, -1)):
            x = F.pixel_shuffle(self.ups[idx](x), 2)
            x = F.relu(self.up_norms[idx](x))
            hx = self.fuse_x[idx](x)
            hs = self.fuse_s[idx](skips[i])      # once per example [B]
            x = hx + hs.repeat_interleave(k, 0)
            x = F.relu(self.fuse_norms[idx](x))
        h3 = self.heads(x)
        flow = torch.tanh(h3[:, 0:2]) * (self.max_flow * self.image_size)
        mask = torch.sigmoid(h3[:, 2:3])
        rgb = torch.tanh(h3[:, 3:6])

        last = image_seq[:, -1].repeat_interleave(k, 0)
        hh, ww = last.shape[-2:]
        ys = torch.arange(hh, dtype=torch.float32)
        xs = torch.arange(ww, dtype=torch.float32)
        gy, gx = torch.meshgrid(ys, xs, indexing="ij")
        cx = gx + flow[:, 0]
        cy = gy + flow[:, 1]
        grid = torch.stack([2 * cx / (ww - 1) - 1, 2 * cy / (hh - 1) - 1], -1)
        warped = F.grid_sample(last, grid, mode="bilinear",
                               padding_mode="border", align_corners=True)
        return mask * warped + (1 - mask) * rgb


@torch.no_grad()
def measure_views_per_sec(image_size=128, batch=16, k=8, t=1, iters=5,
                          warmup=2, threads=None):
    """Stand-in reference throughput: views/sec on CPU, eval forward."""
    import time
    if threads:
        torch.set_num_threads(threads)
    levels = 5 if image_size >= 128 else 4
    model = TorchDMV3D(image_size=image_size, levels=levels).eval()
    seq = torch.randn(batch, t, 3, image_size, image_size)
    pose = torch.randn(batch * k, 8)
    for _ in range(warmup):
        model(seq, pose)
    t0 = time.perf_counter()
    for _ in range(iters):
        model(seq, pose)
    dt = (time.perf_counter() - t0) / iters
    return batch * k / dt


if __name__ == "__main__":
    import json
    vps = measure_views_per_sec()
    print(json.dumps({"standin_reference_views_per_sec_cpu": vps}))
