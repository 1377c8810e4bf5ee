#!/usr/bin/env python
"""Independent torch YOLOv8 reference for the conversion differential.

The repo's YOLOv8 ingest (ffcnn_tpu/yolov8.py) re-derives the public
architecture and lowers it onto the darknet dialect.  This module builds
the SAME architecture out of plain ``torch.nn`` modules (torch's own
conv/BN/SiLU/maxpool kernels — a compute path with nothing in common
with the jax/numpy stacks) with ultralytics parameter naming, so that:

* ``load_state_dict`` over the converter's input state dict proves the
  re-derived module tree matches the public naming layer-for-layer
  (wrong depth/width/order = missing/unexpected keys, hard failure);
* the forward pass gives an independent ground truth for every head's
  raw (4*reg_max + nc) feature map — any BN-fold, route-order, pool
  or packing bug in the converter shows up as a numeric mismatch.

No ultralytics code is used; module structure follows the public
YOLOv8 description (same source as ffcnn_tpu/yolov8.py's docstring).
The decode below implements the same public DFL formulation as
oracle/numpy_ref.yolov8_decode — the *forward* is the independent part,
like the C-binary differential (tools/c_differential.py) where the
shared spec is the cfg dialect and the compute stacks are disjoint.

CLI: synthesizes a state dict, runs torch vs the numpy oracle vs the
jax pipeline on a random image, prints max deviations, exits nonzero
past tolerance::

    /opt/venv/bin/python tools/torch_yolov8_ref.py --scale n --size 320
"""
from __future__ import annotations

import argparse
import os
import sys
from typing import Dict, List, Tuple

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import torch                                              # noqa: E402
import torch.nn as nn                                     # noqa: E402

from ffcnn_tpu.yolov8 import (REG_MAX, SCALES, STRIDES,   # noqa: E402
                              _make_divisible)

BN_EPS = 1e-3          # torch BatchNorm2d eps the public Conv block uses


class Conv(nn.Module):
    """conv + BN + SiLU (state-dict names: conv.*, bn.*)."""

    def __init__(self, c1: int, c2: int, k: int = 1, s: int = 1):
        super().__init__()
        self.conv = nn.Conv2d(c1, c2, k, s, k // 2, bias=False)
        self.bn = nn.BatchNorm2d(c2, eps=BN_EPS)
        self.act = nn.SiLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class Bottleneck(nn.Module):
    def __init__(self, c: int, shortcut: bool):
        super().__init__()
        self.cv1 = Conv(c, c, 3)
        self.cv2 = Conv(c, c, 3)
        self.add = shortcut

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class C2f(nn.Module):
    def __init__(self, c1: int, c2: int, n: int, shortcut: bool):
        super().__init__()
        self.c = c2 // 2
        self.cv1 = Conv(c1, 2 * self.c, 1)
        self.cv2 = Conv((2 + n) * self.c, c2, 1)
        self.m = nn.ModuleList(Bottleneck(self.c, shortcut)
                               for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class SPPF(nn.Module):
    def __init__(self, c1: int, c2: int, k: int = 5):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = Conv(c1, c_, 1)
        self.cv2 = Conv(c_ * 4, c2, 1)
        self.m = nn.MaxPool2d(k, 1, k // 2)

    def forward(self, x):
        x = self.cv1(x)
        y1 = self.m(x)
        y2 = self.m(y1)
        return self.cv2(torch.cat((x, y1, y2, self.m(y2)), 1))


class Detect(nn.Module):
    """Raw-output detect head: returns the per-scale concat
    [4*reg_max box logits | nc class logits] maps (decode happens in
    :func:`decode`, outside the module, so the module's state dict is
    exactly the trainable surface the converter consumes)."""

    def __init__(self, nc: int, ch: Tuple[int, ...],
                 reg_max: int = REG_MAX):
        super().__init__()
        self.nc, self.reg_max = nc, reg_max
        c2 = max(16, ch[0] // 4, reg_max * 4)
        c3 = max(ch[0], min(nc, 100))
        self.cv2 = nn.ModuleList(
            nn.Sequential(Conv(c, c2, 3), Conv(c2, c2, 3),
                          nn.Conv2d(c2, 4 * reg_max, 1)) for c in ch)
        self.cv3 = nn.ModuleList(
            nn.Sequential(Conv(c, c3, 3), Conv(c3, c3, 3),
                          nn.Conv2d(c3, nc, 1)) for c in ch)

    def forward(self, xs):
        return [torch.cat((cv2(x), cv3(x)), 1)
                for x, cv2, cv3 in zip(xs, self.cv2, self.cv3)]


class _Passthrough(nn.Module):
    """Parameterless placeholder keeping ModuleList indices aligned with
    the public yaml (upsample/concat slots)."""


class YOLOv8(nn.Module):
    def __init__(self, nc: int = 80, scale: str = "n"):
        super().__init__()
        depth, width, max_c = SCALES[scale]
        w = lambda c: _make_divisible(min(c, max_c) * width)   # noqa: E731
        d = lambda n: max(round(n * depth), 1)                 # noqa: E731
        up = nn.Upsample(scale_factor=2, mode="nearest")
        self.model = nn.ModuleList([
            Conv(3, w(64), 3, 2),                              # 0
            Conv(w(64), w(128), 3, 2),                         # 1
            C2f(w(128), w(128), d(3), True),                   # 2
            Conv(w(128), w(256), 3, 2),                        # 3
            C2f(w(256), w(256), d(6), True),                   # 4  P3
            Conv(w(256), w(512), 3, 2),                        # 5
            C2f(w(512), w(512), d(6), True),                   # 6  P4
            Conv(w(512), w(1024), 3, 2),                       # 7
            C2f(w(1024), w(1024), d(3), True),                 # 8
            SPPF(w(1024), w(1024)),                            # 9  P5
            up,                                                # 10
            _Passthrough(),                                    # 11 cat
            C2f(w(512) + w(1024), w(512), d(3), False),        # 12
            up,                                                # 13
            _Passthrough(),                                    # 14 cat
            C2f(w(256) + w(512), w(256), d(3), False),         # 15 P3 out
            Conv(w(256), w(256), 3, 2),                        # 16
            _Passthrough(),                                    # 17 cat
            C2f(w(256) + w(512), w(512), d(3), False),         # 18 P4 out
            Conv(w(512), w(512), 3, 2),                        # 19
            _Passthrough(),                                    # 20 cat
            C2f(w(512) + w(1024), w(1024), d(3), False),       # 21 P5 out
            Detect(nc, (w(256), w(512), w(1024))),             # 22
        ])

    def forward(self, x):
        m = self.model
        x = m[1](m[0](x))
        x = m[3](m[2](x))
        p3 = m[4](x)
        p4 = m[6](m[5](p3))
        p5 = m[9](m[8](m[7](p4)))
        t = m[12](torch.cat((m[10](p5), p4), 1))
        h3 = m[15](torch.cat((m[13](t), p3), 1))
        h4 = m[18](torch.cat((m[16](h3), t), 1))
        h5 = m[21](torch.cat((m[19](h4), p5), 1))
        return m[22]([h3, h4, h5])


def build_model(sd: Dict, nc: int = 80, scale: str = "n") -> YOLOv8:
    """Instantiate + load; the load doubles as the architecture check.
    Tolerated missing keys: BN bookkeeping (num_batches_tracked) and the
    constant DFL conv (ultralytics exports carry both; the converter's
    synthetic dicts carry neither)."""
    model = YOLOv8(nc, scale)
    sd = {k: torch.as_tensor(np.asarray(v, np.float32)) if not
          isinstance(v, torch.Tensor) else v for k, v in sd.items()}
    missing, unexpected = model.load_state_dict(sd, strict=False)
    bad_missing = [k for k in missing if "num_batches_tracked" not in k]
    bad_unexpected = [k for k in unexpected
                      if "num_batches_tracked" not in k
                      and ".dfl." not in k]
    if bad_missing or bad_unexpected:
        raise ValueError(f"state dict mismatch: missing={bad_missing[:8]} "
                         f"unexpected={bad_unexpected[:8]}")
    return model.eval()


def forward_heads(model: YOLOv8, x_hwc: np.ndarray) -> List[np.ndarray]:
    """Net input (H, W, 3) float32 in [0,1] → per-scale raw head maps
    (h, w, 4*reg_max + nc), channels-last to match the jax pipeline's
    head-blob convention."""
    t = torch.from_numpy(np.ascontiguousarray(
        x_hwc.astype(np.float32).transpose(2, 0, 1)))[None]
    with torch.no_grad():
        outs = model(t)
    return [o[0].numpy().transpose(1, 2, 0) for o in outs]


def decode(raws: List[np.ndarray], nc: int, reg_max: int = REG_MAX,
           strides: Tuple[int, ...] = STRIDES,
           conf: float = 0.0) -> List[Tuple]:
    """Public DFL decode over raw maps → (class, score, x1, y1, x2, y2)
    candidates in net pixels, per-scale scan order (same convention as
    oracle/numpy_ref.yolov8_decode; ``conf=0.0`` emits every cell, which
    is what the differential compares — no threshold knife edges)."""
    out = []
    for raw, stride in zip(raws, strides):
        h, w, _ = raw.shape
        v = raw.astype(np.float64)
        box = v[..., :4 * reg_max].reshape(h, w, 4, reg_max)
        box = box - box.max(-1, keepdims=True)
        e = np.exp(box)
        dist = (e * np.arange(reg_max)).sum(-1) / e.sum(-1)   # (h, w, 4)
        cls = v[..., 4 * reg_max:]
        cidx = cls.argmax(-1)                                  # first-max
        score = 1.0 / (1.0 + np.exp(-cls.max(-1)))
        jj = np.arange(w) + 0.5
        ii = (np.arange(h) + 0.5)[:, None]
        x1 = (jj - dist[..., 0]) * stride
        y1 = (ii - dist[..., 1]) * stride
        x2 = (jj + dist[..., 2]) * stride
        y2 = (ii + dist[..., 3]) * stride
        for i in range(h):
            for j in range(w):
                if score[i, j] >= conf:
                    out.append((int(cidx[i, j]), np.float32(score[i, j]),
                                x1[i, j], y1[i, j], x2[i, j], y2[i, j]))
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--scale", default="n", choices=sorted(SCALES))
    ap.add_argument("--size", type=int, default=320)
    ap.add_argument("--nc", type=int, default=80)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--sd", default=None,
                    help="torch-saved plain state dict (default: synth)")
    ap.add_argument("--tol-box", type=float, default=1e-2,
                    help="max |Δ| in box coords, net pixels")
    ap.add_argument("--tol-score", type=float, default=1e-3)
    args = ap.parse_args(argv)

    from ffcnn_tpu import yolov8
    from ffcnn_tpu.darknet.cfg import parse_cfg
    from ffcnn_tpu.darknet.weights import load_weights
    from ffcnn_tpu.oracle import numpy_ref

    if args.sd:
        sd = torch.load(args.sd, map_location="cpu", weights_only=True)
    else:
        sd = yolov8.synthesize_state_dict(args.nc, args.scale,
                                          seed=args.seed)
    model = build_model(sd, args.nc, args.scale)
    print(f"torch model built; state dict loaded strict "
          f"({sum(p.numel() for p in model.parameters())} params)")

    cfg, wbytes = yolov8.convert(sd, args.nc, args.scale, size=args.size,
                                 conf=0.0)
    ir = parse_cfg(cfg, is_path=False)
    params, _ = load_weights(ir, wbytes)

    rng = np.random.RandomState(args.seed + 1)
    x = rng.rand(args.size, args.size, 3).astype(np.float32)

    raws = forward_heads(model, x)
    t_cands = decode(raws, args.nc, conf=0.0)
    o_cands = numpy_ref.net_candidates(ir, params, x)
    if len(t_cands) != len(o_cands):
        print(f"FAIL: candidate counts differ: torch {len(t_cands)} "
              f"oracle {len(o_cands)}")
        return 1
    d_score = max(abs(float(t[1]) - float(o[1]))
                  for t, o in zip(t_cands, o_cands))
    d_box = max(abs(float(tv) - float(ov))
                for t, o in zip(t_cands, o_cands)
                for tv, ov in zip(t[2:], o[2:]))
    d_cls = sum(t[0] != o[0] for t, o in zip(t_cands, o_cands))
    print(f"torch vs oracle over {len(t_cands)} candidates: "
          f"max |Δscore| {d_score:.2e}  max |Δbox| {d_box:.2e} px  "
          f"class flips {d_cls}")
    ok = d_score <= args.tol_score and d_box <= args.tol_box and not d_cls
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
