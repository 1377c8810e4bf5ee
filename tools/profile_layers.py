#!/usr/bin/env python
"""Per-layer device-time profile of the fused pipeline on the flagship model.

Thin CLI wrapper over ffcnn_tpu.profiling / Net.profile_layers (the
`ffcnn profile` subcommand offers the same with model flags).

Usage: python tools/profile_layers.py [batch] [size|WxH]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CFG = "/root/reference/yolo-fastest-1.1.cfg"
WEIGHTS = "/root/reference/yolo-fastest-1.1.weights"


def main():
    bn = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    geo = sys.argv[2] if len(sys.argv) > 2 else "320"
    w, h = (map(int, geo.split("x")) if "x" in geo
            else (int(geo), int(geo)))
    from ffcnn_tpu import Net
    from ffcnn_tpu.imageio.bmp import bmp_load

    net = Net.load(CFG, WEIGHTS, mode="fast", input_w=w, input_h=h)
    img = bmp_load("/root/repo/tests/fixtures/test320.bmp")
    if img.shape[:2] != (h, w):
        img = img[(np.arange(h) * img.shape[0]) // h][
            :, (np.arange(w) * img.shape[1]) // w]
    batch = np.broadcast_to(img, (bn,) + img.shape).copy()
    rep = net.profile_layers(batch=batch, iters=10)
    sys.stdout.write(rep.render())


if __name__ == "__main__":
    main()
