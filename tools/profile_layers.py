#!/usr/bin/env python
"""Per-layer device-time profile of the fused pipeline on the flagship model.

Thin CLI wrapper over ffcnn_tpu.profiling / Net.profile_layers (the
`ffcnn profile` subcommand offers the same with model flags).

Usage: python tools/profile_layers.py [batch] [size]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CFG = "/root/reference/yolo-fastest-1.1.cfg"
WEIGHTS = "/root/reference/yolo-fastest-1.1.weights"


def main():
    bn = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 320
    from ffcnn_tpu import Net
    from ffcnn_tpu.imageio.bmp import bmp_load

    net = Net.load(CFG, WEIGHTS, mode="fast", input_w=size, input_h=size)
    img = bmp_load("/root/repo/tests/fixtures/test320.bmp")
    if img.shape[0] != size:
        img = img[(np.arange(size) * img.shape[0]) // size][
            :, (np.arange(size) * img.shape[1]) // size]
    batch = np.broadcast_to(img, (bn,) + img.shape).copy()
    rep = net.profile_layers(batch=batch, iters=10)
    sys.stdout.write(rep.render())


if __name__ == "__main__":
    main()
