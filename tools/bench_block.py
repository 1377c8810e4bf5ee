#!/usr/bin/env python
"""A/B the fused Pallas mbconv block vs the XLA three-conv sequence."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ffcnn_tpu.kernels.block_pallas import fused_mbconv
from ffcnn_tpu.ops.conv import conv2d_fused
from ffcnn_tpu.darknet.ir import Activation

CONFIGS = [
    # (N, H, W, Cin, Cmid, Cout, stride, residual)
    (256, 160, 160, 8, 8, 4, 1, True),
    (256, 80, 80, 8, 32, 8, 1, True),
    (256, 40, 40, 16, 96, 16, 1, True),
    (256, 20, 20, 24, 136, 24, 1, True),
    (256, 10, 10, 48, 224, 48, 1, True),
    (256, 160, 160, 8, 24, 8, 2, False),
    (256, 40, 40, 16, 96, 24, 2, False),
]


def t(f, *a):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(30):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / 30 * 1000, r


def main():
    rng = np.random.RandomState(0)
    for n, h, w, cin, cmid, cout, stride, residual in CONFIGS:
        x = jnp.asarray(rng.randn(n, h, w, cin).astype(np.float32) * 0.5,
                        jnp.bfloat16)
        w1 = jnp.asarray(rng.randn(cin, cmid).astype(np.float32) * 0.2)
        wd = jnp.asarray(rng.randn(3, 3, cmid).astype(np.float32) * 0.2)
        w2 = jnp.asarray(rng.randn(cmid, cout).astype(np.float32) * 0.2)
        mk = lambda c: jnp.asarray(rng.rand(c).astype(np.float32) + 0.5)
        s1, b1, sd, bd, s2, b2 = (mk(cmid), mk(cmid), mk(cmid), mk(cmid),
                                  mk(cout), mk(cout))
        oh, ow = (h // stride, w // stride) if stride == 2 else (h, w)
        res = (jnp.asarray(rng.randn(n, oh, ow, cout).astype(np.float32) * 0.5,
                           jnp.bfloat16) if residual else None)

        def xla_seq(x, res):
            y = conv2d_fused(x, w1[None, None].astype(jnp.bfloat16), s1, b1,
                             stride=1, pad=0, groups=1,
                             act=int(Activation.LEAKY))
            y = conv2d_fused(y, wd[:, :, None, :].astype(jnp.bfloat16), sd, bd,
                             stride=stride, pad=1, groups=cmid,
                             act=int(Activation.LEAKY))
            y = conv2d_fused(y, w2[None, None].astype(jnp.bfloat16), s2, b2,
                             stride=1, pad=0, groups=1,
                             act=int(Activation.LINEAR))
            return y + res if residual else y

        fx = jax.jit(xla_seq)
        fp = jax.jit(lambda x, res: fused_mbconv(
            x, w1, s1, b1, wd, sd, bd, w2, s2, b2, res,
            stride=stride, residual=residual))
        args = (x, res if residual else jnp.zeros((1,), jnp.bfloat16) * 0)
        try:
            tx, rx = t(fx, x, res)
            tp, rp = t(fp, x, res)
        except Exception as e:
            print(f"{h}x{w} {cin}->{cmid}->{cout} s{stride}: FAIL {type(e).__name__}: {e}")
            continue
        diff = np.max(np.abs(np.asarray(rx, np.float32)
                             - np.asarray(rp, np.float32)))
        rel = diff / max(1e-6, float(np.max(np.abs(np.asarray(rx, np.float32)))))
        print(f"{h:3d}x{w:<3d} {cin:3d}->{cmid:3d}->{cout:3d} s{stride}"
              f"  xla {tx:7.3f} ms  pallas {tp:7.3f} ms "
              f" speedup {tx/tp:4.1f}x  maxdiff {diff:.4f} (rel {rel:.4f})")


if __name__ == "__main__":
    main()
