"""Channels-first fused block kernel (experimental) vs the XLA conv
sequence — interpret mode on CPU, so the kernel stays correct even while
off the default path (see docs/PERF_NOTES.md)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ffcnn_tpu.darknet.ir import Activation
from ffcnn_tpu.kernels.csblock_pallas import (cs_to_nhwc, fused_mbconv_cs,
                                              nhwc_to_cs)
from ffcnn_tpu.ops.conv import conv2d_fused


@pytest.mark.parametrize("residual", [True, False])
def test_cs_block_matches_xla(residual):
    rng = np.random.RandomState(0)
    n, h, w, cin, cmid, cout = 4, 12, 10, 8, 16, 8
    x = jnp.asarray(rng.randn(n, h, w, cin).astype(np.float32) * 0.5)
    res = jnp.asarray(rng.randn(n, h, w, cout).astype(np.float32) * 0.5)
    w1 = rng.randn(cmid, cin).astype(np.float32) * 0.3
    wd = rng.randn(3, 3, cmid).astype(np.float32) * 0.3
    w2 = rng.randn(cout, cmid).astype(np.float32) * 0.3
    mk = lambda c: rng.rand(c).astype(np.float32) + 0.5
    s1, b1, sd, bd, s2, b2 = (mk(cmid), mk(cmid), mk(cmid), mk(cmid),
                              mk(cout), mk(cout))

    def xla_block(x, res):
        y = conv2d_fused(x, jnp.asarray(w1.T[None, None]), s1, b1, stride=1,
                         pad=0, groups=1, act=int(Activation.LEAKY))
        y = conv2d_fused(y, jnp.asarray(wd[:, :, None, :]), sd, bd, stride=1,
                         pad=1, groups=cmid, act=int(Activation.LEAKY))
        y = conv2d_fused(y, jnp.asarray(w2.T[None, None]), s2, b2, stride=1,
                         pad=0, groups=1, act=0)
        return y + res if residual else y

    ref = np.asarray(xla_block(x, res))
    y_cs = fused_mbconv_cs(nhwc_to_cs(x), jnp.asarray(w1), s1, b1,
                           jnp.asarray(wd), sd, bd, jnp.asarray(w2), s2, b2,
                           nhwc_to_cs(res) if residual else None,
                           H=h, W=w, interpret=True)
    got = np.asarray(cs_to_nhwc(y_cs, n, h, w))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
