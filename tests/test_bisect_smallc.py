"""The C<=16 bisection harness (tools/bisect_smallc.py) must time the
REAL kernel semantics: its 'full' variant is pinned to the XLA conv
chain here (interpret mode, tiny geometry) so the on-chip attribution
numbers are about performance, not a diverged body."""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from ffcnn_tpu.darknet.ir import Activation
from ffcnn_tpu.ops.conv import conv2d_fused

LEAKY = int(Activation.LEAKY)
LINEAR = int(Activation.LINEAR)


@pytest.fixture()
def interp_env(monkeypatch):
    monkeypatch.setenv("BISECT_INTERPRET", "1")


def _params(rng, c, e):
    mk = lambda *sh: jnp.asarray(rng.randn(*sh).astype(np.float32) * 0.2)
    col = lambda m: jnp.asarray(rng.rand(m, 1).astype(np.float32) * .5 + .5)
    return (mk(e, c), col(e), col(e), mk(3, 3, e), col(e), col(e),
            mk(c, e), col(c), col(c))


def test_full_variant_matches_xla_chain(interp_env):
    import bisect_smallc as B
    rng = np.random.RandomState(0)
    n, hh, width, c, e = 8, 8, 8, 8, 16
    p9 = _params(rng, c, e)
    xh = jnp.asarray(rng.randn(n, hh, width, c).astype(np.float32) * 0.25)

    step = B.variant_step("full", hh, width, n, c, e, p9, jnp.float32)
    xc = jnp.transpose(xh, (1, 3, 2, 0)).reshape(hh, c, width * n)
    got = jnp.transpose(step(xc).reshape(hh, c, width, n), (3, 0, 2, 1))

    w1x = p9[0].T[None, None]
    wdx = p9[3][:, :, None, :]
    w2x = p9[6].T[None, None]
    sb = [jnp.squeeze(p9[i], -1) for i in (1, 2, 4, 5, 7, 8)]
    y = conv2d_fused(xh, w1x, sb[0], sb[1], stride=1, pad=0, groups=1,
                     act=LEAKY)
    y = conv2d_fused(y, wdx, sb[2], sb[3], stride=1, pad=1, groups=e,
                     act=LEAKY)
    y = conv2d_fused(y, w2x, sb[4], sb[5], stride=1, pad=0, groups=1,
                     act=LINEAR)
    want = y + xh
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_variants_preserve_shape(interp_env):
    import bisect_smallc as B
    rng = np.random.RandomState(1)
    n, hh, width, c, e = 8, 8, 8, 8, 16
    p9 = _params(rng, c, e)
    xc = jnp.asarray(rng.randn(hh, c, width * n).astype(np.float32))
    for mode in ("copy", "dwonly", "pwonly", "full"):
        step = B.variant_step(mode, hh, width, n, c, e, p9, jnp.float32)
        out = step(xc)
        assert out.shape == xc.shape, mode
        assert bool(jnp.all(jnp.isfinite(out))), mode


def test_copy_variant_is_identity(interp_env):
    import bisect_smallc as B
    rng = np.random.RandomState(2)
    n, hh, width, c, e = 8, 8, 8, 8, 16
    p9 = _params(rng, c, e)
    xc = jnp.asarray(rng.randn(hh, c, width * n).astype(np.float32))
    step = B.variant_step("copy", hh, width, n, c, e, p9, jnp.float32)
    np.testing.assert_array_equal(np.asarray(step(xc)), np.asarray(xc))
