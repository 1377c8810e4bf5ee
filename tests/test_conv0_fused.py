"""Pallas stem (kernels/conv0_fused.py): conv0 off uint8 pixels with an
in-kernel batch-to-lanes transpose, emitting the fused (H, C, W*N) layout
chained into a region run — interpret-mode equivalence vs the XLA path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ffcnn_tpu.darknet import parse_cfg
from ffcnn_tpu.darknet.weights import load_weights, synth_weights_bytes
from ffcnn_tpu.graph.build import forward_features, params_to_pytree
from ffcnn_tpu.kernels.conv0_fused import conv0_cs
from ffcnn_tpu.ops.conv import conv2d_fused

REF_CFG = "/root/reference/yolo-fastest-1.1.cfg"


def _flagship(seed=9, size=320):
    ir = parse_cfg(REF_CFG, size, size)
    params = params_to_pytree(load_weights(
        ir, synth_weights_bytes(ir, seed=seed, obj_bias=0.0))[0])
    return ir, params


def test_conv0_cs_matches_conv2d_fused():
    ir, params = _flagship()
    p = params[0]
    rng = np.random.RandomState(0)
    x = rng.randint(0, 256, (4, 64, 64, 3)).astype(np.uint8)

    want = conv2d_fused(jnp.asarray(x, jnp.float32), p["weights"],
                        p["scale"], p["bias"], stride=2, pad=1, groups=1,
                        act=ir.layers[0].activation)       # (4, 32, 32, 8)
    got_cs = conv0_cs(jnp.asarray(x), p["weights"], p["scale"], p["bias"],
                      ir.layers[0].activation, out_dtype=jnp.float32,
                      interpret=True)                       # (32, 8, 32*4)
    got = jnp.transpose(got_cs.reshape(32, 8, 32, 4), (3, 0, 2, 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_conv0_pallas_whole_net_matches(monkeypatch):
    """forward_features with the Pallas stem + whole-backbone regions vs
    the plain XLA path, uint8 input, interpret mode."""
    monkeypatch.setenv("FFCNN_FUSED_DOWN", "1")
    from ffcnn_tpu.kernels.block_fused import plan_runs

    ir, params = _flagship(seed=11, size=160)
    runs = plan_runs(ir, min_channels=1)
    assert any(r.start == 1 for r in runs)

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randint(0, 256, (2, 160, 160, 3)).astype(np.uint8))
    ref = forward_features(ir, params, x, input_dtype=jnp.float32)
    got = forward_features(ir, params, x, input_dtype=jnp.float32,
                           fused_runs=runs, conv0_pallas=True,
                           fused_interpret=True)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-3)


def test_conv0_pallas_guard_without_region():
    """conv0_pallas quietly falls back to the normal path when no region
    run starts at layer 1 (the default C>=24 planning)."""
    from ffcnn_tpu.kernels.block_fused import plan_runs

    ir, params = _flagship(seed=12, size=160)
    runs = plan_runs(ir)                       # default: runs start at 61+
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randint(0, 256, (2, 160, 160, 3)).astype(np.uint8))
    ref = forward_features(ir, params, x, input_dtype=jnp.float32)
    got = forward_features(ir, params, x, input_dtype=jnp.float32,
                           fused_runs=runs, conv0_pallas=True,
                           fused_interpret=True)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-3)
