"""Fused YOLO-head chain kernel (kernels/head_fused.py): plan discovery on
the flagship graph, and interpret-mode numeric equivalence vs the plain
conv chain."""

import numpy as np
import jax.numpy as jnp
import pytest

import conftest
from ffcnn_tpu.darknet import parse_cfg
from ffcnn_tpu.darknet.ir import LayerType
from ffcnn_tpu.darknet.weights import zero_weights
from ffcnn_tpu.graph.build import forward_features, params_to_pytree
from ffcnn_tpu.kernels.head_fused import (HeadRun, apply_head_run,
                                          plan_head_runs)

CFG = "/root/reference/yolo-fastest-1.1.cfg"


def _rand_net(seed=0):
    ir = parse_cfg(CFG)
    params = zero_weights(ir)
    rng = np.random.RandomState(seed)
    for p in params.values():
        p.weights[...] = rng.randn(*p.weights.shape).astype(np.float32) * 0.2
        p.scale[...] = (rng.rand(*p.scale.shape) + 0.5).astype(np.float32)
        p.bias[...] = rng.randn(*p.bias.shape).astype(np.float32) * 0.1
    return ir, params_to_pytree(params)


def test_plan_head_runs_flagship():
    """Both heads fuse; the 10x10 chain starts AFTER layer 115 because
    route 122 consumes blob 116 (layer 115's output)."""
    ir = parse_cfg(CFG)
    runs = plan_head_runs(ir)
    assert [(r.start, r.end) for r in runs] == [(116, 120), (125, 129)]
    # every interior blob is only consumed inside its chain
    referenced = set()
    for l in ir.layers:
        if l.type in (LayerType.ROUTE, LayerType.SHORTCUT):
            referenced.update(d + 1 for d in l.depends)
    for r in runs:
        assert not referenced & set(range(r.start + 1, r.end + 1))


def test_apply_head_run_matches_chain():
    ir, params = _rand_net()
    runs = plan_head_runs(ir)
    rng = np.random.RandomState(1)
    for run in runs:
        b = ir.blobs[run.start]
        x = jnp.asarray(rng.randn(4, b.h, b.w, b.c).astype(np.float32) * 0.5)
        got = apply_head_run(x, ir, params, run, interpret=True)
        # reference: the plain conv chain
        from ffcnn_tpu.ops.conv import conv2d_fused
        want = x
        for li in range(run.start, run.end + 1):
            l = ir.layers[li]
            p = params[li]
            want = conv2d_fused(want, jnp.asarray(p["weights"]),
                                jnp.asarray(p["scale"]),
                                jnp.asarray(p["bias"]), stride=l.stride,
                                pad=l.pad, groups=l.groups,
                                act=l.activation)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=2e-4)


def test_forward_features_with_head_runs():
    """Whole-graph equivalence: head_runs on vs off, interpret mode."""
    ir, params = _rand_net(2)
    runs = plan_head_runs(ir)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(2, ir.blobs[0].h, ir.blobs[0].w, 3)
                    .astype(np.float32))
    want = forward_features(ir, params, x)
    got = forward_features(ir, params, x, head_runs=runs,
                           fused_interpret=True)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-4, rtol=2e-4)


def test_head_runs_skip_on_unreferenced_guard():
    """A graph whose head conv chain is interrupted by an outside consumer
    must shorten the run, never fuse across it (flagship: start=116)."""
    ir = parse_cfg(CFG)
    runs = plan_head_runs(ir)
    assert runs[0].start == 116          # NOT 115
