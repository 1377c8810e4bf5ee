"""Fused inverted-residual Pallas runs (kernels/block_fused.py): pattern
detection safety, numeric equivalence with the XLA conv path (interpret
mode on CPU), and gating."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ffcnn_tpu.darknet import parse_cfg
from ffcnn_tpu.darknet.ir import LayerType
from ffcnn_tpu.darknet.weights import load_weights, synth_weights_bytes
from ffcnn_tpu.graph.build import forward_features, params_to_pytree
from ffcnn_tpu.kernels.block_fused import (FusedRun, apply_run,
                                           find_fused_blocks, plan_runs,
                                           runs_usable)

REF_CFG = "/root/reference/yolo-fastest-1.1.cfg"


def test_find_blocks_flagship():
    ir = parse_cfg(REF_CFG, 320, 320)
    blocks = find_fused_blocks(ir)
    # 20 inverted-residual blocks cover 96 of the 131 layers
    assert len(blocks) == 20
    assert sum(b.end - b.start + 1 for b in blocks.values()) == 96
    # every interior blob is free of route/shortcut references
    referenced = set()
    for l in ir.layers:
        if l.type in (LayerType.ROUTE, LayerType.SHORTCUT):
            referenced.update(d + 1 for d in l.depends)
    for b in blocks.values():
        interior = set(range(b.start + 1, b.end + 1))
        assert not (interior & referenced), b


def test_plan_runs_gates_small_channels():
    ir = parse_cfg(REF_CFG, 320, 320)
    runs = plan_runs(ir)                       # default MIN_CHANNELS
    for r in runs:
        assert ir.blobs[r.start].c >= 24
    # the 20x20 (C=24) and 10x10 (C=48) stages form two multi-block runs
    starts = sorted(r.start for r in runs)
    assert starts == [61, 84]
    assert [len(r.blocks) for r in sorted(runs, key=lambda r: r.start)] == \
        [4, 5]


def test_runs_usable_gate():
    assert not runs_usable(64, backend="tpu")       # batch not tile-aligned
    assert runs_usable(256, backend="tpu")
    assert not runs_usable(256, backend="cpu")


@pytest.mark.parametrize("min_channels", [1])
def test_fused_forward_matches_xla_micro(min_channels):
    """Whole-net equivalence on the micro model (its one residual triple
    fuses at min_channels=1), interpret mode, f32."""
    import os
    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ir = parse_cfg(os.path.join(REPO, "models", "ffcnn-micro.cfg"), 64, 64)
    params = params_to_pytree(load_weights(
        ir, synth_weights_bytes(ir, seed=3, obj_bias=0.0))[0])
    runs = plan_runs(ir, min_channels=min_channels)
    assert runs, "micro net should have at least one fusable block"

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))

    ref = forward_features(ir, params, x)
    got = forward_features(ir, params, x, fused_runs=runs,
                           fused_interpret=True)
    assert len(ref) == len(got)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("name,size", [("yolo-fastest-xl", 160)])
def test_fused_forward_matches_xla_zoo(name, size):
    """Fused runs must be model-generic: the XL family (2x width, same
    block dialect) through forward_features with and without fusion."""
    import os
    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ir = parse_cfg(os.path.join(REPO, "models", f"{name}.cfg"), size, size)
    params = params_to_pytree(load_weights(
        ir, synth_weights_bytes(ir, seed=5, obj_bias=0.0))[0])
    runs = plan_runs(ir)
    assert runs, f"{name} should have fusable C>=24 runs"

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, size, size, 3).astype(np.float32))
    ref = forward_features(ir, params, x)
    got = forward_features(ir, params, x, fused_runs=runs,
                           fused_interpret=True)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-3)


def test_fused_run_chain_matches_xla_flagship_stage():
    """The real 20x20 stage (4 chained residual blocks, C24/E136) through
    apply_run vs the XLA path, interpret mode."""
    ir = parse_cfg(REF_CFG, 320, 320)
    params = params_to_pytree(load_weights(
        ir, synth_weights_bytes(ir, seed=1, obj_bias=0.0))[0])
    runs = [r for r in plan_runs(ir) if r.start == 61]
    assert runs and len(runs[0].blocks) == 4

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 20, 20, 24).astype(np.float32) * 0.5)

    # XLA reference: run layers 61..80 directly
    from ffcnn_tpu.ops.conv import conv2d_fused
    from ffcnn_tpu.ops.activations import activate
    blobs = {61: x}
    cur = x
    for li in range(61, 81):
        l = ir.layers[li]
        if l.type == LayerType.CONV:
            p = params[li]
            cur = conv2d_fused(cur, p["weights"], p["scale"], p["bias"],
                               stride=l.stride, pad=l.pad, groups=l.groups,
                               act=l.activation)
        elif l.type == LayerType.DROPOUT:
            pass
        elif l.type == LayerType.SHORTCUT:
            cur = activate(cur + blobs[l.depends[0] + 1], l.activation)
        blobs[li + 1] = cur

    got = apply_run(x, ir, params, runs[0], interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(cur),
                               rtol=2e-3, atol=2e-3)


def test_mega_run_matches_per_block(monkeypatch):
    """The whole-run mega kernel (one pallas_call, grid over 128-image
    batch chunks, boundary blobs VMEM-resident) vs the per-block kernel
    path on the flagship 20x20 stage, interpret mode."""
    ir = parse_cfg(REF_CFG, 320, 320)
    params = params_to_pytree(load_weights(
        ir, synth_weights_bytes(ir, seed=2, obj_bias=0.0))[0])
    run = [r for r in plan_runs(ir) if r.start == 61][0]

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(128, 20, 20, 24).astype(np.float32) * 0.5)

    from ffcnn_tpu.kernels import block_fused
    assert block_fused._mega_fits(ir, params, run, 20, 20)
    monkeypatch.setenv("FFCNN_FUSED_MEGA", "1")
    got = apply_run(x, ir, params, run, interpret=True)
    monkeypatch.setenv("FFCNN_FUSED_MEGA", "0")
    ref = apply_run(x, ir, params, run, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
