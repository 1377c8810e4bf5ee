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
    # 20 inverted-residual blocks + 4 stride-2 stage transitions cover
    # 108 of the 131 layers
    assert len(blocks) == 24
    assert sum(b.end - b.start + 1 for b in blocks.values()) == 108
    downs = sorted(s for s, b in blocks.items() if b.down)
    assert downs == [9, 22, 58, 81]
    assert all(not blocks[s].residual for s in downs)
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


def test_down_block_kernel_matches_xla():
    """The stride-2 stage-transition kernel (L58-60 at 320x320: 40x40/C16
    -> 20x20/C24 through E96) vs the XLA conv chain, interpret mode."""
    from ffcnn_tpu.kernels.block_fused import find_fused_blocks
    from ffcnn_tpu.ops.conv import conv2d_fused

    ir = parse_cfg(REF_CFG, 320, 320)
    params = params_to_pytree(load_weights(
        ir, synth_weights_bytes(ir, seed=4, obj_bias=0.0))[0])
    b = find_fused_blocks(ir)[58]
    assert b.down and b.end == 60

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 40, 40, 16).astype(np.float32) * 0.5)
    cur = x
    for li in range(58, 61):
        l = ir.layers[li]
        p = params[li]
        cur = conv2d_fused(cur, p["weights"], p["scale"], p["bias"],
                           stride=l.stride, pad=l.pad, groups=l.groups,
                           act=l.activation)
    from ffcnn_tpu.kernels.block_fused import FusedRun
    got = apply_run(x, ir, params, FusedRun(58, 60, (b,)), interpret=True)
    assert got.shape == (2, 20, 20, 24)
    np.testing.assert_allclose(np.asarray(got), np.asarray(cur),
                               rtol=2e-3, atol=2e-3)


def test_region_runs_span_stages(monkeypatch):
    """FFCNN_FUSED_DOWN=1 + MINC=1: runs chain ACROSS stride-2 stage
    transitions — the flagship backbone collapses into a few whole-region
    runs, and the fused forward still matches XLA (interpret mode)."""
    monkeypatch.setenv("FFCNN_FUSED_DOWN", "1")
    ir = parse_cfg(REF_CFG, 160, 160)        # test-sized interpret cost
    runs = plan_runs(ir, min_channels=1)
    # the whole backbone collapses to TWO regions: L1..L80 (15 residual
    # blocks + 3 stage transitions) and L81..L108 (the L81 down block
    # starts a new run because blob 81 feeds route L124, + the 10x10
    # stage's 5 residual blocks).
    spans = [(r.start, r.end, len(r.blocks)) for r in runs]
    assert spans == [(1, 80, 18), (81, 108, 6)], spans

    params = params_to_pytree(load_weights(
        ir, synth_weights_bytes(ir, seed=6, obj_bias=0.0))[0])
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(2, 160, 160, 3).astype(np.float32))
    ref = forward_features(ir, params, x)
    got = forward_features(ir, params, x, fused_runs=runs,
                           fused_interpret=True)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-3)


def test_f32_storage_matches(monkeypatch):
    """FFCNN_FUSED_STORE=f32 (dense-f32 boundary blobs) is numerically
    at least as close to XLA as the default storage."""
    ir = parse_cfg(REF_CFG, 320, 320)
    params = params_to_pytree(load_weights(
        ir, synth_weights_bytes(ir, seed=1, obj_bias=0.0))[0])
    run = [r for r in plan_runs(ir) if r.start == 61][0]
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 20, 20, 24).astype(np.float32) * 0.5)
    ref = apply_run(x, ir, params, run, interpret=True)
    monkeypatch.setenv("FFCNN_FUSED_STORE", "f32")
    got = apply_run(x, ir, params, run, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_cascade_matches_per_block(monkeypatch):
    """Halo-cascade launches (FFCNN_FUSED_CASCADE>1: several s1 blocks per
    pallas_call, boundary blobs VMEM-only) vs the per-block path on the
    flagship 20x20 run, interpret mode."""
    ir = parse_cfg(REF_CFG, 320, 320)
    params = params_to_pytree(load_weights(
        ir, synth_weights_bytes(ir, seed=7, obj_bias=0.0))[0])
    run = [r for r in plan_runs(ir) if r.start == 61][0]      # 4 blocks
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(2, 20, 20, 24).astype(np.float32) * 0.5)
    ref = apply_run(x, ir, params, run, interpret=True)
    for casc in ("2", "3", "4"):
        monkeypatch.setenv("FFCNN_FUSED_CASCADE", casc)
        got = apply_run(x, ir, params, run, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"cascade={casc}")
    monkeypatch.delenv("FFCNN_FUSED_CASCADE")


def test_cascade_region_whole_net(monkeypatch):
    """Cascade + regions + Pallas stem together: the maximal fused
    configuration still matches XLA end-to-end (interpret)."""
    monkeypatch.setenv("FFCNN_FUSED_DOWN", "1")
    monkeypatch.setenv("FFCNN_FUSED_CASCADE", "3")
    ir = parse_cfg(REF_CFG, 160, 160)        # test-sized interpret cost
    params = params_to_pytree(load_weights(
        ir, synth_weights_bytes(ir, seed=13, obj_bias=0.0))[0])
    runs = plan_runs(ir, min_channels=1)
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randint(0, 256, (2, 160, 160, 3)).astype(np.uint8))
    ref = forward_features(ir, params, x, input_dtype=jnp.float32)
    got = forward_features(ir, params, x, input_dtype=jnp.float32,
                           fused_runs=runs, conv0_pallas=True,
                           fused_interpret=True)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-3)


def test_fused_int8_interior_boundaries():
    """int8 storage INSIDE a fused run (VERDICT r3 #3): interior block
    boundaries the quant plan marks int8 are stored int8 in the fused
    layout — producing kernel requantizes, next kernel dequantizes —
    equal to per-block float runs with explicit requant between."""
    from ffcnn_tpu.kernels.block_fused import FusedRun
    from ffcnn_tpu.quant import build_plan

    ir = parse_cfg(REF_CFG, 320, 320)
    params = params_to_pytree(load_weights(
        ir, synth_weights_bytes(ir, seed=8, obj_bias=0.0))[0])
    run = [r for r in plan_runs(ir) if r.start == 61][0]      # 4 blocks
    absmax = np.full(len(ir.blobs), 3.0, np.float32)
    plan = build_plan(ir, params, absmax, min_channels=24)
    inner = [b.end + 1 for b in run.blocks[:-1]]
    assert all(plan.blob_is_int8(bi) for bi in inner), inner

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 20, 20, 24).astype(np.float32) * 0.5)
    got = apply_run(x, ir, params, run, interpret=True, quant=plan)

    cur = x
    for i, b in enumerate(run.blocks):
        cur = apply_run(cur, ir, params, FusedRun(b.start, b.end, (b,)),
                        interpret=True)
        if i < len(run.blocks) - 1:
            s = float(plan.blob_scale[b.end + 1])
            q = jnp.clip(jnp.round(cur * (1.0 / s)), -127, 127)
            cur = q * s
    # knife-edge rounding can flip a code by 1 (value diff = one scale
    # step); everything else must match to float noise
    diff = np.abs(np.asarray(got) - np.asarray(cur))
    assert diff.mean() < 1e-3
    assert diff.max() < 0.1, diff.max()


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
