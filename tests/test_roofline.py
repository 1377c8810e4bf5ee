"""Static HBM/MXU roofline model (roofline.py): hand-checked FLOP counts,
plan-aware traffic accounting, and the profiler/CLI integration."""

import os

import numpy as np
import pytest

from ffcnn_tpu import roofline
from ffcnn_tpu.darknet import parse_cfg

CFG = "/root/reference/yolo-fastest-1.1.cfg"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MICRO = os.path.join(REPO, "models", "ffcnn-micro.cfg")


@pytest.fixture(scope="module")
def ir():
    return parse_cfg(CFG, 320, 320)


def test_stored_bytes_tiling():
    # dense: no pad; padded: bf16 tiles channels to 16, f32 to 8, int8 to 32
    assert roofline.stored_bytes(10, 10, 8, 1, "bf16") == 10 * 10 * 8 * 2
    assert roofline.stored_bytes(10, 10, 8, 1, "bf16", padded=True) \
        == 10 * 10 * 16 * 2
    assert roofline.stored_bytes(10, 10, 8, 1, "f32", padded=True) \
        == 10 * 10 * 8 * 4
    assert roofline.stored_bytes(10, 10, 8, 1, "int8", padded=True) \
        == 10 * 10 * 32


def test_conv_flops_hand_check(ir):
    costs = roofline.layer_costs(ir, 1)
    # layer 0: 3x3 s2 conv 3->8 channels, 160x160 output (golden net_dump)
    assert costs[0].flops == 2 * 160 * 160 * 8 * 3 * 3 * 3
    # layer 2: depthwise 3x3 (groups=8, icg=1), 160x160x8 -> 160x160x8
    # -> VPU work (no contraction dim -> never on the MXU; r4 VPU term)
    assert costs[2].flops == 0
    assert costs[2].vpu_flops == 2 * 160 * 160 * 8 * 3 * 3 * 1
    assert costs[0].vpu_flops == 0
    # dropout moves nothing, computes nothing
    drop = next(i for i, l in enumerate(ir.layers)
                if l.type.name == "DROPOUT")
    assert costs[drop].bytes_total == 0 and costs[drop].flops == 0


def test_flops_scale_with_batch(ir):
    c1 = roofline.layer_costs(ir, 1)
    c8 = roofline.layer_costs(ir, 8)
    assert c8[0].flops == 8 * c1[0].flops
    assert c8[0].bytes_act == 8 * c1[0].bytes_act
    assert c8[0].bytes_w == c1[0].bytes_w          # weights read once


def test_fused_plan_moves_fewer_bytes(ir):
    from ffcnn_tpu.kernels.block_fused import plan_runs
    base = sum(c.bytes_total for c in roofline.layer_costs(ir, 256))
    runs = plan_runs(ir)
    fused = sum(c.bytes_total for c in
                roofline.layer_costs(ir, 256, fused_runs=runs))
    assert runs and fused < base
    regions = plan_runs(ir, min_channels=1, allow_down=True)
    regioned = sum(c.bytes_total for c in
                   roofline.layer_costs(ir, 256, fused_runs=regions))
    assert regioned < fused


def test_int8_blob_storage_reduces_bytes(ir):
    from ffcnn_tpu.quant import QuantPlan
    # blob 115 = SPP route output (10x10x192 at 320 input) — a materialized
    # boundary blob, written by route layer 114 and read by conv layer 115
    plan = QuantPlan(blob_scale={115: 1.0}, weights={}, min_channels=32)
    base = roofline.layer_costs(ir, 256)
    q = roofline.layer_costs(ir, 256, quant=plan)
    assert q[114].bytes_total < base[114].bytes_total    # writes int8
    assert q[115].bytes_total < base[115].bytes_total    # reads int8
    assert sum(c.bytes_total for c in q) < sum(c.bytes_total for c in base)


def test_floor_us_positive_and_bounded(ir):
    costs = roofline.layer_costs(ir, 256)
    total_floor = sum(c.floor_us() for c in costs)
    # dense floor for the whole net at batch 256 must be positive and
    # below an obviously-achievable bound (measured device is ~6.25 ms)
    assert 1_000 < total_floor < 20_000
    for c in costs:
        assert c.floor_us() >= max(c.hbm_floor_us(), c.mxu_floor_us()) - 1e-9


def test_stage_and_render(ir):
    costs = roofline.layer_costs(ir, 256)
    stages = roofline.stage_costs(ir, costs)
    assert stages[0].stage == (320, 320)           # sorted by area desc
    assert all(s.bytes_total > 0 for s in stages[:-1])
    text = roofline.render(ir, costs, 256)
    assert "TOTAL" in text and "320x320" in text
    # measured column appears when a profile is supplied
    text2 = roofline.render(ir, costs, 256,
                            measured_us={c.index: 1.0 for c in costs})
    assert "x floor" in text2


def test_region_floor_aggregates(ir):
    """A fused region's floor is the max of its SUMMED per-resource
    demands — strictly above the start layer's own floor (whose pairing
    with region-total measured time overstated 'x floor' ~50x in the r4
    on-chip profiles) and at least every resource's summed bound."""
    from ffcnn_tpu.kernels.block_fused import plan_runs
    runs = plan_runs(ir)
    costs = roofline.layer_costs(ir, 256, fused_runs=runs)
    s, e = runs[0].start, runs[0].end
    rf = roofline.region_floor_us(costs, s, e)
    assert rf > costs[s].floor_us()
    span = [c for c in costs if s <= c.index <= e]
    for demand, rate in ((sum(c.bytes_total for c in span),
                          roofline.HBM_GBPS_EFFECTIVE * 1e3),
                         (sum(c.flops for c in span),
                          roofline.MXU_TFLOPS_BF16 * 1e6),
                         (sum(c.vpu_flops for c in span),
                          roofline.VPU_TFLOPS_BF16 * 1e6)):
        assert rf >= demand / rate - 1e-9
    # single-layer "region" degenerates to that layer's dominant bound
    assert roofline.region_floor_us(costs, s, s) <= costs[s].floor_us() + 1e-9


def test_net_profile_attaches_floors():
    from ffcnn_tpu import Net
    from ffcnn_tpu.darknet.weights import load_weights, synth_weights_bytes
    ir = parse_cfg(MICRO)
    params, _ = load_weights(ir, synth_weights_bytes(ir, seed=7,
                                                     obj_bias=2.0))
    net = Net(ir, params, mode="parity")
    rep = net.profile_layers(iters=2)
    assert rep.floors_us and all(v >= 0 for v in rep.floors_us.values())
    assert "x floor" in rep.render()


def test_cli_roofline(capsys):
    from ffcnn_tpu import cli
    # fused plan modeled only at batches the pipeline would actually
    # trace fused runs for (batch % 128 == 0, kernels/block_fused.py)
    assert cli.main(["roofline", "--batch", "128"]) == 0
    out = capsys.readouterr().out
    assert "TOTAL" in out and "fused runs" in out
    assert cli.main(["roofline", "--batch", "8"]) == 0
    cap = capsys.readouterr()
    assert "TOTAL" in cap.out and "fused runs" not in cap.out
    assert "batch" in cap.err                 # the explanatory note
    assert cli.main(["roofline", "--batch", "8", "--no-fused",
                     "--dtype", "f32"]) == 0
    assert "TOTAL" in capsys.readouterr().out
