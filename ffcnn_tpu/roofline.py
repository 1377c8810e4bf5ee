"""Static HBM-traffic / FLOP roofline for a parsed net (VERDICT r3 #1's
"bytes-moved accounting per stage").

The reference ships a per-layer-type wall-clock profile (ffcnn.c:494-510);
on TPU the interesting question is not "where did the time go" alone but
"how close is each layer to the hardware floor".  This module computes,
from the IR alone (no device needed):

  * per-layer HBM bytes moved — activations with the REAL TPU sublane
    tiling pad per storage dtype (bf16 tiles channels to 16, f32 to 8,
    int8 to 32; the lane dim is spatial x batch here — always large, its
    padding ignored), plus the layer's weights;
  * per-layer MXU/VPU FLOPs (2 x MACs);
  * the implied time floors: bytes / effective-HBM-bandwidth and
    flops / MXU-peak — a layer's device time can't beat max(hbm, mxu);

and understands the execution plan: blobs interior to a fused Pallas run
(kernels/block_fused.py) never touch HBM (the run pays one read at its
input and one write at its output); inverted-residual blocks left to XLA
get its measured 1-deep conv input fusion (each block's first expand
intermediate is never materialized — docs/PERF_NOTES.md r2); blobs
covered by an int8 plan (quant.py) store 1 byte/channel.

FLOOR bytes are DENSE (no tiling pad): padding is a layout choice, not a
bound — XLA's own layouts avoid much of it, so a padded "floor" would
sit above measured times.  ``padded=True`` switches to the tiled storage
footprint of this repo's fused-kernel layouts, the right model for
diagnosing a fused plan's real traffic (tools/traffic_model.py).

Constants are for the TPU v5e this repo benches on: 819 GB/s HBM peak,
~665 GB/s measured effective through XLA (docs/PERF_NOTES.md "add1
calibration"), 197 bf16 TFLOP/s MXU peak.  Pass your own for other chips.

Used by ``Net.profile_layers`` (measured-vs-floor columns) and the
device-free ``ffcnn roofline`` CLI.
"""

from __future__ import annotations

import dataclasses
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

from .darknet.ir import LayerType, NetIR

HBM_GBPS_PEAK = 819.0
HBM_GBPS_EFFECTIVE = 665.0       # measured through XLA on this v5e
MXU_TFLOPS_BF16 = 197.0
MXU_TOPS_INT8 = 394.0
# Depthwise convs never touch the MXU (one input channel per output
# channel — nothing to contract); they run on the VPU.  Effective rate
# calibrated from the r4 on-chip per-layer profile (docs/PERF_NOTES.md):
# dw3x3 160x160x8 3.5 TF/s, dw5x5 20x20x120 2.9, dw3x3 s2 rows 1.7 —
# 3.5 is the best sustained, so it is the FLOOR rate (a floor must not
# sit above achievable); the r4 bisect's dw-only legs refine this.
# Without this term the small-spatial region kernels looked "55x off
# floor" when they are in fact VPU-bound (r4 20x20 stage at 2x HBM
# floor was the tell).
VPU_TFLOPS_BF16 = 3.5

_TILE_BYTES = {"bf16": (16, 2), "f32": (8, 4), "int8": (32, 1),
               "uint8": (32, 1)}


def stored_bytes(w: int, h: int, c: int, batch: int, dtype: str,
                 padded: bool = False) -> int:
    """HBM bytes one (batch, h, w, c) activation occupies in ``dtype`` —
    dense by default (the floor model); ``padded=True`` pads the channel
    (sublane) dim to the dtype's tile (the fused-kernel storage model)."""
    tile, bpe = _TILE_BYTES[dtype]
    if padded:
        c = -(-c // tile) * tile
    return w * h * c * bpe * batch


@dataclasses.dataclass
class LayerCost:
    index: int
    bytes_act: int                 # activation reads + writes
    bytes_w: int                   # weights read (per dispatch)
    flops: int                     # 2 x MACs on the MXU (dense convs)
    vpu_flops: int = 0             # 2 x MACs on the VPU (depthwise convs)

    @property
    def bytes_total(self) -> int:
        return self.bytes_act + self.bytes_w

    def hbm_floor_us(self, gbps: float = HBM_GBPS_EFFECTIVE) -> float:
        return self.bytes_total / gbps / 1e3

    def mxu_floor_us(self, tflops: float = MXU_TFLOPS_BF16) -> float:
        return self.flops / tflops / 1e6

    def vpu_floor_us(self, tflops: float = VPU_TFLOPS_BF16) -> float:
        return self.vpu_flops / tflops / 1e6

    def floor_us(self, gbps: float = HBM_GBPS_EFFECTIVE,
                 tflops: float = MXU_TFLOPS_BF16,
                 vpu_tflops: float = VPU_TFLOPS_BF16) -> float:
        """A layer cannot run faster than its slowest bound."""
        return max(self.hbm_floor_us(gbps), self.mxu_floor_us(tflops),
                   self.vpu_floor_us(vpu_tflops))


def _conv_flops(ir: NetIR, li: int, batch: int) -> int:
    l = ir.layers[li]
    ob = ir.blobs[li + 1]
    icg = ir.blobs[li].c // l.groups
    return 2 * batch * ob.w * ob.h * ob.c * l.fs * l.fs * icg


def layer_costs(ir: NetIR, batch: int, dtype: str = "bf16",
                fused_runs=None, quant=None,
                store_dtype: Optional[str] = None,
                padded: bool = False) -> List[LayerCost]:
    """Per-layer traffic/FLOP model for one batch dispatch.

    ``fused_runs``: FusedRun list (kernels/block_fused.plan_runs) — blobs
    interior to a run move nothing; the run's input read is attributed to
    its first layer and its output write to its last.  Inverted-residual
    blocks NOT inside a run get XLA's measured 1-deep conv input fusion
    (the block's expand intermediate never materializes).  ``quant``:
    QuantPlan — plan-covered blobs/weights store int8.  ``store_dtype``:
    dtype of fused-run BOUNDARY blobs (FFCNN_FUSED_STORE; defaults to
    ``dtype``).  ``padded``: tile-padded storage (plan diagnosis) instead
    of dense bytes (floors)."""
    store_dtype = store_dtype or dtype
    interior: Dict[int, object] = {}
    for r in (fused_runs or []):
        for li in range(r.start, r.end + 1):
            interior[li] = r
    # XLA TPU input-fuses ONE producer conv into a consumer conv (HLO-
    # verified, nesting depth capped at one — docs/PERF_NOTES.md "XLA TPU
    # conv fusion depth").  Model: greedy pairing along conv chains — a
    # conv inlines its producer conv when that producer is unpaired and
    # its output has exactly one reader; the intermediate blob never
    # materializes.  In pw/dw chains this elides every other intermediate
    # (the measured "stages sit at HALF their naive traffic").
    readers: Dict[int, int] = defaultdict(int)
    for li, l in enumerate(ir.layers):
        if l.type == LayerType.ROUTE:
            for d in l.depends:
                readers[d + 1] += 1
        elif l.type == LayerType.SHORTCUT:
            readers[li] += 1
            readers[l.depends[0] + 1] += 1
        else:                              # conv/pool/upsample/yolo/dropout
            readers[li] += 1
    xla_fused_away = set()                 # blob indices never materialized
    paired = set()
    for li, l in enumerate(ir.layers):
        if l.type != LayerType.CONV or li in interior:
            continue
        producer = li - 1
        if (producer >= 0 and ir.layers[producer].type == LayerType.CONV
                and producer not in interior
                and producer not in paired and li not in paired
                and readers[li] == 1):
            paired.update((producer, li))
            xla_fused_away.add(li)         # blob li = producer's output

    def blob_dtype(bi: int, at_run_edge: bool) -> str:
        if quant is not None and quant.blob_is_int8(bi):
            return "int8"
        if bi == 0:
            return "uint8"                 # raw pixels (folded preprocess)
        return store_dtype if at_run_edge else dtype

    def blob_bytes(bi: int, at_run_edge: bool = False) -> int:
        b = ir.blobs[bi]
        if b.c == 0 or bi in xla_fused_away:
            return 0
        return stored_bytes(b.w, b.h, b.c, batch,
                            blob_dtype(bi, at_run_edge), padded)

    def weight_bytes(li: int) -> int:
        l = ir.layers[li]
        if l.type != LayerType.CONV:
            return 0
        icg = ir.blobs[li].c // l.groups
        n = l.fs * l.fs * icg * l.fn
        if quant is not None and li in quant.weights:
            return n + 4 * l.fn * 2        # int8 + f32 scale/bias
        return n * (2 if dtype == "bf16" else 4) + 4 * l.fn * 2

    out: List[LayerCost] = []
    for li, l in enumerate(ir.layers):
        flops = vpu = 0
        if l.type == LayerType.CONV:
            f = _conv_flops(ir, li, batch)
            # depthwise (one input channel per output channel) has nothing
            # to contract — it runs on the VPU, not the MXU
            if l.groups > 1 and ir.blobs[li].c // l.groups == 1:
                vpu = f
            else:
                flops = f
        if li in interior:
            run = interior[li]
            acts = 0
            if li == run.start:
                acts += blob_bytes(run.start, at_run_edge=True)
            if li == run.end:
                acts += blob_bytes(run.end + 1, at_run_edge=True)
            out.append(LayerCost(li, acts, weight_bytes(li), flops, vpu))
            continue
        if l.type in (LayerType.YOLO, LayerType.YOLOV8):
            out.append(LayerCost(li, blob_bytes(li), 0, 0))
            continue
        if l.type == LayerType.DROPOUT:
            out.append(LayerCost(li, 0, 0, 0))    # inference no-op
            continue
        reads = blob_bytes(li)
        if l.type == LayerType.ROUTE:
            reads = sum(blob_bytes(d + 1) for d in l.depends)
        elif l.type == LayerType.SHORTCUT:
            reads += blob_bytes(l.depends[0] + 1)
        writes = blob_bytes(li + 1)
        out.append(LayerCost(li, reads + writes, weight_bytes(li),
                             flops, vpu))
    return out


def region_floor_us(costs: List[LayerCost], start: int, end: int,
                    gbps: float = HBM_GBPS_EFFECTIVE,
                    tflops: float = MXU_TFLOPS_BF16,
                    vpu_tflops: float = VPU_TFLOPS_BF16) -> float:
    """Floor for a fused region [start, end]: the region runs as ONE
    program, so its bound is max over resources of the SUMMED demand —
    not the start layer's floor alone (the profiler attributes the whole
    region's device time to its start-layer scope; pairing that with a
    single-layer floor overstated "x floor" ~50x, docs/ONCHIP_R4.md), and
    not the sum of per-layer max-floors either (layers may overlap
    resources inside one program)."""
    span = [c for c in costs if start <= c.index <= end]
    return max(sum(c.bytes_total for c in span) / gbps / 1e3,
               sum(c.flops for c in span) / tflops / 1e6,
               sum(c.vpu_flops for c in span) / vpu_tflops / 1e6)


def _stage_of(ir: NetIR, li: int) -> Tuple[int, int]:
    """Resolution stage of layer ``li`` = its input blob's spatial dims;
    a layer sitting right after a YOLO layer reads a zero-dim alias blob
    (yolo produces no tensor), so fall back to its output dims."""
    b = ir.blobs[li]
    if b.w == 0 and li + 1 < len(ir.blobs):
        b = ir.blobs[li + 1]
    return (b.w, b.h)


@dataclasses.dataclass
class StageCost:
    stage: Tuple[int, int]         # (w, h) of the layers' input blobs
    bytes_total: int
    flops: int
    floor_us: float


def stage_costs(ir: NetIR, costs: List[LayerCost],
                gbps: float = HBM_GBPS_EFFECTIVE,
                tflops: float = MXU_TFLOPS_BF16) -> List[StageCost]:
    """Group layer costs by input spatial dims (the net's resolution
    stages) — the unit PERF_NOTES' measured device times use."""
    by_stage: Dict[Tuple[int, int], List[LayerCost]] = defaultdict(list)
    for c in costs:
        by_stage[_stage_of(ir, c.index)].append(c)
    out = []
    for st in sorted(by_stage, key=lambda s: -s[0] * s[1]):
        cs = by_stage[st]
        out.append(StageCost(
            st, sum(c.bytes_total for c in cs),
            sum(c.flops + c.vpu_flops for c in cs),
            max(sum(c.hbm_floor_us(gbps) for c in cs),
                sum(c.mxu_floor_us(tflops) for c in cs),
                sum(c.vpu_floor_us() for c in cs))))
    return out


def render(ir: NetIR, costs: List[LayerCost], batch: int,
           measured_us: Optional[Dict[int, float]] = None,
           gbps: float = HBM_GBPS_EFFECTIVE,
           tflops: float = MXU_TFLOPS_BF16) -> str:
    """Stage table (+ optional measured-vs-floor when a device profile is
    supplied): bytes moved, FLOPs, floor, and how far above the floor the
    measured time sits."""
    lines = ["roofline (batch %d, %.0f GB/s effective HBM, %.0f bf16 "
             "MXU TFLOP/s, %.1f VPU TFLOP/s for depthwise):"
             % (batch, gbps, tflops, VPU_TFLOPS_BF16)]
    hdr = "%10s %10s %9s %9s" % ("stage", "MB moved", "GFLOP", "floor us")
    if measured_us:
        hdr += " %11s %8s" % ("measured us", "x floor")
    lines.append(hdr)
    meas_by_stage: Dict[Tuple[int, int], float] = defaultdict(float)
    if measured_us:
        for c in costs:
            meas_by_stage[_stage_of(ir, c.index)] += \
                measured_us.get(c.index, 0.0)
    tot_b = tot_f = tot_floor = tot_m = 0.0
    for sc in stage_costs(ir, costs, gbps, tflops):
        row = "%4dx%-5d %10.1f %9.1f %9.1f" % (
            sc.stage[0], sc.stage[1], sc.bytes_total / 1e6,
            sc.flops / 1e9, sc.floor_us)
        if measured_us:
            m = meas_by_stage.get(sc.stage, 0.0)
            row += " %11.1f %8s" % (
                m, ("%.2f" % (m / sc.floor_us)) if sc.floor_us > 0 else "-")
            tot_m += m
        lines.append(row)
        tot_b += sc.bytes_total
        tot_f += sc.flops
        tot_floor += sc.floor_us
    row = "%10s %10.1f %9.1f %9.1f" % ("TOTAL", tot_b / 1e6, tot_f / 1e9,
                                       tot_floor)
    if measured_us:
        row += " %11.1f %8s" % (
            tot_m, ("%.2f" % (tot_m / tot_floor)) if tot_floor > 0 else "-")
    lines.append(row)
    return "\n".join(lines) + "\n"
