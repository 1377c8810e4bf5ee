"""ffcnn-shaped public API: ``Net.load(cfg, weights)`` → ``net.detect(image)``.

Mirrors the five-function C API (ffcnn.h:48-52) on top of the TPU pipeline:

    net_load    → Net.load            (parse cfg, fold BN, params to device)
    net_input   → fused into detect   (on-device letterbox, ffcnn.c:259-289)
    net_forward → fused into detect   (one jitted pixels-to-boxes program)
    net_dump    → Net.dump            (byte-identical layer table)
    net_free    → garbage collection

Where the reference runs one image through 131 sequential C calls, detect()
traces the whole graph — preprocess, conv stack, YOLO decode, NMS — into a
single XLA program per (batch, image-size) bucket and runs it batched.

Modes:
  * ``parity``: float32 with HIGHEST conv precision — detections match the C
    reference within float tolerance; used by tests and parity checks.
  * ``fast``: bfloat16 activations/weights with float32 MXU accumulation —
    the production path.
"""

from __future__ import annotations

import os
import time
import typing
from typing import Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .darknet import cfg as cfg_mod
from .darknet import weights as weights_mod
from .darknet.ir import LayerType, NetIR
from .graph.build import (fold_input_transform, forward_features,
                          params_to_pytree)
from .ops.nms import NMSResult, nms
from .ops.preprocess import letterbox, letterbox_params, letterbox_uint8
from .ops.yolo import (apply_arena_cap, arena_capacity, concat_heads,
                       decode_head)

# Demo defaults (ffcnn.c:556-557)
DEFAULT_MEAN = (0.0, 0.0, 0.0)
DEFAULT_NORM = (1 / 255.0, 1 / 255.0, 1 / 255.0)
NMS_THRESHOLD = 0.5          # hardcoded in the reference (ffcnn.c:519)

# Env flags read at TRACE time (here or in ops/kernels).  Their current
# RESOLVED values (env > tuned-defaults file > code default; tuning.py)
# are part of the pipeline cache key, so flipping one mid-process
# compiles a fresh bucket and actually takes effect — instead of silently
# A/B-ing a pipeline against itself (ADVICE r2).  FFCNN_FUSED_MINC is
# consumed at Net construction (plan_runs) and so needs a new Net anyway.
_TRACE_ENV_FLAGS = ("FFCNN_FUSED", "FFCNN_FUSED_HEADS", "FFCNN_FUSED_MEGA",
                    "FFCNN_FUSED_DOTMODE", "FFCNN_FUSED_INTERPRET",
                    "FFCNN_FUSED_STORE", "FFCNN_FUSED_CASCADE",
                    "FFCNN_CONV0_INT8",
                    "FFCNN_CONV0_PALLAS", "FFCNN_PLANAR_HEADS",
                    "FFCNN_HEAD_F32", "FFCNN_F32_STAGES",
                    "FFCNN_TOPK_IMPL", "FFCNN_DECODE_IMPL",
                    "FFCNN_ARGMAX", "FFCNN_NMS_IMPL", "FFCNN_V8_NMS_IOU")


def _planarize_heads(ir: NetIR, params: Dict, quant):
    """Permute each yolo head conv's output channels into the planar
    field-major order (ops.yolo.head_planar_permutation) so decode reads
    contiguous channel slices.  Bit-exact relabeling (each channel is
    computed identically); applied per-head only when safe: the conv is
    dense, its output feeds ONLY the yolo layer, and no int8 plan entry
    covers it.  Returns (params', {yolo_layer_index: planar?})."""
    from .ops.yolo import head_planar_permutation
    referenced = set()
    for l in ir.layers:
        if l.type in (LayerType.ROUTE, LayerType.SHORTCUT):
            referenced.update(d + 1 for d in l.depends)
    out = dict(params)
    flags: Dict[int, bool] = {}
    for yli, l in enumerate(ir.layers):
        if l.type != LayerType.YOLO:
            continue
        li = yli - 1
        conv = ir.layers[li] if li >= 0 else None
        ok = (conv is not None and conv.type == LayerType.CONV
              and conv.groups == 1
              and conv.fn == 3 * (5 + l.class_num)
              and yli not in referenced
              and (quant is None or (li not in quant.weights
                                     and not quant.blob_is_int8(yli))))
        flags[yli] = ok
        if not ok:
            continue
        perm = head_planar_permutation(l.class_num)
        p = out[li]
        w, s, b = (p["weights"], p["scale"], p["bias"]) \
            if isinstance(p, dict) else (p.weights, p.scale, p.bias)
        out[li] = {"weights": jnp.asarray(w)[..., perm],
                   "scale": jnp.asarray(s)[perm],
                   "bias": jnp.asarray(b)[perm]}
    return out, flags


def stream_detections(detect_async, batches, depth: int = 2):
    """Generic pipelined-dispatch driver: keep up to ``depth`` batches in
    flight through any ``detect_async``-shaped callable (one uint8
    (N, H, W, 3) batch -> zero-arg completion callable).  Shared by
    Net.detect_stream, DPNet.detect_stream, and ArtifactNet.detect_stream
    so all three front-ends overlap host IO with device compute the same
    way (see Net.detect_stream for the full rationale)."""
    # validate eagerly (this wrapper runs at CALL time; the generator
    # body below only runs on first iteration)
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")

    def gen():
        from collections import deque
        inflight: deque = deque()           # completion callables
        for batch in batches:
            batch = np.asarray(batch)
            if batch.ndim != 4 or batch.shape[-1] != 3:
                raise ValueError(f"expected (N, H, W, 3) uint8 "
                                 f"batches, got {batch.shape}")
            # detect_async starts the host->HBM copy and enqueues the
            # compute — both asynchronous, so the loop immediately
            # proceeds to either the next batch or the oldest result.
            inflight.append(detect_async(batch))
            if len(inflight) >= depth:
                yield inflight.popleft()()
        while inflight:
            yield inflight.popleft()()
    return gen()


class Detection(typing.NamedTuple):
    """One detection in original-image pixel coords (reference BBOX,
    ffcnn.h:29-32).  NamedTuple, not dataclass: construction cost sits on
    the host decode path of every detect() (thousands per batch), and
    NamedTuple builds ~10x faster at the same attribute API."""
    score: float
    class_id: int
    x1: float
    y1: float
    x2: float
    y2: float


class Net:
    def __init__(self, ir: NetIR, params: Dict, *, mode: str = "fast",
                 topk: int = 128):
        if mode not in ("fast", "parity", "int8"):
            raise ValueError(
                f"mode must be 'fast', 'parity' or 'int8', got {mode!r}")
        self.ir = ir
        self.mode = mode
        self.topk = topk
        self.params = params_to_pytree(params)
        self._pipelines: Dict[tuple, object] = {}
        self._forwards: Dict[tuple, object] = {}
        self.timeused: Dict[str, float] = {}
        self.quant = None          # QuantPlan once calibrate() ran (int8 mode)
        # Fused inverted-residual runs (Pallas, kernels/block_fused.py):
        # traced in when the batch is lane-tile aligned on TPU; parity mode
        # keeps the pure-XLA path for bit parity with the C reference.
        if mode in ("fast", "int8"):
            from .kernels.block_fused import plan_runs
            self._fused_runs = plan_runs(ir)
        else:
            self._fused_runs = []
        # Fused head chains (kernels/head_fused.py): float modes only —
        # an int8 plan may assign chain-interior blobs int8 storage, which
        # fusing would silently skip.
        if mode == "fast":
            from .kernels.head_fused import plan_head_runs
            self._head_runs = plan_head_runs(ir)
        else:
            self._head_runs = []
        if mode == "parity":
            self._dtype = jnp.float32
            # FFCNN_PARITY_PRECISION (consumed at Net construction, like
            # FFCNN_FUSED_MINC): 'highest' (default; f32 convs via the
            # MXU's 6-pass bf16 emulation — print-precision exact vs the
            # C reference) or 'high' (3-pass — drops the lo*lo term,
            # ~2e-5 relative conv error; candidate ~2x parity-mode conv
            # speedup IF the golden + wide-tier device gates stay exact;
            # r5 A/B, docs/PERF_NOTES.md).
            from .tuning import get_flag
            p = get_flag("FFCNN_PARITY_PRECISION", "highest").lower()
            self._precision = (jax.lax.Precision.HIGH if p == "high"
                               else jax.lax.Precision.HIGHEST)
        else:
            self._dtype = jnp.bfloat16
            self._precision = None

    # ------------------------------------------------------------------ load
    @classmethod
    def load(cls, cfg_path: str, weights_path: Optional[str] = None,
             input_w: int = 0, input_h: int = 0, *, mode: str = "fast",
             topk: int = 128, allow_missing_weights: bool = False,
             cache_dir: Optional[str] = None) -> "Net":
        """Parse cfg + weights.  ``input_w/h`` override the [net] dims with
        ALIGN(dim, 32) exactly like net_load (ffcnn.c:133-134).
        ``cache_dir`` enables the folded-params npz cache (darknet/cache.py),
        keyed by the cfg+weights content hash."""
        ir = cfg_mod.parse_cfg(cfg_path, input_w, input_h)
        if weights_path is None:
            if not allow_missing_weights:
                raise ValueError("weights_path required "
                                 "(or pass allow_missing_weights=True)")
            params = weights_mod.zero_weights(ir)
        elif cache_dir is not None:
            from .darknet.cache import load_or_build
            params, _ = load_or_build(ir, cfg_path, weights_path, cache_dir)
        else:
            params, _ = weights_mod.load_weights(ir, weights_path)
        return cls(ir, params, mode=mode, topk=topk)

    # ------------------------------------------------------------ observability
    def dump(self) -> str:
        """net_dump-compatible layer table (ffcnn.c:522-548)."""
        return cfg_mod.dump(self.ir)

    def profile(self, per_type: bool = False, batch=None) -> str:
        """net_profile-style report (ffcnn.c:550).

        Default: cumulative host wall ms per API bucket across detect()
        calls (cheap, always available — but through the axon tunnel wall
        time includes dispatch/RTT).  ``per_type=True`` additionally runs a
        short profiled burst and renders the per-layer-TYPE device-time
        table the C ``net_profile`` prints — that is the trustworthy
        number; see also :meth:`profile_layers` for per-layer rows."""
        lines = [f"{k:>12s}: {v * 1000:8.1f} ms" for k, v in
                 self.timeused.items()]
        out = "\n".join(lines) + ("\n" if lines else "")
        if per_type:
            out += self.profile_layers(batch=batch).render(per_layer=False)
        return out

    def warmup(self, image_sizes=None, batch_sizes=(1,),
               topk_ladder: bool = False) -> None:
        """Precompile pipeline buckets for the given (H, W) image sizes and
        batch sizes (serving cold-start control; combine with
        enable_compile_cache() to persist across processes).  Defaults to
        the model's own input size.

        ``topk_ladder=True`` additionally precompiles every K bucket the
        parity-mode saturation retry can reach (topk*4^i up to the model
        max): a crowded-scene burst then retries against warm programs
        instead of stalling 40-140 s per new K (docs/DEPLOY.md caveat)."""
        if self.mode == "int8" and self.quant is None:
            raise RuntimeError(
                "int8 mode: call calibrate(images) with representative "
                "frames before warmup() — calibrating on the zero probe "
                "images would produce garbage activation scales")
        net_w, net_h = self.ir.blobs[0].w, self.ir.blobs[0].h
        max_k = self._max_candidates()
        ks = [None]
        if topk_ladder:
            k = min(self.topk, max_k)
            while k < max_k:
                k = min(max_k, k * 4)
                ks.append(k)
        for (h, w) in (image_sizes or [(net_h, net_w)]):
            for n in batch_sizes:
                for k in ks:
                    res = self.detect_device(
                        np.zeros((n, h, w, 3), np.uint8), topk=k)
                    jax.block_until_ready(res)

    def roofline_costs(self, batch_size: int):
        """Static per-layer HBM-bytes/FLOP costs (roofline.py) for THIS
        net's execution plan at ``batch_size`` — fused Pallas runs and the
        int8 plan included exactly when the pipeline would trace them."""
        from . import roofline
        from .kernels.block_fused import runs_usable
        from .tuning import get_flag
        from .kernels.head_fused import head_runs_usable
        interp = os.environ.get("FFCNN_FUSED_INTERPRET", "0") == "1"
        runs = list(self._fused_runs) if (self._fused_runs and
                                          (interp or
                                           runs_usable(batch_size))) \
            else []
        # FFCNN_HEAD_F32 supersedes the head runs in the traced pipeline
        # (net.py _build_pipeline sets hruns=None) — mirror that here or
        # the floors model fused-head traffic for regions that never run.
        head_f32 = (self.mode != "parity"
                    and get_flag("FFCNN_HEAD_F32", "0") == "1")
        if self._head_runs and head_runs_usable(batch_size) and not head_f32:
            runs += list(self._head_runs)   # same start/end traffic shape
        # mirror _build_pipeline: a forced f32 stage (FFCNN_F32_STAGES)
        # drops every fused run overlapping it
        stages = get_flag("FFCNN_F32_STAGES", "") \
            if self.mode != "parity" else ""
        if stages:
            from .graph.build import stage_layer_set
            sset = stage_layer_set(self.ir, stages)
            runs = [r for r in runs
                    if not any(li in sset
                               for li in range(r.start, r.end + 1))]
        store = get_flag("FFCNN_FUSED_STORE", "")
        # run_blocks_cs implements only the 'f32' boundary-storage
        # override (anything else stores the input dtype); modeling
        # unimplemented values would overstate headroom in the
        # measured-vs-floor columns.
        return roofline.layer_costs(
            self.ir, batch_size,
            dtype="f32" if self.mode == "parity" else "bf16",
            fused_runs=runs or None, quant=self.quant,
            store_dtype=store if store == "f32" else None)

    def profile_layers(self, batch=None, iters: int = 10):
        """Hardware per-layer profile (profiling.py): runs ``iters`` jitted
        steps under jax.profiler and attributes device time to layers via
        their named scopes.  Returns a ProfileReport (use .render()) with
        static roofline floors attached — each layer row shows how far its
        measured device time sits above its HBM/MXU bound."""
        from .profiling import profile_layers as _pl
        from .kernels.block_fused import runs_usable
        from .kernels.head_fused import head_runs_usable
        if batch is None:
            net_w, net_h = self.ir.blobs[0].w, self.ir.blobs[0].h
            batch = np.zeros((8, net_h, net_w, 3), np.uint8)
        batch = jnp.asarray(batch)
        from .tuning import get_flag
        runs = []
        if self._fused_runs and runs_usable(batch.shape[0]):
            runs += [(r.start, r.end) for r in self._fused_runs]
        # mirror _build_pipeline: FFCNN_HEAD_F32 supersedes the head runs,
        # so their rows must not be labeled as fused regions here.
        head_f32 = (self.mode != "parity"
                    and get_flag("FFCNN_HEAD_F32", "0") == "1")
        if self._head_runs and head_runs_usable(batch.shape[0]) \
                and not head_f32:
            runs += [(r.start, r.end) for r in self._head_runs]
        rep = _pl(lambda: self.detect_device(batch), self.ir, iters,
                  runs=runs or None)
        costs = self.roofline_costs(batch.shape[0])
        rep.floors_us = {c.index: c.floor_us() for c in costs}
        # A fused region's measured time all lands on its start-layer row;
        # give that row the REGION floor (max of summed HBM/MXU/VPU
        # demands, roofline.region_floor_us) so its "x floor" is honest.
        from .roofline import region_floor_us
        for s, e in runs:
            rep.floors_us[s] = region_floor_us(costs, s, e)
        return rep

    # ------------------------------------------------------------- pipelines
    def _head_layers(self):
        return [l for l in self.ir.layers
                if l.type in (LayerType.YOLO, LayerType.YOLOV8)]

    def _has_v8_heads(self) -> bool:
        return any(l.type == LayerType.YOLOV8 for l in self.ir.layers)

    def _can_fold_input(self) -> bool:
        first = self.ir.layers[0]
        return (self.mode in ("fast", "int8") and first.type == LayerType.CONV
                and first.groups == 1)

    # ------------------------------------------------------------- int8 mode
    def calibrate(self, images, mean=None, norm=None,
                  min_channels: int = 32,
                  percentile: Optional[float] = None) -> None:
        """int8 mode: collect per-blob activation ranges from ``images``
        (uint8 BGR, (N, H, W, 3) at the net input size or any letterboxable
        size) and build the quantization plan (quant.py).  Compiled
        pipelines are invalidated; the next detect() traces the int8 graph.

        The reference has no quantized path; the accuracy contract here is
        the fast-mode one — same objects as the float pipeline, boxes within
        tolerance (tests/test_int8.py, bench.py int8 gate)."""
        if self.mode != "int8":
            raise ValueError("calibrate() applies to mode='int8'")
        from .quant import calibrate as _calib
        # A/B knob: FFCNN_INT8_MINC sweeps the blob-channel gate without
        # code changes (24 puts the fused runs' interior boundaries in
        # int8 — kernels/block_fused.py run_blocks_cs; 32 is the r2
        # accuracy/perf sweet spot on the XLA path).
        from .tuning import get_flag
        min_channels = int(get_flag("FFCNN_INT8_MINC", str(min_channels)))
        # FFCNN_INT8_PERCH=1: per-channel activation scales (quant.py) —
        # the accuracy lever the r4 attribution sweep pointed at (the
        # per-tensor absmax wastes codes on small-range channels).
        per_channel = get_flag("FFCNN_INT8_PERCH", "0") == "1"
        if per_channel and percentile is not None:
            # keep the contract quant.collect_blob_absmax enforces — an
            # explicitly requested clip must not be silently ignored
            raise ValueError("percentile clip is per-tensor only "
                             "(incompatible with FFCNN_INT8_PERCH=1)")
        # FFCNN_INT8_PCT: activation-range percentile clip (e.g. 99.9);
        # empty/unset = exact absmax (quant.collect_blob_absmax).  When
        # BOTH env knobs are set (flag sweeps), per-channel wins and the
        # env percentile is dropped — only an explicit argument raises.
        if percentile is None and not per_channel:
            pct = get_flag("FFCNN_INT8_PCT", "")
            percentile = float(pct) if pct else None
        # Fused Pallas runs compose cleanly with the plan: run boundary
        # blobs keep their planned storage (the graph builder requantizes
        # the run output), and the runs' interior blobs simply never
        # materialize — their plan entries go unused when fusion is active.
        self.quant = _calib(self.ir, self.params, images,
                            mean=tuple(mean or DEFAULT_MEAN),
                            norm=tuple(norm or DEFAULT_NORM),
                            min_channels=min_channels,
                            percentile=percentile,
                            per_channel=per_channel)
        self._pipelines.clear()
        self._forwards.clear()

    def set_quant_plan(self, plan) -> None:
        """Install a previously saved calibration (quant.load_plan) —
        serving restarts reuse calibration instead of re-running it."""
        if self.mode != "int8":
            raise ValueError("set_quant_plan() applies to mode='int8'")
        self.quant = plan
        self._pipelines.clear()
        self._forwards.clear()

    def _max_candidates(self) -> int:
        """Most head candidates the model can emit at its input size: the
        head grids' total (3 anchors/cell for darknet heads, 1 for the
        anchor-free v8 head), clamped by the reference's bbox arena
        capacity (ffcnn.c:243; apply_arena_cap zeroes everything past it,
        so a larger top-k could never fill).  The arena quirk belongs to
        the reference's graph format — pure-v8 graphs skip it."""
        total = sum(self.ir.blobs[li].w * self.ir.blobs[li].h
                    * (3 if l.type == LayerType.YOLO else 1)
                    for li, l in enumerate(self.ir.layers)
                    if l.type in (LayerType.YOLO, LayerType.YOLOV8))
        if not any(l.type == LayerType.YOLO for l in self.ir.layers):
            return total
        return min(total,
                   arena_capacity(self.ir.blobs[0].w, self.ir.blobs[0].h,
                                  self.ir.blobs[0].c))

    def _build_pipeline(self, img_h: int, img_w: int, folded: bool,
                        topk: Optional[int], mean, norm):
        """Whole pixels-to-boxes program for one original-image size.

        ``folded``: normalize/BGR-swap live in conv-1's weights
        (fold_input_transform) and preprocess is a uint8 resize+pad — the
        fast path for the demo-default mean=0 (exact only then, see
        fold_input_transform).  Otherwise the full float letterbox runs.

        ``mean``/``norm`` are baked in as trace-time constants (each
        distinct value is its own pipeline bucket, like image sizes): as
        runtime arguments they cost two f32[3] device copies plus a conv-1
        weight re-fold on EVERY dispatch (~70 us/step device, measured) for
        values that change as often as the cfg file does — i.e. never.  The
        C reference likewise fixes MEAN/NORM at build time (ffcnn.c:556-557).
        """
        ir = self.ir
        net_w, net_h = ir.blobs[0].w, ir.blobs[0].h
        _, _, s1, s2 = letterbox_params(img_w, img_h, net_w, net_h)
        heads_meta = self._head_layers()
        dtype, precision = self._dtype, self._precision
        topk = self.topk if topk is None else topk
        mean = tuple(float(v) for v in np.asarray(mean).reshape(3))
        norm = tuple(float(v) for v in np.asarray(norm).reshape(3))

        quant = self.quant
        fused_runs = self._fused_runs
        head_runs = self._head_runs
        net_params = self.params

        # self.params is captured as a trace-time CONSTANT, not an argument:
        # the weights are baked into the executable (1.4 MB), so each
        # dispatch ships 1 buffer handle instead of ~400 (131 layers x 3
        # leaves) — dispatch overhead through the axon tunnel was ~20% of
        # wall time per batch.  A new Net compiles new programs anyway.
        def pipeline(bgr):
            from .kernels.block_fused import runs_usable
            from .kernels.head_fused import head_runs_usable
            # FFCNN_FUSED_INTERPRET=1 traces the fused Pallas kernels in
            # interpret mode regardless of backend/batch — CPU-mesh tests
            # pin the sharded pipeline to the SAME fused graph one chip runs.
            interp = os.environ.get("FFCNN_FUSED_INTERPRET", "0") == "1"
            runs = fused_runs if (fused_runs
                                  and (interp or runs_usable(bgr.shape[0]))) \
                else None
            hruns = head_runs if (head_runs
                                  and head_runs_usable(bgr.shape[0])) \
                else None
            params = net_params
            if folded:
                params = fold_input_transform(ir, params, mean, norm)
                x = letterbox_uint8(bgr, net_w, net_h)
            else:
                x = letterbox(bgr, net_w, net_h, jnp.asarray(mean),
                              jnp.asarray(norm), dtype=dtype)
            # conv-1 straight off the uint8 pixels on the int8 MXU —
            # measured SLOWER on v5e (926 vs 593 us device: the C=3 s8
            # conv lowers worse than the float one), so default OFF; the
            # exact-shift algebra is kept tested for when the backend's
            # int8 small-C convs improve (docs/PERF_NOTES.md).
            from .tuning import get_flag
            c0q = folded and get_flag("FFCNN_CONV0_INT8", "0") == "1"
            # Pallas stem + fused-layout handoff into a region run starting
            # at layer 1 (kernels/conv0_fused.py); needs the region planner
            # (FFCNN_FUSED_DOWN=1, MINC<=8) to have produced that run.
            c0p = folded and get_flag("FFCNN_CONV0_PALLAS", "0") == "1"
            # Planar head layout (fast/int8): head conv channels permuted
            # field-major at trace time so decode reads contiguous slices
            # (bit-exact; _planarize_heads).  Measured a device-time WASH
            # on v5e (5.691 vs 5.689 ms/batch-256): the 10x10 head's
            # decode cost is tiny-spatial tiling, not the channel gathers
            # — so default OFF; kept tested (FFCNN_PLANAR_HEADS=1).
            pflags = {}
            if self.mode != "parity" and \
                    os.environ.get("FFCNN_PLANAR_HEADS", "0") == "1":
                params, pflags = _planarize_heads(ir, params, quant)
            # FFCNN_HEAD_F32: run the linear conv chains feeding each yolo
            # head in f32 (head_chain_layers) — recovers the bf16 conf-
            # threshold knife-edge boxes the wide corpus exposed.  The
            # chains are ~1% of traffic.  Float modes only (parity already
            # IS f32; int8-planned chain layers take the int8 path and
            # ignore it); supersedes head_runs (bf16 Pallas) when set.
            f32set = None
            if self.mode != "parity" and \
                    get_flag("FFCNN_HEAD_F32", "0") == "1":
                from .graph.build import head_chain_layers
                f32set = head_chain_layers(ir)
                hruns = None
            # FFCNN_F32_STAGES="20" (comma list of stage widths): force
            # every conv/shortcut whose OUTPUT blob has that spatial width
            # to compute AND store f32, casting back to bf16 at the stage
            # exit — the per-stage bf16-drift bisection (VERDICT r4 #2;
            # tools/bisect_f32stage.py).  Composes with FFCNN_HEAD_F32
            # (union).  Fused Pallas runs overlapping a forced stage are
            # dropped for this pipeline: they compute in bf16 internally
            # and would silently bypass the forcing.
            stages = get_flag("FFCNN_F32_STAGES", "") \
                if self.mode != "parity" else ""
            if stages:
                from .graph.build import stage_layer_set
                sset = stage_layer_set(ir, stages)
                f32set = frozenset(sset | set(f32set or ()))
                runs = [r for r in (runs or [])
                        if not any(li in f32set
                                   for li in range(r.start, r.end + 1))] \
                    or None
                hruns = [r for r in (hruns or [])
                         if not any(li in f32set
                                    for li in range(r.start, r.end + 1))] \
                    or None
            feats = forward_features(ir, params, x, precision=precision,
                                     input_dtype=dtype, quant=quant,
                                     fused_runs=runs, head_runs=hruns,
                                     conv0_int8=c0q, conv0_pallas=c0p,
                                     fused_interpret=interp,
                                     f32_layers=f32set)
            from .ops.yolo import decode_head_v8
            yolo_lis = [yli for yli, l in enumerate(ir.layers)
                        if l.type in (LayerType.YOLO, LayerType.YOLOV8)]
            decoded = concat_heads([
                decode_head_v8(f, l, net_w, net_h)
                if l.type == LayerType.YOLOV8 else
                decode_head(f, l, net_w, net_h,
                            planar=pflags.get(yli, False))
                for f, l, yli in zip(feats, heads_meta, yolo_lis)])
            if any(l.type == LayerType.YOLO for l in heads_meta):
                # bbox-arena overflow is a reference-graph quirk
                # (ffcnn.c:242-244); anchor-free graphs have no arena
                decoded = apply_arena_cap(
                    decoded, arena_capacity(net_w, net_h, ir.blobs[0].c))
                nms_thr, nms_kind = NMS_THRESHOLD, "min"
            else:
                # pure-v8 graph: standard union-IoU, public default 0.7
                from .ops.nms import v8_nms_threshold
                nms_thr = v8_nms_threshold()
                nms_kind = "union"
            return nms(decoded.boxes, decoded.scores, decoded.classes,
                       k=topk, threshold=nms_thr,
                       scale1=s1, scale2=s2, iou_kind=nms_kind)

        return jax.jit(pipeline)

    def _pipeline_for(self, img_h: int, img_w: int, mean, norm,
                      topk: Optional[int] = None):
        mean_t = tuple(float(v) for v in np.asarray(mean).reshape(3))
        norm_t = tuple(float(v) for v in np.asarray(norm).reshape(3))
        folded = self._can_fold_input() and mean_t == DEFAULT_MEAN
        from .tuning import get_flag
        key = (img_h, img_w, folded, topk or self.topk, mean_t, norm_t,
               tuple(get_flag(k, "") for k in _TRACE_ENV_FLAGS))
        fn = self._pipelines.get(key)
        if fn is None:
            fn = self._build_pipeline(img_h, img_w, folded, topk,
                                      mean_t, norm_t)
            self._pipelines[key] = fn
        return fn

    # ----------------------------------------------------------------- detect
    def detect(self, images, mean=DEFAULT_MEAN, norm=DEFAULT_NORM,
               ) -> Union[List[Detection], List[List[Detection]]]:
        """Run detection.  ``images``: one (H, W, 3) uint8 BGR array or a
        batch (N, H, W, 3) / sequence of same-sized arrays.  Returns a
        Detection list (single image) or list of lists (batch)."""
        single = isinstance(images, np.ndarray) and images.ndim == 3
        batch = np.asarray(images)[None] if single else np.asarray(images)
        if batch.ndim != 4 or batch.shape[-1] != 3:
            raise ValueError(f"expected (N, H, W, 3) uint8, got {batch.shape}")
        res = self.detect_device(batch, mean, norm)
        out = self._finish(res, batch, mean, norm)
        return out[0] if single else out

    def _finish(self, res: NMSResult, batch, mean, norm) -> List[List[Detection]]:
        """Resolve one dispatched result to Detection lists, handling
        dense-scene saturation: if any frame had more above-threshold
        candidates than topk, the top-k pass truncated BEFORE suppression
        and the result can diverge from the reference's (effectively
        unbounded, ffcnn.c:243) NMS.  In parity mode grow K and retry
        until the census fits; in fast mode warn — production callers
        watching throughput can raise ``topk`` or read res.saturated."""
        max_k = self._max_candidates()
        k = min(self.topk, max_k)
        while bool(np.asarray(res.saturated).any()) and k < max_k:
            k = min(max_k, k * 4)
            if self.mode != "parity":
                import warnings
                warnings.warn(
                    f"NMS top-k saturated (k={self.topk}); some candidates "
                    f"were dropped pre-suppression. Raise topk (model max "
                    f"{max_k}) for crowded scenes.", RuntimeWarning,
                    stacklevel=3)
                break
            res = self.detect_device(batch, mean, norm, topk=k)
        return self._to_detections(res)

    def detect_async(self, batch, mean=DEFAULT_MEAN, norm=DEFAULT_NORM):
        """Dispatch one uint8 (N, H, W, 3) batch WITHOUT waiting and return
        a zero-arg completion callable producing ``List[List[Detection]]``.
        The host->HBM copy and device compute run while the caller does
        other work (assembling the next batch, decoding the previous
        round's results); used by the serving micro-batcher to overlap
        rounds."""
        res = self.detect_device(batch, mean, norm)
        return lambda: self._finish(res, batch, mean, norm)

    def detect_stream(self, batches, mean=DEFAULT_MEAN, norm=DEFAULT_NORM,
                      depth: int = 2):
        """Pipelined detection over an iterable of uint8 (N, H, W, 3)
        batches; yields one ``List[List[Detection]]`` per input batch, in
        order.

        Where :meth:`detect` is strictly serial per call (host->HBM copy,
        device compute, device->host results, decode), this keeps up to
        ``depth`` batches in flight: batch *i+1*'s host->device transfer
        and dispatch are issued BEFORE blocking on batch *i*'s results, so
        the transfer and the host-side result decode ride under device
        compute (JAX dispatch is asynchronous).  The reference's serial
        demo loop (ffcnn.c:577-580) has no analog; this is the throughput
        path for host-resident frame streams (file readers, video).

        ``depth`` bounds in-flight HBM (depth x batch buffers).  Dense-
        scene semantics match :meth:`detect`: parity mode re-runs a
        saturated batch at a larger top-k; fast/int8 warn once."""
        return stream_detections(
            lambda b: self.detect_async(b, mean, norm), batches, depth)

    def detect_device(self, batch, mean=DEFAULT_MEAN, norm=DEFAULT_NORM,
                      topk: Optional[int] = None) -> NMSResult:
        """Device-level entry: uint8 (N, H, W, 3) BGR (numpy or an already
        device-resident jnp array) → NMSResult device arrays (no host sync).
        Used by detect(), benchmarks, and serving.  ``topk`` overrides the
        net default for this call (a new value compiles a new bucket)."""
        n, h, w, _ = batch.shape
        if self.mode == "int8" and self.quant is None:
            # Self-calibration: ranges from the first batch (deterministic;
            # call calibrate() explicitly with a representative set for
            # production).
            self.calibrate(np.asarray(batch)[: min(8, n)],
                           mean=tuple(np.asarray(mean).tolist()),
                           norm=tuple(np.asarray(norm).tolist()))
        fn = self._pipeline_for(h, w, mean, norm, topk)
        t0 = time.perf_counter()
        while True:
            try:
                res = fn(jnp.asarray(batch))
                break
            except Exception as e:  # noqa: BLE001 — VMEM-overflow fallback
                # A fused-kernel geometry whose VMEM estimate was wrong
                # fails at COMPILE time; lower the global rows-per-step cap
                # and re-trace instead of dying (kernels/block_fused.py,
                # ADVICE r2).  Anything else propagates — in particular,
                # buckets that never traced the fused kernels (batch not a
                # lane-quantum multiple / non-TPU) must not burn recompiles
                # walking the cap ladder on an unrelated OOM.
                from .kernels import block_fused
                if not (self._fused_runs
                        and block_fused.runs_usable(n)
                        and "vmem" in str(e).lower()
                        and block_fused.reduce_rows_cap()):
                    raise
                self._pipelines.clear()
                fn = self._pipeline_for(h, w, mean, norm, topk)
        self.timeused["detect"] = self.timeused.get("detect", 0.0) + (
            time.perf_counter() - t0)
        return res

    @staticmethod
    def _to_detections(res: NMSResult) -> List[List[Detection]]:
        # Host decode sits on the serial path of every detect(); iterate
        # only the real detections (a handful per image), not the full
        # (N, K) candidate grid — nonzero() is row-major so per-image
        # order (= NMS survivor order) is preserved.
        scores = np.asarray(res.scores)
        mask = scores > 0
        ii, jj = np.nonzero(mask)
        sel_scores = scores[ii, jj].astype(float)
        sel_classes = np.asarray(res.classes)[ii, jj]
        sel_boxes = np.asarray(res.boxes)[ii, jj].astype(float)
        counts = np.asarray(res.count)
        out: List[List[Detection]] = [[] for _ in range(scores.shape[0])]
        for i, s, c, (x1, y1, x2, y2) in zip(
                ii.tolist(), sel_scores.tolist(), sel_classes.tolist(),
                sel_boxes.tolist()):
            out[i].append(Detection(s, int(c), x1, y1, x2, y2))
        assert all(len(d) == n for d, n in zip(out, counts.tolist()))
        return out

    def memory_stats(self, batch_size: int = 1, image_size=None,
                     mean=None, norm=None) -> Dict[str, int]:
        """Compiled HBM footprint of one pipeline bucket, in bytes — the
        analog of the reference's published 5 MB peak (readme.txt:127).
        Keys: ``args`` (input buffers), ``temp`` (XLA scratch = the live-
        blob high-water mark the C refcount allocator managed by hand),
        ``output``, ``code``, ``peak``.  Compiles the bucket if needed."""
        net_w, net_h = self.ir.blobs[0].w, self.ir.blobs[0].h
        img_h, img_w = image_size or (net_h, net_w)
        fn = self._pipeline_for(img_h, img_w,
                                mean if mean is not None else DEFAULT_MEAN,
                                norm if norm is not None else DEFAULT_NORM)
        spec = jax.ShapeDtypeStruct((batch_size, img_h, img_w, 3), jnp.uint8)
        m = fn.lower(spec).compile().memory_analysis()
        return {"args": m.argument_size_in_bytes,
                "temp": m.temp_size_in_bytes,
                "output": m.output_size_in_bytes,
                "code": m.generated_code_size_in_bytes,
                "peak": m.peak_memory_in_bytes}

    # ----------------------------------------------------------------- export
    def export(self, path: str, *, batch_size: int = 1, image_size=None,
               mean=None, norm=None, platforms=None) -> int:
        """Serialize this net's whole pixels-to-boxes pipeline for one
        (batch, H, W) bucket as a self-contained jax.export artifact
        (weights baked in as constants) — the deployment analog of the
        reference's self-contained binary (readme.txt:128).  Load with
        :func:`ffcnn_tpu.export.load_exported`; returns bytes written."""
        from .export import export_net
        return export_net(self, path, batch_size=batch_size,
                          image_size=image_size, mean=mean, norm=norm,
                          platforms=platforms)

    # ---------------------------------------------------------------- forward
    def forward_raw(self, x) -> List:
        """Raw yolo head feature maps for a preprocessed (N, H, W, C) net
        input — the net_forward equivalent without postprocess."""
        key = ("fwd", tuple(x.shape))
        fn = self._forwards.get(key)
        if fn is None:
            ir, precision, params = self.ir, self._precision, self.params
            fn = jax.jit(lambda xx: forward_features(
                ir, params, xx, precision=precision))
            self._forwards[key] = fn
        return fn(jnp.asarray(x, self._dtype))


def load(cfg_path: str, weights_path: Optional[str] = None, *,
         input_w: int = 0, input_h: int = 0, mode: str = "fast",
         **kw) -> Net:
    """Module-level convenience mirroring ``net_load`` (ffcnn.h:48)."""
    return Net.load(cfg_path, weights_path, input_w, input_h, mode=mode, **kw)
