"""IR → pure-functional JAX forward pass.

The reference walks its layer array sequentially with a refcount memory
manager (net_forward, ffcnn.c:476-520); here the same graph is traced once
into a single XLA program — blob liveness, buffer reuse, and op fusion are
the compiler's job, so the refcount machinery has no equivalent.  Tracing is
a Python loop over the static layer list (unrolled at trace time; 131 layers
for yolo-fastest), so there is no dynamic control flow inside jit.

The built function maps (params, net_input) → list of raw yolo head feature
maps; decode/NMS live in postprocess so callers can also grab raw heads.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..darknet.ir import LayerType, NetIR
from ..ops.activations import activate
from ..ops.conv import conv0_int8_from_u8, conv2d_fused, conv2d_int8
from ..ops.pool import avgpool2d, maxpool2d, upsample_nearest


def fold_input_transform(ir: NetIR, params: Dict, mean, norm) -> Dict:
    """Fold the letterbox normalize + BGR→RGB swap into the first conv.

    net_input computes ``in[c] = (bgr[2-c] - mean[c]) * norm[c]``
    (ffcnn.c:280-283); since the first conv is linear this is equivalent to
    running it directly on the raw BGR bytes with

        w'[ky,kx,cb,o] = w[ky,kx,2-cb,o] * norm[2-cb]
        bias'[o]       = bias[o] - scale[o] * Σ w[ky,kx,c,o] * norm[c] * mean[c]

    which lets the fast path skip the whole float preprocess pass — the
    uint8→float cast fuses into the conv-1 XLA fusion.  Exact-zero letterbox
    padding is preserved only for mean == 0 (the demo default, ffcnn.c:556);
    callers with a nonzero mean must use the unfolded pipeline.

    Requires the first layer to be a dense conv over all input channels."""
    first = ir.layers[0]
    if first.type != LayerType.CONV or first.groups != 1:
        raise ValueError("first layer must be a dense conv to fold input")
    p = dict(params[0])
    w = jnp.asarray(p["weights"])                       # (fs, fs, 3, fn)
    scale, bias = jnp.asarray(p["scale"]), jnp.asarray(p["bias"])
    mean = jnp.asarray(mean, w.dtype)
    norm = jnp.asarray(norm, w.dtype)
    p["weights"] = w[:, :, ::-1, :] * norm[::-1][None, None, :, None]
    s = jnp.sum(w * (norm * mean)[None, None, :, None], axis=(0, 1, 2))
    p["bias"] = bias - scale * s
    out = dict(params)
    out[0] = p
    return out


def stage_layer_set(ir: NetIR, stages_csv: str) -> frozenset:
    """FFCNN_F32_STAGES value (e.g. '160' or '160,80') → the conv/shortcut
    layer indices whose OUTPUT blob has one of those spatial widths: the
    stage-local f32 forcing set (VERDICT r4 #2 bisection).  ONE shared
    implementation for the pipeline builder, memory_stats, and the
    bisection tool, so the traced plan and its mirrors cannot drift."""
    widths = {int(s) for s in str(stages_csv).split(",") if s.strip()}
    return frozenset(
        li for li, l in enumerate(ir.layers)
        if ir.blobs[li + 1].w in widths
        and l.type in (LayerType.CONV, LayerType.SHORTCUT))


def head_chain_layers(ir: NetIR) -> frozenset:
    """Layer indices of every linear conv chain feeding a YOLO head: from
    each yolo layer walk back over convs whose output has that single
    consumer (yolo-fastest: dw5x5/pw chains 116-120 and 125-129, ending
    at the route/branch point).  Used by the FFCNN_HEAD_F32 accuracy knob
    (the fast-mode wide-corpus drops are conf-threshold knife-edges born
    in these last few layers — docs/PERF_NOTES.md round 4)."""
    cons = _chain_consumers(ir)
    out = set()
    for yi, l in enumerate(ir.layers):
        if l.type != LayerType.YOLO:
            continue
        j = yi - 1
        # layer j produces blob j+1; chain membership requires its only
        # consumer to be the immediately following layer
        while (j >= 0 and ir.layers[j].type == LayerType.CONV
               and cons.get(j + 1, []) == [j + 1]):
            out.add(j)
            j -= 1
    return frozenset(out)


def _chain_consumers(ir: NetIR) -> Dict[int, List[int]]:
    """blob index -> layer indices reading it (direct input + route/
    shortcut deps), mirroring run_layer's reads."""
    cons: Dict[int, List[int]] = {}
    for li, l in enumerate(ir.layers):
        if l.type == LayerType.ROUTE:
            for d in l.depends:
                cons.setdefault(d + 1, []).append(li)
        else:
            cons.setdefault(li, []).append(li)
            if l.type == LayerType.SHORTCUT:
                cons.setdefault(l.depends[0] + 1, []).append(li)
    return cons


def forward_features(ir: NetIR, params: Dict, x, *, precision=None,
                     accum_dtype=jnp.float32, input_dtype=None,
                     quant=None, blob_hook=None, fused_runs=None,
                     head_runs=None, fused_interpret: bool = False,
                     conv0_int8: bool = False,
                     conv0_pallas: bool = False,
                     f32_layers=None,
                     start: int = 0, stop: Optional[int] = None,
                     blobs_in: Optional[Dict[int, jnp.ndarray]] = None,
                     keep_blobs: Optional[List[int]] = None) -> List:
    """Run the graph body.  ``x``: (N, H, W, C) net input.  Returns the raw
    (N, h, w, 3*(5+classes)) feature map feeding each yolo layer, in graph
    order.  ``params`` is a pytree {layer_index: {weights, scale, bias}} (or
    FoldedConvParams).  A non-float ``x`` (raw uint8 pixels on the folded
    fast path) is cast to ``input_dtype``; the cast fuses into conv-1.

    ``quant``: optional :class:`ffcnn_tpu.quant.QuantPlan` — blobs the plan
    marks int8 are stored as int8 (with their calibrated scale baked into
    the trace), convs reading them run on the int8 MXU, and scale
    conversions fuse into the surrounding epilogues.

    ``blob_hook(blob_index, float_value)``: calibration tap, called with
    every blob's float value during tracing.

    ``fused_runs``: optional list of kernels.block_fused.FusedRun — each run
    of [pw, dw3x3, pw(, dropout, shortcut)] blocks executes as Pallas fused
    kernels (expand intermediates stay in VMEM); the interior layers are
    skipped and their blobs never materialize (eligibility guarantees no
    other consumers).

    ``head_runs``: optional list of kernels.head_fused.HeadRun — each
    [dw5x5/pw...] chain feeding a yolo layer executes as one Pallas launch
    per batch chunk (interior blobs never materialize).  Measured slower
    than XLA on v5e (docs/PERF_NOTES.md) — off by default, kept tested.

    ``conv0_int8``: run the first conv straight off the raw uint8 pixels on
    the int8 MXU (ops.conv.conv0_int8_from_u8) instead of casting the input
    to float first — applies only when x is uint8, the first layer is a
    dense conv, and blob 0 has no other consumers.

    Segment execution (pipeline parallelism, parallel/pp.py): ``start``/
    ``stop`` bound the layer range [start, stop); ``blobs_in`` seeds the
    blob table for cross-boundary inputs (``x`` may then be None);
    ``keep_blobs`` additionally returns the listed blob values —
    the return becomes ``(heads, {blob_index: value})``.  Defaults
    reproduce the whole-graph behavior and return type exactly."""
    segmented = keep_blobs is not None
    if stop is None:
        stop = len(ir.layers)
    use_c0q = (start == 0 and x is not None
               and conv0_int8 and x.dtype == jnp.uint8
               and ir.layers[0].type == LayerType.CONV
               and ir.layers[0].groups == 1
               and (quant is None or 0 not in quant.weights)
               and not any(0 in (d + 1 for d in l.depends)
                           for l in ir.layers
                           if l.type in (LayerType.ROUTE,
                                         LayerType.SHORTCUT)))
    # Pallas stem (kernels/conv0_fused.py): conv0 off the raw uint8 pixels,
    # output emitted directly in the fused (H, C, W*N) layout and chained
    # into the region run starting at layer 1 — blob 1 never takes an NHWC
    # detour, so it must have no consumers outside that run.
    l0 = ir.layers[0]
    use_c0p = (start == 0 and x is not None
               and conv0_pallas and not use_c0q and x.dtype == jnp.uint8
               and fused_runs is not None
               and any(r.start == 1 for r in fused_runs)
               and l0.type == LayerType.CONV and l0.groups == 1
               and l0.fs == 3 and l0.stride == 2 and l0.pad == 1
               and ir.blobs[0].w % 2 == 0 and ir.blobs[0].h % 2 == 0
               and (quant is None or (0 not in quant.weights
                                      and not quant.blob_is_int8(1)))
               and not any(1 in (d + 1 for d in l.depends)
                           for l in ir.layers
                           if l.type in (LayerType.ROUTE,
                                         LayerType.SHORTCUT)))
    if use_c0q or use_c0p or x is None:
        float_dtype = input_dtype or jnp.float32
    else:
        if not jnp.issubdtype(x.dtype, jnp.floating):
            x = x.astype(input_dtype or jnp.float32)
        float_dtype = x.dtype
    nlayers = len(ir.layers)
    blobs: List[Optional[jnp.ndarray]] = [None] * (nlayers + 1)
    blobs[0] = x
    for bi, v in (blobs_in or {}).items():
        blobs[bi] = v
    heads: List[jnp.ndarray] = []

    def scale_of(bi):
        # python float (per-tensor plans) or (C,) np vector (per-channel
        # plans) — both broadcast over NHWC's trailing channel axis.
        return quant.blob_scale[bi] if quant else None

    def same_scale(a, b):
        return np.array_equal(np.asarray(a), np.asarray(b))

    def is_q(bi):
        return quant is not None and quant.blob_is_int8(bi)

    def deq(bi, v=None):
        """Blob bi as float (dequantize if stored int8)."""
        v = blobs[bi] if v is None else v
        if is_q(bi):
            return v.astype(float_dtype) * jnp.asarray(scale_of(bi),
                                                       float_dtype)
        return v

    def store(bi, y):
        """Float layer result -> stored blob form (requantize if int8)."""
        if is_q(bi):
            s = scale_of(bi)
            return jnp.clip(jnp.round(y.astype(jnp.float32) * (1.0 / s)),
                            -127, 127).astype(jnp.int8)
        return y.astype(float_dtype)

    def reconcile(li, out):
        """Pass-through layer output (maxpool/upsample of blob li) -> the
        storage the plan assigns blob li+1.  Identity when input and
        output share storage (+scale); otherwise dequantize/requantize so
        a mixed plan can never leak raw int8 values into the float path."""
        in_q, out_q = is_q(li), is_q(li + 1)
        if in_q == out_q and (not in_q
                              or same_scale(scale_of(li), scale_of(li + 1))):
            return out
        return store(li + 1, deq(li, out))

    def run_layer(li, layer, inp):
        t = layer.type
        if t == LayerType.CONV:
            if li == 0 and use_c0q:
                p = params[0]
                w, scale, bias = (p["weights"], p["scale"], p["bias"]) \
                    if isinstance(p, dict) else (p.weights, p.scale, p.bias)
                y = conv0_int8_from_u8(inp, w, scale, bias,
                                       stride=layer.stride, pad=layer.pad,
                                       act=layer.activation,
                                       float_dtype=float_dtype)
                return store(li + 1, y) if is_q(li + 1) else y
            if is_q(li) and li in quant.weights:   # int8 blob -> int8 MXU
                q = quant.weights[li]
                out_s = scale_of(li + 1) if is_q(li + 1) else None
                # per-channel plans pre-fold the input's channel scales
                # into wq (quant.build_plan) and set xs=1
                return conv2d_int8(inp, q["wq"], q.get("xs", scale_of(li)),
                                   q["wscale"],
                                   q["bias"], stride=layer.stride,
                                   pad=layer.pad, groups=layer.groups,
                                   act=layer.activation, out_scale=out_s,
                                   float_dtype=float_dtype)
            p = params[li]
            w, scale, bias = (p["weights"], p["scale"], p["bias"]) \
                if isinstance(p, dict) else (p.weights, p.scale, p.bias)
            x_in = deq(li, inp)
            if f32_layers is not None:
                # In-set convs compute in f32 (conv2d_fused emits in its
                # input dtype, so their OUTPUT blobs are stored f32 too):
                #   * FFCNN_HEAD_F32 puts the head chains here — the f32
                #     propagates through the yolo decode, killing the bf16
                #     conf-threshold knife-edges at ~zero cost.
                #   * FFCNN_F32_STAGES puts one spatial stage here (the
                #     per-stage drift bisection, VERDICT r4 #2).
                # Out-of-set convs cast back DOWN to the pipeline dtype, so
                # a forced stage stays stage-LOCAL: the first conv after it
                # resumes bf16 instead of silently inheriting f32.
                x_in = x_in.astype(jnp.float32 if li in f32_layers
                                   else float_dtype)
            y = conv2d_fused(x_in, jnp.asarray(w), jnp.asarray(scale),
                             jnp.asarray(bias), stride=layer.stride,
                             pad=layer.pad, groups=layer.groups,
                             act=layer.activation, precision=precision,
                             accum_dtype=accum_dtype)
            return store(li + 1, y) if is_q(li + 1) else y
        if t == LayerType.MAXPOOL:
            # int8-safe: max commutes with the (positive, shared) scale.
            # reconcile() covers plans where input/output storage differ
            # (possible in non-flagship graphs — e.g. an excluded output).
            return reconcile(li, maxpool2d(inp, layer.fs, layer.stride))
        if t == LayerType.AVGPOOL:
            return store(li + 1, avgpool2d(deq(li, inp), layer.fs,
                                           layer.stride))
        if t == LayerType.UPSAMPLE:
            return reconcile(li, upsample_nearest(inp, layer.stride))
        if t == LayerType.DROPOUT:
            return inp                     # inference no-op (ffcnn.c:412-416)
        if t == LayerType.SHORTCUT:
            a, b = deq(li, inp), deq(layer.depends[0] + 1)
            if f32_layers and li in f32_layers:
                # in-stage shortcut (FFCNN_F32_STAGES): add in f32 and skip
                # the float_dtype store-downcast so the residual chain stays
                # f32 through the whole forced stage
                a, b = a.astype(jnp.float32), b.astype(jnp.float32)
                y = activate(a + b, layer.activation)
                if not is_q(li + 1):
                    return y
                return store(li + 1, y)
            y = activate(a + b, layer.activation)
            return store(li + 1, y)
        if t == LayerType.ROUTE:
            srcs = [d + 1 for d in layer.depends]
            per_ch = quant is not None and getattr(quant, "per_channel",
                                                   False)
            if is_q(li + 1) and per_ch and layer.route_groups > 1:
                # per-channel scales don't survive the post-concat group
                # slice (the output vector indexes SLICED channels):
                # combine in float, store once.  No flagship cfg hits this.
                out = jnp.concatenate([deq(bi) for bi in srcs], axis=-1) \
                    if len(srcs) > 1 else deq(srcs[0])
                gc = out.shape[-1] // layer.route_groups
                out = out[..., layer.route_group_id * gc:
                          (layer.route_group_id + 1) * gc]
                return store(li + 1, out)
            if is_q(li + 1):
                s_out = scale_of(li + 1)
                parts = []
                off = 0
                for bi in srcs:
                    v = blobs[bi]
                    c = ir.blobs[bi].c
                    # per-channel: this part's slice of the output vector
                    # (calibration makes it bitwise-equal to the part's own
                    # vector — route is an exact concat — so the int8
                    # passthrough stays exact)
                    so = (s_out[off:off + c] if np.ndim(s_out) else s_out)
                    if is_q(bi):
                        if same_scale(scale_of(bi), so):
                            parts.append(v)      # exact passthrough
                        else:
                            r = jnp.asarray(scale_of(bi) / so, jnp.float32)
                            parts.append(jnp.clip(
                                jnp.round(v.astype(jnp.float32) * r),
                                -127, 127).astype(jnp.int8))
                    elif np.ndim(so):    # float part, per-channel slice
                        parts.append(jnp.clip(
                            jnp.round(deq(bi, v).astype(jnp.float32)
                                      * (1.0 / so)),
                            -127, 127).astype(jnp.int8))
                    else:
                        parts.append(store(li + 1, v))
                    off += c
            else:
                parts = [deq(bi) for bi in srcs]
            out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
            if layer.route_groups > 1:     # yolov4-tiny extension
                gc = out.shape[-1] // layer.route_groups
                out = out[..., layer.route_group_id * gc:
                          (layer.route_group_id + 1) * gc]
            return out
        if t in (LayerType.YOLO, LayerType.YOLOV8):
            heads.append(deq(li, inp))
            return None                    # yolo produces no blob (ffcnn.c:489)
        raise ValueError(f"unsupported layer type {t}")

    run_map = {r.start: r for r in (fused_runs or [])}
    head_map = {r.start: r for r in (head_runs or [])}
    skip_until = -1
    for li in range(start, stop):
        layer = ir.layers[li]
        if li < skip_until:
            continue
        if li == 0 and use_c0p:
            from ..kernels.block_fused import run_blocks_cs
            from ..kernels.conv0_fused import conv0_cs
            r = run_map[1]
            p = params[0]
            w0, s0, b0 = (p["weights"], p["scale"], p["bias"]) \
                if isinstance(p, dict) else (p.weights, p.scale, p.bias)
            nb = x.shape[0]
            with jax.named_scope("L000_conv0_pallas"):
                xc0 = conv0_cs(x, w0, s0, b0, l0.activation,
                               out_dtype=float_dtype,
                               interpret=fused_interpret)
            if xc0 is None:
                # geometry has no legal stem rows choice: fall through to
                # the normal (XLA) handling of layer 0; the fused run at
                # L1 still applies via run_map.
                use_c0p = False
            else:
                with jax.named_scope(f"L001_fusedrun_to_{r.end:03d}"):
                    xc, hh2, ww2 = run_blocks_cs(
                        xc0, ir, params, r, ir.blobs[1].h, ir.blobs[1].w,
                        nb, final_dtype=float_dtype,
                        interpret=fused_interpret, quant=quant)
                    p2 = xc.shape[1]
                    y = jnp.transpose(xc.reshape(hh2, p2, ww2, nb),
                                      (3, 0, 2, 1))
                    blobs[r.end + 1] = store(r.end + 1, y)
                skip_until = r.end + 1
                if blob_hook is not None:
                    blob_hook(r.end + 1, deq(r.end + 1))
                continue
        if li in head_map:
            from ..kernels.head_fused import apply_head_run
            r = head_map[li]
            with jax.named_scope(f"L{li:03d}_headrun_to_{r.end:03d}"):
                y = apply_head_run(deq(li), ir, params, r,
                                   interpret=fused_interpret)
                blobs[r.end + 1] = store(r.end + 1, y)
            skip_until = r.end + 1
            if blob_hook is not None:
                blob_hook(r.end + 1, blobs[r.end + 1])
            continue
        if li in run_map:
            from ..kernels.block_fused import apply_run
            r = run_map[li]
            with jax.named_scope(f"L{li:03d}_fusedrun_to_{r.end:03d}"):
                y = apply_run(deq(li), ir, params, r,
                              interpret=fused_interpret, quant=quant)
                # boundary blobs keep their quant-plan storage so the int8
                # pipeline is identical with or without fusion active
                blobs[r.end + 1] = store(r.end + 1, y)
            skip_until = r.end + 1
            if blob_hook is not None:
                blob_hook(r.end + 1, blobs[r.end + 1])
            continue
        # named_scope tags every op with its layer, so HLO fusions and
        # profiler rows map back to the net_dump table.
        with jax.named_scope(f"L{li:03d}_{layer.type.name.lower()}"):
            blobs[li + 1] = run_layer(li, layer, blobs[li])
            if blob_hook is not None and blobs[li + 1] is not None:
                blob_hook(li + 1, deq(li + 1))
    if segmented:
        return heads, {bi: blobs[bi] for bi in keep_blobs}
    return heads


def params_to_pytree(params: Dict) -> Dict:
    """FoldedConvParams dict → plain nested-dict pytree (jit/pjit friendly)."""
    return {li: {"weights": jnp.asarray(p.weights),
                 "scale": jnp.asarray(p.scale),
                 "bias": jnp.asarray(p.bias)}
            for li, p in params.items()}
