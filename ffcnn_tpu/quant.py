"""Post-training int8 quantization for the inference pipeline.

The MXU runs int8 matmuls at 2x the bf16 rate and — more importantly for
this memory-bound net — int8 activations halve HBM traffic.  The reference
has no quantized path (pure float C, conv-v0..v6); this is a TPU-native
capability extension gated on reproducing the reference's detections
(classes exact, boxes within the fast-mode tolerance; see tests and
bench gates).

Scheme (standard symmetric PTQ):

* **Weights**: the BN fold (darknet/weights.py, ffcnn.c:229-232) leaves a
  per-output-channel ``scale``; it is folded INTO the weights first, then
  each output channel is quantized to int8 with its own scale
  ``wscale[o] = absmax(w'[..., o]) / 127``.
* **Activations**: per-blob symmetric scale ``sx = absmax / 127``,
  calibrated by running a float forward over a calibration batch and
  recording every blob's absmax.  With ``per_channel=True``
  (FFCNN_INT8_PERCH=1) the scale is a per-CHANNEL vector instead: each
  channel's absmax/127.  The consumer-side correction folds exactly into
  the consumer conv's weights BEFORE weight quantization
  (``conv(xq * sx, w) == conv(xq, w * sx[c])``), so the int8 dot itself
  is unchanged and only the producer's requantize epilogue becomes a
  per-channel multiply.  Motivation: the r4 attribution sweep
  (docs/PERF_NOTES.md) showed the mAP loss is a *scale-granularity*
  problem that plan surgery cannot fix — channels with small ranges waste
  int8 codes under one per-tensor absmax.
* **Conv**: ``acc = conv_int8(xq, wq)`` (int32 accumulation on the MXU),
  epilogue ``y = act(acc * (sx * wscale) + bias)`` in f32, then requantize
  to the output blob's scale (or emit bf16 where the plan keeps the blob
  in float).
* **Blob policy**: a blob is stored int8 only when its channel count is
  >= ``min_channels`` (int8's (32,128) tiling makes tiny-C tensors slower
  — measured on v5e, docs/PERF_NOTES.md) and it doesn't feed a YOLO head
  (decode keeps full precision).  Maxpool/upsample/dropout preserve their
  input's scale exactly; shortcut/route dequantize, combine, requantize.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

from .darknet.ir import LayerType, NetIR


@dataclasses.dataclass(frozen=True)
class QuantPlan:
    """Everything the graph builder needs to trace the int8 pipeline.

    ``blob_scale`` values are python floats (per-tensor plans) or
    np.float32 vectors of shape (C,) (per-channel plans); both broadcast
    correctly in the graph builder's dequantize/requantize epilogues."""
    blob_scale: Dict[int, object]         # blob idx -> scale (float | (C,))
    weights: Dict[int, dict]              # conv layer idx -> {wq, wscale, bias}
    min_channels: int
    per_channel: bool = False

    def blob_is_int8(self, bi: int) -> bool:
        return bi in self.blob_scale

    def scalar_scale(self, bi: int) -> Optional[float]:
        """Blob scale as a python float, or None for per-channel plans —
        the fused Pallas kernels' requantize epilogue is scalar-only, so
        vector-scaled boundaries fall back to float storage there."""
        s = self.blob_scale[bi]
        return float(s) if np.ndim(s) == 0 else None


def _head_protect(ir: NetIR):
    """(blob indices, conv layer indices) that feed a head DECODE and must
    stay float: the last two hops before decode are precision-critical
    (argmax flips there create spurious boxes — measured on the golden
    image).  For a darknet [yolo] head the producer is the head conv
    itself; a [yolov8] head consumes the route CONCAT of its box/cls 1x1
    convs, so the protection must follow the route's sources one hop back
    (otherwise the DFL box logits get quantized to 127 levels while only
    the concat blob is protected)."""
    blobs, convs = set(), set()
    for l in ir.layers:
        if l.type not in (LayerType.YOLO, LayerType.YOLOV8):
            continue
        hi = l.index
        blobs.add(hi)                          # the decode input blob
        prod = ir.layers[hi - 1]
        srcs = list(prod.depends) if prod.type == LayerType.ROUTE \
            else [hi - 1]
        for s in srcs:
            blobs.add(s + 1)                   # source's output blob
            if ir.layers[s].type == LayerType.CONV:
                convs.add(s)                   # float weights
                blobs.add(s)                   # its input blob too
    return blobs, convs


def _int8_blobs(ir: NetIR, min_channels: int,
                exclude: Optional[set] = None) -> List[int]:
    """Blob indices eligible for int8 storage.  Excludes the net input
    (uint8 pixels), head-decode feeding blobs (_head_protect), and
    small-C blobs (int8 (32,128) tiling inflates them)."""
    protected, _ = _head_protect(ir)
    out = []
    for bi in range(1, len(ir.blobs)):
        if bi in protected:
            continue
        if exclude and bi in exclude:
            continue                     # e.g. fused-run blobs (float path)
        li = bi - 1                      # producing layer
        if li < len(ir.layers) and ir.layers[li].type in (
                LayerType.YOLO, LayerType.YOLOV8):
            continue                     # yolo layers produce no blob
        if ir.blobs[bi].c >= min_channels:
            out.append(bi)
    return out


def collect_blob_absmax(ir: NetIR, params, images, mean, norm,
                        percentile: Optional[float] = None,
                        per_channel: bool = False):
    """Calibration pass: run a float32 forward on uint8 BGR ``images`` and
    return per-blob absmax — shape (len(blobs),) by default, or a dict
    ``{blob_index: (C,) vector}`` with ``per_channel=True``.  Uses the same
    graph builder as inference so quirk semantics are identical.

    ``percentile`` (e.g. 99.9): clip the activation range to that
    percentile of |x| instead of the true absmax — leaky-ReLU nets have
    long negative tails, and spending int8 codes on one outlier coarsens
    every in-range value (values past the clip saturate at +-127, which
    the requantize clamp already implements).  Per-tensor only (the
    per-channel vector already isolates outlier channels)."""
    import jax
    import jax.numpy as jnp

    from .graph.build import forward_features
    from .ops.preprocess import letterbox

    if per_channel and percentile is not None:
        raise ValueError("percentile clip is per-tensor only")
    net_w, net_h = ir.blobs[0].w, ir.blobs[0].h
    stats: List = []

    def fn(p, bgr):
        x = letterbox(bgr, net_w, net_h, jnp.asarray(mean, jnp.float32),
                      jnp.asarray(norm, jnp.float32), dtype=jnp.float32)
        if per_channel:
            stat = lambda v: jnp.max(jnp.abs(v), axis=tuple(
                range(v.ndim - 1)))                     # (C,) over N,H,W
        elif percentile is None:
            stat = lambda v: jnp.max(jnp.abs(v))
        else:
            stat = lambda v: jnp.percentile(
                jnp.abs(v).reshape(-1), percentile)
        record = lambda bi, v: stats.append((bi, stat(v)))
        record(0, x)
        forward_features(ir, p, x, blob_hook=record)
        return [v for _, v in stats]

    vals = jax.jit(fn)(params, jnp.asarray(images))
    if per_channel:
        out: Dict[int, np.ndarray] = {}
        for (bi, _), v in zip(stats, vals):
            v = np.asarray(v, np.float32)
            out[bi] = np.maximum(out[bi], v) if bi in out else v
        return out
    flat = np.zeros(len(ir.blobs), np.float32)
    for (bi, _), v in zip(stats, vals):
        flat[bi] = max(flat[bi], float(v))
    return flat


def build_plan(ir: NetIR, params, absmax,
               min_channels: int = 32,
               exclude_blobs: Optional[set] = None) -> QuantPlan:
    """Quantize weights + assign blob scales from calibrated absmax.

    ``absmax``: per-blob scalars (np array indexed by blob, the default
    per-tensor plan) or a ``{blob: (C,) vector}`` dict from
    ``collect_blob_absmax(per_channel=True)`` — the latter builds a
    per-channel plan: each consumer conv's weights absorb its input
    blob's channel scales BEFORE weight quantization (exact algebra:
    ``conv(xq * sx, w) == conv(xq, w * sx[c])``; grouped convs fold per
    group slice), so ``conv2d_int8`` runs with ``x_scale=1``."""
    import jax.numpy as jnp

    per_channel = isinstance(absmax, dict)
    int8_set = set(_int8_blobs(ir, min_channels, exclude_blobs))
    # scale-preserving layers (max/repeat/identity commute with a positive
    # scale) tie their output's scale to their input blob's, so passing
    # through them is an exact int8 roundtrip
    blob_scale: Dict[int, object] = {}
    for bi in sorted(int8_set):
        producer = ir.layers[bi - 1]
        if (producer.type in (LayerType.MAXPOOL, LayerType.UPSAMPLE,
                              LayerType.DROPOUT)
                and (bi - 1) in blob_scale):   # producer's input blob
            blob_scale[bi] = blob_scale[bi - 1]
            continue
        if per_channel:
            amax = np.asarray(absmax[bi], np.float32)
            blob_scale[bi] = np.where(amax > 0, amax / 127.0,
                                      1.0).astype(np.float32)
        else:
            amax = float(absmax[bi])
            blob_scale[bi] = (amax / 127.0) if amax > 0 else 1.0

    weights: Dict[int, dict] = {}
    _, head_convs = _head_protect(ir)
    for li, l in enumerate(ir.layers):
        if l.type != LayerType.CONV:
            continue
        if li not in blob_scale:
            continue      # input blob (index li) is float: conv stays float
        if li in head_convs:
            # Head convs keep float weights (incl. the v8 box/cls 1x1
            # convs behind the concat route, _head_protect): their outputs
            # feed the decode formulas directly and per-class argmax flips
            # under weight quantization produce spurious boxes (measured
            # on the golden image).  An int8 INPUT is dequantized instead
            # — the cast fuses into the conv.
            continue
        p = params[li]
        w = np.asarray(p["weights"] if isinstance(p, dict) else p.weights,
                       np.float32)
        scale = np.asarray(p["scale"] if isinstance(p, dict) else p.scale,
                           np.float32)
        bias = np.asarray(p["bias"] if isinstance(p, dict) else p.bias,
                          np.float32)
        wf = w * scale[None, None, None, :]          # fold BN scale
        if per_channel:
            # absorb the input blob's channel scales: filter n consumes
            # input channels [group(n)*icg, +icg) with group(n) = n // fpg
            sx = np.asarray(blob_scale[li], np.float32)     # (ic,)
            fs0, fs1, icg, fn = wf.shape
            g = l.groups
            fpg = fn // g
            wf = (wf.reshape(fs0, fs1, icg, g, fpg)
                  * sx.reshape(g, icg).T[None, None, :, :, None]
                  ).reshape(fs0, fs1, icg, fn)
        wmax = np.abs(wf).reshape(-1, wf.shape[-1]).max(axis=0)
        wscale = np.where(wmax > 0, wmax / 127.0, 1.0).astype(np.float32)
        wq = np.clip(np.round(wf / wscale), -127, 127).astype(np.int8)
        weights[li] = {"wq": jnp.asarray(wq),
                       "wscale": jnp.asarray(wscale),
                       "bias": jnp.asarray(bias)}
        if per_channel:
            weights[li]["xs"] = 1.0      # input scales live in the weights
    return QuantPlan(blob_scale=blob_scale, weights=weights,
                     min_channels=min_channels, per_channel=per_channel)


def _attribution_exclusions(ir: NetIR, min_channels: int,
                            exclude_blobs: Optional[set]) -> Optional[set]:
    """Attribution-harness knobs (env-only, not apply_tuning-tunable):

    * ``FFCNN_INT8_EXCLUDE_BLOBS=81,82`` — force the listed blob indices
      to stay float on top of the normal plan;
    * ``FFCNN_INT8_ONLY_BLOBS=81,82`` — quantize ONLY the listed blobs
      (intersected with normal eligibility); everything else stays float.

    Both exist for tools/int8_attribution.py's per-blob accuracy sweep
    (VERDICT r3 #4: which blobs shift the boxes?); production never sets
    them."""
    import os

    def _parse(name):
        raw = os.environ.get(name, "").strip()
        if not raw:
            return None
        return {int(t) for t in raw.split(",") if t.strip()}

    excl = set(exclude_blobs or ())
    extra = _parse("FFCNN_INT8_EXCLUDE_BLOBS")
    if extra:
        excl |= extra
    only = _parse("FFCNN_INT8_ONLY_BLOBS")
    if only is not None:
        eligible = set(_int8_blobs(ir, min_channels))
        excl |= eligible - only
    return excl or exclude_blobs


def calibrate(ir: NetIR, params, images, mean=(0.0, 0.0, 0.0),
              norm=(1 / 255.0,) * 3, min_channels: int = 32,
              exclude_blobs: Optional[set] = None,
              percentile: Optional[float] = None,
              per_channel: bool = False) -> QuantPlan:
    """One-call calibration: float statistics pass + plan construction.
    ``percentile``: clip activation ranges to that percentile of |x|
    (see collect_blob_absmax); None = exact absmax.  ``per_channel``:
    per-channel activation scales (FFCNN_INT8_PERCH=1)."""
    images = np.asarray(images)
    if images.ndim == 3:
        images = images[None]
    exclude_blobs = _attribution_exclusions(ir, min_channels, exclude_blobs)
    absmax = collect_blob_absmax(ir, params, images, mean, norm, percentile,
                                 per_channel=per_channel)
    return build_plan(ir, params, absmax, min_channels, exclude_blobs)


def save_plan(path: str, plan: QuantPlan) -> None:
    """Persist a calibrated plan as npz (atomic publish) so serving
    restarts reuse calibration instead of re-running it — the int8 analog
    of the folded-params cache (darknet/cache.py)."""
    import os
    import tempfile
    arrays = {"__min_channels": np.asarray([plan.min_channels]),
              "__per_channel": np.asarray([int(plan.per_channel)]),
              "__blobs": np.asarray(sorted(plan.blob_scale))}
    if plan.per_channel:
        for b in sorted(plan.blob_scale):
            arrays[f"bs{b}"] = np.asarray(plan.blob_scale[b], np.float32)
    else:
        arrays["__scales"] = np.asarray(
            [plan.blob_scale[b] for b in sorted(plan.blob_scale)],
            np.float64)  # exact python-float roundtrip
    for li, q in plan.weights.items():
        arrays[f"wq{li}"] = np.asarray(q["wq"])
        arrays[f"ws{li}"] = np.asarray(q["wscale"])
        arrays[f"wb{li}"] = np.asarray(q["bias"])
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".",
                               suffix=".npz")
    os.close(fd)
    np.savez(tmp, **arrays)        # keeps the name (already ends in .npz)
    os.replace(tmp, path)


def load_plan(path: str) -> QuantPlan:
    import jax.numpy as jnp
    data = np.load(path)
    per_channel = ("__per_channel" in data.files
                   and bool(data["__per_channel"][0]))
    if per_channel:
        blob_scale = {int(b): np.asarray(data[f"bs{int(b)}"], np.float32)
                      for b in data["__blobs"]}
    else:
        blob_scale = {int(b): float(s) for b, s in
                      zip(data["__blobs"], data["__scales"])}
    weights = {}
    for name in data.files:
        if name.startswith("wq"):
            li = int(name[2:])
            weights[li] = {"wq": jnp.asarray(data[f"wq{li}"]),
                           "wscale": jnp.asarray(data[f"ws{li}"]),
                           "bias": jnp.asarray(data[f"wb{li}"])}
            if per_channel:
                weights[li]["xs"] = 1.0
    return QuantPlan(blob_scale=blob_scale, weights=weights,
                     min_channels=int(data["__min_channels"][0]),
                     per_channel=per_channel)
