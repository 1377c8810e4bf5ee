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
  recording every blob's absmax.
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
    """Everything the graph builder needs to trace the int8 pipeline."""
    blob_scale: Dict[int, float]          # blob idx -> activation scale
    weights: Dict[int, dict]              # conv layer idx -> {wq, wscale, bias}
    min_channels: int

    def blob_is_int8(self, bi: int) -> bool:
        return bi in self.blob_scale


def _int8_blobs(ir: NetIR, min_channels: int,
                exclude: Optional[set] = None) -> List[int]:
    """Blob indices eligible for int8 storage.  Excludes the net input
    (uint8 pixels), YOLO head inputs (decode precision), and small-C blobs
    (int8 (32,128) tiling inflates them)."""
    head_inputs = {l.index for l in ir.layers if l.type == LayerType.YOLO}
    # also keep the blob FEEDING each head conv in float: the last two hops
    # before decode are precision-critical (argmax flips there create
    # spurious boxes — measured on the golden image)
    head_conv_inputs = {l.index - 1 for l in ir.layers
                        if l.type == LayerType.YOLO}
    out = []
    for bi in range(1, len(ir.blobs)):
        if bi in head_inputs or bi in head_conv_inputs:
            continue
        if exclude and bi in exclude:
            continue                     # e.g. fused-run blobs (float path)
        li = bi - 1                      # producing layer
        if li < len(ir.layers) and ir.layers[li].type == LayerType.YOLO:
            continue                     # yolo layers produce no blob
        if ir.blobs[bi].c >= min_channels:
            out.append(bi)
    return out


def collect_blob_absmax(ir: NetIR, params, images, mean, norm,
                        percentile: Optional[float] = None) -> np.ndarray:
    """Calibration pass: run a float32 forward on uint8 BGR ``images`` and
    return per-blob absmax, shape (len(blobs),).  Uses the same graph
    builder as inference so quirk semantics are identical.

    ``percentile`` (e.g. 99.9): clip the activation range to that
    percentile of |x| instead of the true absmax — leaky-ReLU nets have
    long negative tails, and spending int8 codes on one outlier coarsens
    every in-range value (values past the clip saturate at +-127, which
    the requantize clamp already implements)."""
    import jax
    import jax.numpy as jnp

    from .graph.build import forward_features
    from .ops.preprocess import letterbox

    net_w, net_h = ir.blobs[0].w, ir.blobs[0].h
    stats: List = []

    def fn(p, bgr):
        x = letterbox(bgr, net_w, net_h, jnp.asarray(mean, jnp.float32),
                      jnp.asarray(norm, jnp.float32), dtype=jnp.float32)
        if percentile is None:
            stat = lambda v: jnp.max(jnp.abs(v))
        else:
            stat = lambda v: jnp.percentile(
                jnp.abs(v).reshape(-1), percentile)
        record = lambda bi, v: stats.append((bi, stat(v)))
        record(0, x)
        forward_features(ir, p, x, blob_hook=record)
        return jnp.stack([v for _, v in stats])

    vals = np.asarray(jax.jit(fn)(params, jnp.asarray(images)))
    out = np.zeros(len(ir.blobs), np.float32)
    for (bi, _), v in zip(stats, vals):
        out[bi] = max(out[bi], float(v))
    return out


def build_plan(ir: NetIR, params, absmax: np.ndarray,
               min_channels: int = 32,
               exclude_blobs: Optional[set] = None) -> QuantPlan:
    """Quantize weights + assign blob scales from calibrated absmax."""
    import jax.numpy as jnp

    int8_set = set(_int8_blobs(ir, min_channels, exclude_blobs))
    # scale-preserving layers (max/repeat/identity commute with a positive
    # scale) tie their output's scale to their input blob's, so passing
    # through them is an exact int8 roundtrip
    blob_scale: Dict[int, float] = {}
    for bi in sorted(int8_set):
        producer = ir.layers[bi - 1]
        if (producer.type in (LayerType.MAXPOOL, LayerType.UPSAMPLE,
                              LayerType.DROPOUT)
                and (bi - 1) in blob_scale):   # producer's input blob
            blob_scale[bi] = blob_scale[bi - 1]
            continue
        amax = float(absmax[bi])
        blob_scale[bi] = (amax / 127.0) if amax > 0 else 1.0

    weights: Dict[int, dict] = {}
    for li, l in enumerate(ir.layers):
        if l.type != LayerType.CONV:
            continue
        if li not in blob_scale:
            continue      # input blob (index li) is float: conv stays float
        if li + 1 < len(ir.layers) and ir.layers[li + 1].type == LayerType.YOLO:
            # Head convs keep float weights: their outputs feed the decode
            # formulas directly and per-class argmax flips under weight
            # quantization produce spurious boxes (measured on the golden
            # image).  Their int8 INPUT is dequantized instead — the cast
            # fuses into the conv.
            continue
        p = params[li]
        w = np.asarray(p["weights"] if isinstance(p, dict) else p.weights,
                       np.float32)
        scale = np.asarray(p["scale"] if isinstance(p, dict) else p.scale,
                           np.float32)
        bias = np.asarray(p["bias"] if isinstance(p, dict) else p.bias,
                          np.float32)
        wf = w * scale[None, None, None, :]          # fold BN scale
        wmax = np.abs(wf).reshape(-1, wf.shape[-1]).max(axis=0)
        wscale = np.where(wmax > 0, wmax / 127.0, 1.0).astype(np.float32)
        wq = np.clip(np.round(wf / wscale), -127, 127).astype(np.int8)
        weights[li] = {"wq": jnp.asarray(wq),
                       "wscale": jnp.asarray(wscale),
                       "bias": jnp.asarray(bias)}
    return QuantPlan(blob_scale=blob_scale, weights=weights,
                     min_channels=min_channels)


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
              percentile: Optional[float] = None) -> QuantPlan:
    """One-call calibration: float statistics pass + plan construction.
    ``percentile``: clip activation ranges to that percentile of |x|
    (see collect_blob_absmax); None = exact absmax."""
    images = np.asarray(images)
    if images.ndim == 3:
        images = images[None]
    exclude_blobs = _attribution_exclusions(ir, min_channels, exclude_blobs)
    absmax = collect_blob_absmax(ir, params, images, mean, norm, percentile)
    return build_plan(ir, params, absmax, min_channels, exclude_blobs)


def save_plan(path: str, plan: QuantPlan) -> None:
    """Persist a calibrated plan as npz (atomic publish) so serving
    restarts reuse calibration instead of re-running it — the int8 analog
    of the folded-params cache (darknet/cache.py)."""
    import os
    import tempfile
    arrays = {"__min_channels": np.asarray([plan.min_channels]),
              "__blobs": np.asarray(sorted(plan.blob_scale)),
              "__scales": np.asarray([plan.blob_scale[b]
                                      for b in sorted(plan.blob_scale)],
                                     np.float64)}  # exact python-float roundtrip
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
    blob_scale = {int(b): float(s) for b, s in
                  zip(data["__blobs"], data["__scales"])}
    weights = {}
    for name in data.files:
        if name.startswith("wq"):
            li = int(name[2:])
            weights[li] = {"wq": jnp.asarray(data[f"wq{li}"]),
                           "wscale": jnp.asarray(data[f"ws{li}"]),
                           "bias": jnp.asarray(data[f"wb{li}"])}
    return QuantPlan(blob_scale=blob_scale, weights=weights,
                     min_channels=int(data["__min_channels"][0]))
