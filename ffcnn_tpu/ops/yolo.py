"""Vectorized YOLO head decode.

Replaces the reference's per-cell scalar loop (layer_yolo_forward,
ffcnn.c:438-474) with one batched tensor program per head.  Numerical quirks
reproduced exactly:

  * combined confidence ``1 / (1 + exp(-bs) * (1 + exp(-cs)))``
    (ffcnn.c:451 — an approximation of sigmoid(bs)*sigmoid(cs) that the
    reference relies on; NOT the darknet formula)
  * ``scale_x_y`` multiplies box w/h (ffcnn.c:459-460), unlike upstream
    darknet which applies it to x/y
  * class = argmax with first-max tie-breaking (the C ``cs < val`` scan)
  * candidate order = (row, col, anchor) scan order, heads in graph order

Boxes below ``ignore_thres`` get score 0 (the reference simply never appends
them, ffcnn.c:452); downstream NMS treats score-0 entries as absent.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..darknet.ir import Layer


def _argmax_max_packed(x):
    """Single-reduction (first-max argmax, max): pack each bf16 score and
    its inverted lane index into one uint32 key whose unsigned order equals
    (value, first-index) order, take ONE ``jnp.max``, unpack.  The value
    half uses the classic sign-magnitude -> total-order map (negative
    floats reverse), so raw (possibly negative) logits order correctly;
    ties hit equal value halves and the ``K-1-idx`` low half then picks the
    SMALLEST index — the reference's strictly-greater ``cs < val`` scan
    (ffcnn.c:447-450).  Exact bf16 value recovery (bit round-trip).
    -0.0 keys are canonicalized to +0.0 so exact ±0.0 ties break by index
    like the variadic reduce (ADVICE r4).  Remaining caveat: NaN keys rank
    by payload rather than poisoning the max (heads are NaN-free by the
    debug-nans invariant)."""
    k = x.shape[-1]
    b = lax.bitcast_convert_type(x, jnp.uint16).astype(jnp.uint32)
    b = jnp.where(b == jnp.uint32(0x8000), jnp.uint32(0), b)   # -0.0 -> +0.0
    t = jnp.where(b >= 0x8000, jnp.uint32(0xFFFF) - b, b + jnp.uint32(0x8000))
    idx = jnp.arange(k, dtype=jnp.uint32)
    best = jnp.max((t << 16) | (jnp.uint32(k - 1) - idx), axis=-1)
    cidx = (jnp.uint32(k - 1) - (best & jnp.uint32(0xFFFF)))
    vb = best >> 16
    vb = jnp.where(vb >= 0x8000, vb - jnp.uint32(0x8000),
                   jnp.uint32(0xFFFF) - vb).astype(jnp.uint16)
    val = lax.bitcast_convert_type(vb, jnp.bfloat16)
    return cidx.astype(jnp.float32), val.astype(jnp.float32)


def _argmax_max(x):
    """(first-max argmax, max) over the last axis, reducing in the head's
    native dtype (comparisons are exact in any float format; first-max
    tie-break matches the reference's ``cs < val`` scan, ffcnn.c:447-450).

    NOTE(axon): faster single-reduction formulations (packed uint32 keys via
    bitcast, and max → min-index-where-equal) used to WEDGE this image's
    TPU executor — any fusion combining a last-axis reduce with bit ops or
    a broadcast of another reduce's result livelocked the chip until the
    tunnel reset.  The 2026-08-19 toolchain FIXED both reproducers
    (tools/retest_backend_bugs.py --include-wedges), so the packed form is
    available again as ``FFCNN_ARGMAX=packed`` (bf16 heads only — parity's
    f32 heads keep the variadic reduce; measured A/B in
    docs/PERF_NOTES.md "packed argmax retry")."""
    from ..tuning import get_flag
    if (get_flag("FFCNN_ARGMAX", "variadic") == "packed"
            and x.dtype == jnp.bfloat16 and x.shape[-1] <= 0x8000):
        return _argmax_max_packed(x)
    return (jnp.argmax(x, axis=-1).astype(jnp.float32),
            jnp.max(x, axis=-1).astype(jnp.float32))


def head_planar_permutation(class_num: int, anchors: int = 3) -> np.ndarray:
    """Output-channel permutation turning a yolo head conv's
    ``[anchor-major: (tx ty tw th bs c0..c79) x3]`` layout into the
    decode-friendly planar ``[tx(3) ty(3) tw(3) th(3) bs(3) cls_a0(80)
    cls_a1(80) cls_a2(80)]`` layout: every decode field becomes ONE
    contiguous channel slice instead of three stride-85 picks.

    Permuting a conv's output channels (weights axis 3 + scale/bias) is a
    trace-time relabeling — each channel is computed identically, so the
    decoded result is bit-exact.  ``perm[new] = old``."""
    per = 5 + class_num
    perm = np.empty(anchors * per, np.int64)
    for k in range(5):
        for a in range(anchors):
            perm[k * anchors + a] = a * per + k
    base = 5 * anchors
    for a in range(anchors):
        for c in range(class_num):
            perm[base + a * class_num + c] = a * per + 5 + c
    return perm


class DecodedBoxes(NamedTuple):
    boxes: jnp.ndarray     # (N, M, 4) x1,y1,x2,y2 in net-input pixels
    scores: jnp.ndarray    # (N, M) confidence, 0 where below threshold
    classes: jnp.ndarray   # (N, M) float32 argmax class (integral values;
    #                        f32 at the source lets the convert fuse into
    #                        the argmax reduction instead of costing an
    #                        s32->f32 relayout in the NMS payload gather —
    #                        ~196 us/step at batch 256 on v5e.  NMSResult
    #                        re-casts the selected K to int32.)


def decode_head(feat, layer: Layer, net_w: int, net_h: int, *,
                planar: bool = False) -> DecodedBoxes:
    """feat: (N, h, w, 3*(5+classes)) raw conv output of a yolo head.

    The head is sliced BEFORE casting: the box/confidence channels (tiny
    slices) are lifted to f32 for the exp/sigmoid math, while the class-score
    argmax/max runs in the head's native dtype (comparisons are exact in any
    float format) — so the bulk (N,h,w,255) tensor is read once in bf16
    instead of being materialized as an f32 copy first.

    Three formulations (bit-identical; FFCNN_DECODE_IMPL overrides):
      * 'planar' (``planar=True``): the head conv's output channels were
        pre-permuted with :func:`head_planar_permutation`, so every field
        is ONE contiguous channel slice — tx = f[..., 0:3] etc. — and the
        per-anchor stacking (the source of the measured T(1,128) relayout
        copies at the 10x10 head) disappears entirely.
      * 'anchor-slice' (default): per-anchor lane-range slices of the FLAT
        channel axis — no (...,3,85) reshape, so all field reads + the
        class argmax can join one multi-output fusion over the head tensor.
      * 'reshape': reshape to (N,h,w,3,85) first; on TPU the 255→(3,85)
        lane retiling materializes a relayout copy (~67 us at the 10x10
        head, batch 256) before a separately-fused argmax."""
    import os
    n, h, w, _ = feat.shape
    nc = layer.class_num
    per = 5 + nc
    if planar:
        f32 = lambda v: v.astype(jnp.float32)
        tx, ty, tw, th, bs = (f32(feat[..., 3 * k: 3 * k + 3])
                              for k in range(5))          # (N, h, w, 3)
        am = [_argmax_max(feat[..., 15 + a * nc: 15 + (a + 1) * nc])
              for a in range(3)]
        cidx = jnp.stack([a for a, _ in am], axis=-1)
        cs = jnp.stack([c for _, c in am], axis=-1)
    elif os.environ.get("FFCNN_DECODE_IMPL", "anchor-slice") == "reshape":
        f = feat.reshape(n, h, w, 3, per)
        tx = f[..., 0].astype(jnp.float32)
        ty = f[..., 1].astype(jnp.float32)
        tw = f[..., 2].astype(jnp.float32)
        th = f[..., 3].astype(jnp.float32)
        bs = f[..., 4].astype(jnp.float32)
        cidx, cs = _argmax_max(f[..., 5:])
    else:
        fields = []
        for k in range(5):                      # tx, ty, tw, th, bs planes
            fields.append(jnp.stack(
                [feat[..., a * per + k] for a in range(3)],
                axis=-1).astype(jnp.float32))
        tx, ty, tw, th, bs = fields
        am = [_argmax_max(feat[..., a * per + 5: (a + 1) * per])
              for a in range(3)]
        cidx = jnp.stack([a for a, _ in am], axis=-1)
        cs = jnp.stack([c for _, c in am], axis=-1)

    conf = jnp.reciprocal(1.0 + jnp.exp(-bs) * (1.0 + jnp.exp(-cs)))
    conf = jnp.where(conf >= layer.ignore_thres, conf, 0.0)

    jj = jnp.asarray(np.arange(w, dtype=np.float32))[None, None, :, None]
    ii = jnp.asarray(np.arange(h, dtype=np.float32))[None, :, None, None]
    sig = lambda v: jnp.reciprocal(1.0 + jnp.exp(-v))
    cx = (jj + sig(tx)) * (net_w / w)
    cy = (ii + sig(ty)) * (net_h / h)
    anchors = np.asarray(layer.anchors, np.float32)          # (3, 2)
    bw = jnp.exp(tw) * (anchors[:, 0] * layer.scale_x_y)
    bh = jnp.exp(th) * (anchors[:, 1] * layer.scale_x_y)

    boxes = jnp.stack([cx - bw * 0.5, cy - bh * 0.5,
                       cx + bw * 0.5, cy + bh * 0.5], axis=-1)
    m = h * w * 3
    return DecodedBoxes(boxes.reshape(n, m, 4), conf.reshape(n, m),
                        cidx.reshape(n, m))


def decode_head_v8(feat, layer: Layer, net_w: int, net_h: int
                   ) -> DecodedBoxes:
    """Anchor-free YOLOv8 detect-head decode (extension; BASELINE
    configs[4] — no reference counterpart; semantics follow the public
    YOLOv8 formulation, implemented independently).

    ``feat``: (N, h, w, 4*reg_max + nc) — the converter's concat of the
    detect module's box branch (cv2: 4 sides x reg_max DFL logits) and
    class branch (cv3: nc logits).  Decode:

      * DFL: softmax over the reg_max bins of each side, expectation
        against bin indices 0..reg_max-1 → (l, t, r, b) distances in
        stride units.  The softmax/expectation runs in f32 on tiny
        (N,h,w,4,reg_max) slices; the bulk class tensor is reduced in its
        native dtype like the darknet decode.
      * anchor points at cell centers: (j+0.5, i+0.5) * stride.
      * confidence = sigmoid(max class logit); class = first-max argmax
        (no objectness term).  Scores below ``layer.ignore_thres`` (the
        cfg ``conf`` key, default 0.25) zero out, like the darknet head's
        ignore_thres gate.

    Boxes come out in net-input pixels, matching decode_head's convention
    so concat_heads / NMS / rescale compose unchanged."""
    n, h, w, _ = feat.shape
    nc = layer.class_num
    rm = layer.reg_max
    stride = layer.stride
    box = feat[..., :4 * rm].astype(jnp.float32).reshape(n, h, w, 4, rm)
    box = box - jax.scipy.special.logsumexp(box, axis=-1, keepdims=True)
    dist = jnp.sum(jnp.exp(box) * jnp.arange(rm, dtype=jnp.float32), axis=-1)
    cidx, cs = _argmax_max(feat[..., 4 * rm:])
    conf = jnp.reciprocal(1.0 + jnp.exp(-cs))
    conf = jnp.where(conf >= layer.ignore_thres, conf, 0.0)

    jj = jnp.asarray(np.arange(w, dtype=np.float32) + 0.5)[None, None, :]
    ii = jnp.asarray(np.arange(h, dtype=np.float32) + 0.5)[None, :, None]
    x1 = (jj - dist[..., 0]) * stride
    y1 = (ii - dist[..., 1]) * stride
    x2 = (jj + dist[..., 2]) * stride
    y2 = (ii + dist[..., 3]) * stride
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1)
    m = h * w
    return DecodedBoxes(boxes.reshape(n, m, 4), conf.reshape(n, m),
                        cidx.reshape(n, m))


def concat_heads(heads) -> DecodedBoxes:
    return DecodedBoxes(
        boxes=jnp.concatenate([h.boxes for h in heads], axis=1),
        scores=jnp.concatenate([h.scores for h in heads], axis=1),
        classes=jnp.concatenate([h.classes for h in heads], axis=1))


def arena_capacity(net_w: int, net_h: int, net_c: int) -> int:
    """The reference's bbox arena aliases the input blob (ffcnn.c:242-244):
    capacity = input bytes / sizeof(BBOX) with BBOX = {int type; float
    score, x1, y1, x2, y2} = 24 bytes (ffcnn.h:29-32)."""
    return (net_w * net_h * net_c * 4) // 24


def apply_arena_cap(decoded: DecodedBoxes, cap: int) -> DecodedBoxes:
    """Reference bbox-arena overflow semantics (ffcnn.c:461): once ``cap``
    above-threshold candidates have been appended, later ones are SILENTLY
    dropped — first-come priority in the (head, row, col, anchor) append
    order, NOT top-score.  ``decoded`` is already in that order, so the
    cutoff is a running count of above-threshold entries.

    A no-op (trace-time) when the model cannot overflow — e.g. the
    flagship emits at most 1,500 candidates against a 51,200 arena; tiny
    cfgs with big heads (ffcnn-micro: 3,264 vs 2,048) do overflow, and the
    C binary really does drop the tail (tools/c_differential.py)."""
    if decoded.scores.shape[1] <= cap:
        return decoded
    alive = (decoded.scores > 0).astype(jnp.int32)
    drop = jnp.cumsum(alive, axis=1) > cap
    return DecodedBoxes(boxes=decoded.boxes,
                        scores=jnp.where(drop, jnp.zeros_like(decoded.scores),
                                         decoded.scores),
                        classes=decoded.classes)
