"""On-device NMS under jit: top-k + masked greedy suppression.

The reference (ffcnn.c:298-335) qsorts candidates by score and greedily
suppresses later same-class boxes whose IoU — computed as
``intersection / min(area1, area2)`` when ``min=1`` (ffcnn.c:316) — exceeds
the threshold (strict ``>``), then rescales survivors to original-image
coordinates by ``s1/s2``.

Variable-length box lists don't exist under jit, so this runs on fixed-size
tensors: ``lax.top_k`` over all candidates (score 0 = absent), then a
``fori_loop`` greedy pass over the K slots with a (N, K) keep mask.  K bounds
the number of *above-threshold* candidates, not detections; with the
reference's 0.45 ignore threshold real frames produce tens of candidates, and
``K`` is configurable for denser scenes.  Survivors keep their sorted order,
so host-side output order matches the reference exactly.
"""

from __future__ import annotations


from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class NMSResult(NamedTuple):
    boxes: jnp.ndarray     # (N, K, 4) original-image pixel coords
    scores: jnp.ndarray    # (N, K), 0 for empty/suppressed slots
    classes: jnp.ndarray   # (N, K) int32
    count: jnp.ndarray     # (N,) int32 number of valid detections
    saturated: jnp.ndarray  # (N,) bool: above-threshold candidates > K, so
    #                         the top-k pass dropped some BEFORE suppression
    #                         and the result may diverge from unbounded NMS.
    #                         The C arena only drops past ~35k (ffcnn.c:243,
    #                         461-469); this flag makes the smaller K honest.


def _iou_min(box, others, kind: str = "min"):
    """IoU of ``box`` (..., 4) vs ``others`` (..., K, 4).

    ``kind='min'``: intersection / min(area) — the reference's quirk
    (ffcnn.c:308-317); degenerate 0/0 → NaN → compares False, like C.
    ``kind='union'``: the standard metric definition (used by the YOLOv8
    head's NMS, which follows the public formulation, not the quirk)."""
    x1 = jnp.maximum(box[..., None, 0], others[..., 0])
    y1 = jnp.maximum(box[..., None, 1], others[..., 1])
    x2 = jnp.minimum(box[..., None, 2], others[..., 2])
    y2 = jnp.minimum(box[..., None, 3], others[..., 3])
    inter = jnp.where((x1 < x2) & (y1 < y2), (x2 - x1) * (y2 - y1), 0.0)
    a1 = (box[..., 2] - box[..., 0]) * (box[..., 3] - box[..., 1])
    a2 = (others[..., 2] - others[..., 0]) * (others[..., 3] - others[..., 1])
    if kind == "union":
        return inter / (a1[..., None] + a2 - inter)
    return inter / jnp.minimum(a1[..., None], a2)


NMS_THRESHOLD_DEFAULT = 0.5  # the reference's hardcoded value (ffcnn.c:519)
V8_NMS_THRESHOLD = 0.7     # pure-YOLOv8 graphs: public default IoU


def v8_nms_threshold() -> float:
    """The union-IoU threshold for pure-v8 graphs (env/tuned-overridable
    via FFCNN_V8_NMS_IOU) — ONE policy shared by the single-chip (net.py),
    DP and PP pipelines so they cannot drift apart."""
    from ..tuning import get_flag
    return float(get_flag("FFCNN_V8_NMS_IOU", str(V8_NMS_THRESHOLD)))


def _keep_mask_scan(top_boxes, top_scores, top_classes, k, threshold,
                    iou_kind="min"):
    """Greedy scan as a fori_loop of XLA programs (portable, K dispatches)."""
    slot = jnp.arange(k)

    def body(i, keep):
        anchor_ok = keep[:, i] & (top_scores[:, i] > 0)       # (N,)
        iou = _iou_min(top_boxes[:, i], top_boxes, iou_kind)  # (N, K)
        same_cls = top_classes == top_classes[:, i][:, None]
        suppress = (anchor_ok[:, None] & same_cls & (slot > i)[None, :]
                    & (iou > threshold))
        return keep & ~suppress

    return lax.fori_loop(0, k, body, top_scores > 0)


def _keep_mask_sweep(top_boxes, top_scores, top_classes, k, threshold,
                     iou_kind="min"):
    """Greedy NMS by fixpoint iteration — EXACTLY the sequential result.

    The greedy recurrence ``keep[j] = score[j]>0 ∧ ¬∃i<j: keep[i] ∧ sup[i,j]``
    has a unique solution (strong induction on j), so iterating the whole-
    vector map to a fixpoint yields the sequential answer.  Each sweep fixes
    at least one more prefix position, so the while_loop is bounded by K
    sweeps and in practice converges in a handful; each sweep is one batched
    (K)×(K,K) masked matvec — no per-candidate dispatch chain.
    """
    iou = _iou_min(top_boxes, top_boxes[:, None], iou_kind)   # (N, K, K)
    same_cls = top_classes[:, :, None] == top_classes[:, None, :]
    tri = jnp.tril(jnp.ones((k, k), jnp.bool_), k=-1)         # i < j (col j)
    sup = (iou > threshold) & same_cls & tri.T[None]          # (N, K, K)
    alive0 = (top_scores > 0)

    def sweep(keep):
        # Broadcast-any rather than dot_general: a batched matvec inside
        # while_loop wedges the Mosaic/XLA TPU compile in this stack.
        suppressed = jnp.any(keep[:, :, None] & sup, axis=1)
        return alive0 & ~suppressed

    def cond(state):
        keep, done = state
        return ~done

    def body(state):
        # NOTE(perf): one sweep per trip.  A 2-sweeps-per-trip variant (to
        # amortize the cond) was measured SLOWER in-net on v5e — the extra
        # sweep costs more than the loop overhead it saves (device trace:
        # while+sweep fusions 118us -> 466us).  Don't redo it.
        keep, _ = state
        new = sweep(keep)
        return new, jnp.array_equal(new, keep)

    keep, _ = lax.while_loop(cond, body, (alive0, jnp.asarray(False)))
    return keep


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def nms(boxes, scores, classes, *, k: int = 128, threshold: float = 0.5,
        scale1: int = 1, scale2: int = 1, impl: str = "auto",
        iou_kind: str = "min") -> NMSResult:
    """boxes (N, M, 4), scores (N, M) with 0 = absent, classes (N, M).

    ``impl`` selects how the greedy recurrence is evaluated — all three give
    bit-identical keep masks:
      * 'sweep' (default): fixpoint sweeps of batched masked matvecs
      * 'scan':   K-step fori_loop (one dispatch per candidate)
      * 'pallas': whole scan inside one on-chip kernel (kernels/nms_pallas.py)

    ``iou_kind``: 'min' = the reference's inter/min(area) quirk (default);
    'union' = the standard metric (YOLOv8 heads).  The pallas kernel only
    implements 'min'; 'union' falls back to 'sweep'/'scan'.
    """
    n, m, _ = boxes.shape
    k = min(k, m)
    # Candidate census BEFORE truncation: the reference NMS-es every
    # above-threshold box (arena capacity ~35k, ffcnn.c:243); if more than K
    # exist here, top-k silently drops the tail — flag it so callers can
    # retry with a bigger K (Net.detect does, in parity mode) or warn.
    saturated = jnp.sum(scores > 0, axis=1) > k
    # Top-k selection impl (FFCNN_TOPK_IMPL overrides; all bit-identical —
    # tests/test_nms_impls.py):
    #   'onehot' (default): approx_max_k (exact at recall_target=1.0) +
    #       one-hot MXU-dot payload gather.  In-net device totals at
    #       (256,1500)->128 on v5e: 5779 us/step.
    #   'sort':   one stable multi-operand sort carrying the payload
    #       (6088 us/step — the 6-wide sort costs more than the dot).
    #   'gather': approx_max_k + take_along_axis, which lowers to
    #       scalar-core gathers: 6229 us/step, 587 us in the gathers alone.
    import os
    topk_impl = os.environ.get("FFCNN_TOPK_IMPL", "onehot")
    if topk_impl == "onehot":
        top_scores, idx = lax.approx_max_k(scores, k, recall_target=1.0)
        onehot = (idx[..., None] == jnp.arange(m)[None, None, :]
                  ).astype(jnp.float32)                        # (N, K, M)
        # (An (N, 5, M) plane-stacked payload was also measured: 5828 vs
        # 5774 us/step — decode's per-anchor T(1,128) layouts dominate
        # either way, so keep the simpler concat.)
        payload = jnp.concatenate(
            [boxes, classes[..., None].astype(jnp.float32)], axis=-1)
        # one-hot rows pick exactly one element, so with full f32 operand
        # precision the dot IS an exact gather: Precision.HIGHEST splits the
        # f32 payload into bf16 passes that reconstruct all 24 mantissa
        # bits, and the single 1.0 coefficient adds no rounding.  (Default
        # precision demotes to one bf16 pass — measured ±1 px box drift,
        # which broke the parity gate.)
        picked = jax.vmap(lambda o, p: lax.dot_general(
            o, p, (((1,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32))(onehot, payload)
        top_boxes = picked[..., :4]
        top_classes = picked[..., 4].astype(jnp.int32)
    elif topk_impl == "gather":
        top_scores, idx = lax.approx_max_k(scores, k, recall_target=1.0)
        top_boxes = jnp.take_along_axis(boxes, idx[..., None], axis=1)
        top_classes = jnp.take_along_axis(classes, idx,
                                          axis=1).astype(jnp.int32)
    else:
        # One stable multi-operand sort carries the payload (box coords +
        # class) alongside the key, so no post-sort gather is needed at all.
        # Descending order via the negated key (negation is exact; score-0
        # "absent" slots stay 0 through -0.0 round-trip).  Stable sort keeps
        # equal-score candidates in (row, col, anchor) scan order — the
        # same order the C reference feeds qsort (ffcnn.c:291-302).
        neg_s, bx1, by1, bx2, by2, top_classes = lax.sort(
            (-scores, boxes[..., 0], boxes[..., 1], boxes[..., 2],
             boxes[..., 3], classes),
            dimension=1, is_stable=True, num_keys=1)
        top_scores = -neg_s[:, :k]
        top_boxes = jnp.stack([bx1[:, :k], by1[:, :k],
                               bx2[:, :k], by2[:, :k]], axis=-1)
        top_classes = top_classes[:, :k].astype(jnp.int32)

    if impl == "auto":
        # Measured on v5e (in-net device totals, real frames, batch 256):
        # at K=128 'scan' beats 'sweep' by ~108us/step (6252 vs 6360 us
        # total; reproducible) — the sweep's (N,K,K) suppression matrix
        # costs more than 128 tiny fori steps at real candidate densities.
        # At large K (parity auto-topk grows K to the full candidate set)
        # the K-step scan chain loses badly, so 'sweep' takes over.
        # 'pallas' measured slowest at production shapes (2123 vs 1816 us
        # on a dense synthetic) and is kept as a tested alternative only.
        # FFCNN_NMS_IMPL overrides for experiments.
        import os
        impl = os.environ.get("FFCNN_NMS_IMPL",
                              "scan" if k <= 128 else "sweep")
    if impl == "pallas" and iou_kind != "min":
        impl = "sweep"
    if impl == "pallas":
        from ..kernels.nms_pallas import nms_keep_mask
        keep = nms_keep_mask(top_boxes, top_scores, top_classes,
                             k=k, threshold=threshold,
                             interpret=not _on_tpu()) > 0.5
    elif impl == "sweep":
        keep = _keep_mask_sweep(top_boxes, top_scores, top_classes, k,
                                threshold, iou_kind)
    else:
        keep = _keep_mask_scan(top_boxes, top_scores, top_classes, k,
                               threshold, iou_kind)

    rescale = jnp.float32(scale1) / jnp.float32(scale2)       # ffcnn.c:327
    out_scores = jnp.where(keep, top_scores, 0.0)
    return NMSResult(boxes=top_boxes * rescale,
                     scores=out_scores,
                     classes=top_classes,
                     count=jnp.sum(keep, axis=1).astype(jnp.int32),
                     saturated=saturated)
