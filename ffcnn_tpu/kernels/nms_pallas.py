"""Pallas TPU kernel for greedy NMS.

The XLA path (ops/nms.py) expresses the greedy scan as a ``lax.fori_loop``
whose K iterations each launch a tiny program — at K=128 the dispatch
overhead dominates (~1.8 ms at batch 256).  Here the entire scan runs inside
ONE kernel: the (K, K) suppression matrix is built with full-lane VPU ops in
VMEM, then the sequential greedy recurrence (the same semantics as the
reference's qsort+suppress loop, ffcnn.c:298-322: strict ``iou > thr``,
IoU-over-min-area, same-class only, score-descending order) walks K steps of
(BT, K) vector ops without ever leaving VMEM.

Layout: boxes arrive as (N, 4, K) so the K candidates sit on the 128-wide
lane dimension; a batch tile of BT images rides the sublane dimension.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(boxes_ref, scores_ref, classes_ref, keep_ref, sup_ref, *,
                k, threshold):
    x1 = boxes_ref[:, 0, :]                                   # (BT, K)
    y1 = boxes_ref[:, 1, :]
    x2 = boxes_ref[:, 2, :]
    y2 = boxes_ref[:, 3, :]
    scores = scores_ref[:, :]                                 # (BT, K)
    classes = classes_ref[:, :]                               # (BT, K) int32

    # (K, BT, K) suppression tensor sup[i, b, j]: does kept box i suppress
    # box j in image b?  Anchor index i leads so the greedy loop can read
    # row i with a plain dim-0 dynamic ref index.
    def anchor_lead(v):                                       # (BT,K)→(K,BT,1)
        return jnp.transpose(v, (1, 0))[:, :, None]

    ix1 = jnp.maximum(anchor_lead(x1), x1[None])              # (K, BT, K)
    iy1 = jnp.maximum(anchor_lead(y1), y1[None])
    ix2 = jnp.minimum(anchor_lead(x2), x2[None])
    iy2 = jnp.minimum(anchor_lead(y2), y2[None])
    inter = jnp.where((ix1 < ix2) & (iy1 < iy2),
                      (ix2 - ix1) * (iy2 - iy1), 0.0)
    area = (x2 - x1) * (y2 - y1)                              # (BT, K)
    min_area = jnp.minimum(anchor_lead(area), area[None])
    # 0/0 → NaN compares False, matching the C float compare (ffcnn.c:316).
    iou = inter / min_area
    same = anchor_lead(classes) == classes[None]
    jj = jax.lax.broadcasted_iota(jnp.int32, (k, 1, k), 2)
    ii = jax.lax.broadcasted_iota(jnp.int32, (k, 1, k), 0)
    sup_ref[:, :, :] = jnp.where((iou > threshold) & same & (jj > ii),
                                 1.0, 0.0)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)     # (1, K)

    def body(i, keep):
        # keep[:, i] without a lane-dim dynamic slice: mask + lane reduce.
        alive = jnp.max(jnp.where(lane == i, keep, 0.0), axis=1,
                        keepdims=True)                        # (BT, 1)
        row = sup_ref[i]                                      # (BT, K)
        return jnp.where((alive > 0.5) & (row > 0.5), 0.0, keep)

    keep = jax.lax.fori_loop(0, k, body, (scores > 0).astype(jnp.float32))
    keep_ref[:, :] = keep


@functools.partial(jax.jit, static_argnames=("k", "threshold", "interpret"))
def nms_keep_mask(boxes, scores, classes, *, k: int, threshold: float,
                  interpret: bool = False):
    """boxes (N, K, 4) f32, scores (N, K) f32 (0 = absent, sorted desc),
    classes (N, K) int32 → keep mask (N, K) f32 in {0, 1}."""
    n = boxes.shape[0]
    bt = 8 if n % 8 == 0 else (4 if n % 4 == 0 else 1)
    boxes_t = jnp.transpose(boxes, (0, 2, 1))                  # (N, 4, K)
    grid = (n // bt,)
    kernel = functools.partial(_nms_kernel, k=k, threshold=float(threshold))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, 4, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, k), jnp.float32),
        scratch_shapes=[pltpu.VMEM((k, bt, k), jnp.float32)],
        interpret=interpret,
    )(boxes_t, scores.astype(jnp.float32), classes.astype(jnp.int32))
