"""Pipeline-parallel inference over a ``pipe`` mesh axis.

The reference is a single sequential forward walk (net_forward,
ffcnn.c:476-520); its only scaling story is "run it again".  DP (dp.py)
covers the throughput axis.  This module adds the remaining classic axis —
**pipeline parallelism**: the layer list is split into S contiguous stages,
stage s lives on the device at ``pipe`` coordinate s, and M microbatches
stream through the ring GPipe-style (S + M - 1 ticks; bubble fraction
(S-1)/(S+M-1)).  Boundary activations hop stage→stage over ICI with a
single ``ppermute`` shift per tick.

Why this shape: an SPMD program must be identical on every device, but CNN
stages are heterogeneous (different layers, different blob shapes).  Both
problems are solved at trace time:

  * every device runs ``lax.switch(stage_index, branches…)`` — XLA compiles
    all S stage bodies into the one program and each device executes only
    its own branch;
  * boundary blobs (the *live set* at each cut: the direct input plus any
    blob a later shortcut/route still needs, e.g. blob 81 crossing to
    route layer 124 in yolo-fastest) are packed into one flat (mb, Z)
    buffer, zero-padded to the largest cut, so every branch has the same
    wire type.

Stage 0 additionally runs the on-device letterbox; the partitioner keeps
every YOLO layer in the last stage, which runs decode + NMS and writes the
finished microbatch result.  Results are gathered with a masked ``psum``
(only the last stage contributes).

Measured characterization (tools/bench_pp.py, 8-device CPU sim, S=4,
160x160, mb=8, 2026-08-19): step time scales with the GPipe schedule —
implied ticks 5.6 / 7.7 / 17.2 at M=4/8/16 against the predicted
S+M-1 = 7 / 11 / 19 (and nowhere near the S*M serial alternative), with
the theoretical bubble fractions 3/7, 3/11, 3/19 amortizing as M grows.
On that sim mesh PP (S=4, data=2, M=8) actually edged out pure DP-8 at
equal images/step (11.4 vs 9.9 img/s) — host cache effects favor the
smaller per-stage programs.

Real-chip stage-body truth (tools/pp_stage_device.py, TPU v5e, 320x320,
mb=32, S=4, fori_loop-chained, 2026-08-19): per-stage ticks
3.54 / 2.13 / 1.83 / 4.42 ms, sum 11.92 ms vs the UNCUT same-path f32
monolith 4.72 ms — **+152% cut overhead** from boundary-blob
materialization + wire pack/unpack alone (ppermute wire time excluded;
the stage-0 cut ships 32.8 MB per microbatch), and the production
fast-mode program runs the same 32 images in 2.15 ms device time
(PERF_NOTES "Latency ladder").  So on real TPU, DP is the deployment
default by ~5.5x for darknet-scale models (no bubble, no wire traffic,
and DP runs the fused-Pallas bf16 single-chip program which PP stage
bodies don't) — now measured, not inferred.
PP exists for graphs whose per-stage footprint or latency budget exceeds
one chip, and it composes with DP on a (data, pipe) mesh — the
microbatch dim shards over ``data`` while stages split over ``pipe``.
Stage bodies trace the plain XLA path (no fused Pallas runs, no int8
plan — the per-chip-fastest single-program deployment is build_dp_pipeline;
see its docstring).  Numerics are pinned to the single-device pipeline by
tests/test_pp.py.
"""

from __future__ import annotations

import dataclasses
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..darknet.ir import LayerType, NetIR
from ..graph.build import forward_features
from ..ops.nms import NMS_THRESHOLD_DEFAULT, nms, v8_nms_threshold
from ..ops.preprocess import letterbox, letterbox_params
from ..ops.yolo import (apply_arena_cap, arena_capacity, concat_heads,
                        decode_head, decode_head_v8)
from .mesh import DATA_AXIS, PIPE_AXIS


@dataclasses.dataclass(frozen=True)
class Stage:
    """Layers [start, stop) plus the blob sets crossing each boundary."""
    start: int
    stop: int
    live_in: Tuple[int, ...]    # blob indices this stage reads from the wire
    live_out: Tuple[int, ...]   # blob indices it must forward downstream


def _blob_consumers(ir: NetIR) -> Dict[int, List[int]]:
    """blob index -> layer indices that read it (mirrors run_layer's reads:
    every layer consumes its direct input blob except ROUTE, which reads
    only its listed sources; SHORTCUT also reads its `from` blob)."""
    cons: Dict[int, List[int]] = defaultdict(list)
    for li, l in enumerate(ir.layers):
        if l.type == LayerType.ROUTE:
            for d in l.depends:
                cons[d + 1].append(li)
        else:
            cons[li].append(li)
            if l.type == LayerType.SHORTCUT:
                cons[l.depends[0] + 1].append(li)
    return cons


def _live_at(ir: NetIR, cut: int, cons: Dict[int, List[int]]
             ) -> Tuple[int, ...]:
    """Blobs produced before layer `cut` and read at/after it."""
    return tuple(sorted(bi for bi, users in cons.items()
                        if bi <= cut and any(li >= cut for li in users)))


def plan_stages(ir: NetIR, n_stages: int, *, microbatch: int = 1,
                dtype: str = "bf16") -> List[Stage]:
    """Split the layer list into ``n_stages`` contiguous stages balanced by
    the static roofline floor (roofline.layer_costs — max of each layer's
    HBM and MXU bound), with every YOLO layer constrained into the last
    stage so decode/NMS need no cross-stage head collection.

    Minimizes the max per-stage floor over all valid cut vectors (exact
    O(n²·S) linear-partition DP — n is a layer count, so cheap)."""
    n = len(ir.layers)
    yolos = [li for li, l in enumerate(ir.layers)
             if l.type in (LayerType.YOLO, LayerType.YOLOV8)]
    if not yolos:
        raise ValueError("pipeline planning needs at least one yolo head")
    last_cut_max = min(yolos)
    if not (1 <= n_stages <= last_cut_max + 1):
        raise ValueError(
            f"n_stages={n_stages} out of range for {n} layers with first "
            f"yolo at {min(yolos)}")
    from .. import roofline
    costs = [c.floor_us() for c in
             roofline.layer_costs(ir, microbatch, dtype=dtype)]
    # DP: best[k][i] = minimal max-stage-cost partitioning layers [0, i)
    # into k stages; prefix[i] = sum(costs[:i]).
    prefix = [0.0]
    for c in costs:
        prefix.append(prefix[-1] + c)
    INF = float("inf")
    best = [[INF] * (n + 1) for _ in range(n_stages + 1)]
    arg = [[0] * (n + 1) for _ in range(n_stages + 1)]
    best[0][0] = 0.0
    for k in range(1, n_stages + 1):
        lo = k                      # every stage takes >= 1 layer
        hi = n if k < n_stages else n
        for i in range(lo, hi + 1):
            if k == n_stages and i != n:
                continue
            # last group = [j, i); for the final stage j <= last_cut_max
            for j in range(k - 1, i):
                if k == n_stages and j > last_cut_max:
                    break
                v = max(best[k - 1][j], prefix[i] - prefix[j])
                if v < best[k][i]:
                    best[k][i], arg[k][i] = v, j
    if best[n_stages][n] == INF:
        raise ValueError("no valid stage partition")
    cuts = [n]
    for k in range(n_stages, 0, -1):
        cuts.append(arg[k][cuts[-1]])
    cuts = cuts[::-1]               # [0, c1, ..., n]
    cons = _blob_consumers(ir)
    stages = []
    for s in range(n_stages):
        live_in = _live_at(ir, cuts[s], cons) if s else ()
        live_out = (_live_at(ir, cuts[s + 1], cons)
                    if s + 1 < n_stages else ())
        stages.append(Stage(cuts[s], cuts[s + 1], live_in, live_out))
    return stages


def _wire_floats(ir: NetIR, blobs: Sequence[int]) -> int:
    return sum(ir.blobs[bi].numel() for bi in blobs)


def _pack(vals: Dict[int, jnp.ndarray], order: Sequence[int], mb: int,
          width: int, dtype) -> jnp.ndarray:
    parts = [vals[bi].astype(dtype).reshape(mb, -1) for bi in order]
    flat = (jnp.concatenate(parts, axis=1) if parts
            else jnp.zeros((mb, 0), dtype))
    pad = width - flat.shape[1]
    return jnp.pad(flat, ((0, 0), (0, pad))) if pad else flat


def _unpack(buf: jnp.ndarray, order: Sequence[int], ir: NetIR, mb: int,
            dtype) -> Dict[int, jnp.ndarray]:
    out, off = {}, 0
    for bi in order:
        b = ir.blobs[bi]
        nel = b.numel()
        out[bi] = buf[:, off:off + nel].reshape(mb, b.h, b.w, b.c) \
            .astype(dtype)
        off += nel
    return out


def build_pp_pipeline(ir: NetIR, params, mesh: Mesh, img_h: int, img_w: int,
                      *, n_microbatches: int, dtype=jnp.float32,
                      precision=None, topk: int = 128,
                      nms_threshold: float = None,
                      mean=(0.0, 0.0, 0.0),
                      norm=(1 / 255.0, 1 / 255.0, 1 / 255.0),
                      stages: Optional[List[Stage]] = None):
    """Jitted ``(uint8 images (N, img_h, img_w, 3)) -> NMSResult`` running
    the graph pipeline-parallel over the mesh ``pipe`` axis (stages) and
    data-parallel over ``data`` (microbatch images), N = n_microbatches ×
    microbatch size.  ``params``: the params_to_pytree dict (baked into the
    trace as constants, like the single-chip pipeline)."""
    if PIPE_AXIS not in mesh.shape:
        raise ValueError("mesh has no 'pipe' axis — build it with "
                         "make_mesh(..., pipeline_parallel=S)")
    S = mesh.shape[PIPE_AXIS]
    ndata = mesh.shape.get(DATA_AXIS, 1)
    M = n_microbatches
    net_w, net_h = ir.blobs[0].w, ir.blobs[0].h
    _, _, s1, s2 = letterbox_params(img_w, img_h, net_w, net_h)
    heads_meta = [l for l in ir.layers
                  if l.type in (LayerType.YOLO, LayerType.YOLOV8)]
    if nms_threshold is None:
        # same policy as net.py / dp.py: the 0.5 min-IoU reference quirk
        # for darknet-head graphs, FFCNN_V8_NMS_IOU (default 0.7, union)
        # for pure-v8 graphs
        nms_threshold = NMS_THRESHOLD_DEFAULT \
            if any(l.type == LayerType.YOLO for l in heads_meta) \
            else v8_nms_threshold()
    if stages is None:
        stages = plan_stages(ir, S, dtype="f32" if dtype == jnp.float32
                             else "bf16")
    assert len(stages) == S
    width = max(_wire_floats(ir, st.live_out) for st in stages)

    def mk_stage(s: int, zero_res=None):
        st = stages[s]

        def fn(buf, imgs_t):
            if s == 0:
                x = letterbox(imgs_t, net_w, net_h, mean, norm, dtype=dtype)
                heads, out = forward_features(
                    ir, params, x, precision=precision, input_dtype=dtype,
                    start=0, stop=st.stop, keep_blobs=list(st.live_out))
            else:
                blobs_in = _unpack(buf, st.live_in, ir, imgs_t.shape[0],
                                   dtype)
                heads, out = forward_features(
                    ir, params, None, precision=precision,
                    input_dtype=dtype, start=st.start, stop=st.stop,
                    blobs_in=blobs_in, keep_blobs=list(st.live_out))
            mb = imgs_t.shape[0]
            if s == S - 1:
                d = concat_heads([
                    decode_head_v8(f.astype(jnp.float32), l, net_w, net_h)
                    if l.type == LayerType.YOLOV8 else
                    decode_head(f.astype(jnp.float32), l, net_w, net_h)
                    for f, l in zip(heads, heads_meta)])
                if any(l.type == LayerType.YOLO for l in heads_meta):
                    d = apply_arena_cap(
                        d, arena_capacity(net_w, net_h, ir.blobs[0].c))
                    kind = "min"
                else:
                    kind = "union"   # pure-v8: standard IoU (net.py policy)
                res = nms(d.boxes, d.scores, d.classes, k=topk,
                          threshold=nms_threshold, scale1=s1, scale2=s2,
                          iou_kind=kind)
                return jnp.zeros((mb, width), dtype), res
            return _pack(out, st.live_out, mb, width, dtype), zero_res

        return fn

    def body(imgs):
        # imgs: (M, mb_local, H, W, 3) uint8 — this device's data shard,
        # replicated over 'pipe'.
        mb = imgs.shape[1]
        last_fn = mk_stage(S - 1)
        res_sds = jax.eval_shape(
            last_fn, jax.ShapeDtypeStruct((mb, width), dtype),
            jax.ShapeDtypeStruct(imgs.shape[1:], imgs.dtype))[1]
        zero_res = jax.tree.map(
            lambda t: jnp.zeros(t.shape, t.dtype), res_sds)
        branches = [mk_stage(s, zero_res) for s in range(S - 1)] + [last_fn]
        sidx = lax.axis_index(PIPE_AXIS)
        acc0 = jax.tree.map(
            lambda t: jnp.zeros((M,) + t.shape, t.dtype), res_sds)
        buf0 = jnp.zeros((mb, width), dtype)
        perm = [(i, (i + 1) % S) for i in range(S)]

        def tick(carry, t):
            buf, acc = carry
            img_t = lax.dynamic_index_in_dim(
                imgs, jnp.clip(t, 0, M - 1), axis=0, keepdims=False)
            out_buf, res = lax.switch(sidx, branches, buf, img_t)
            m = t - (S - 1)
            valid = (m >= 0) & (m < M) & (sidx == S - 1)
            mc = jnp.clip(m, 0, M - 1)
            acc = jax.tree.map(
                lambda a, r: a.at[mc].set(jnp.where(valid, r, a[mc])),
                acc, res)
            if S > 1:
                out_buf = lax.ppermute(out_buf, PIPE_AXIS, perm)
            return (out_buf, acc), None

        (_, acc), _ = lax.scan(tick, (buf0, acc0),
                               jnp.arange(M + S - 1))

        def collect(a):
            # only the last stage holds real results; psum the masked tree
            x = jnp.where(sidx == S - 1, a, jnp.zeros_like(a))
            if x.dtype == jnp.bool_:
                return lax.psum(x.astype(jnp.int32), PIPE_AXIS) > 0
            return lax.psum(x, PIPE_AXIS)

        return jax.tree.map(collect, acc)

    try:
        shard_map = jax.shard_map
        kw = {"check_vma": False}
    except AttributeError:                       # older jax
        from jax.experimental.shard_map import shard_map
        kw = {"check_rep": False}
    smapped = shard_map(body, mesh=mesh,
                        in_specs=(P(None, DATA_AXIS),),
                        out_specs=P(None, DATA_AXIS), **kw)

    @jax.jit
    def run(images):
        n = images.shape[0]
        assert n % M == 0, (n, M)
        mb = n // M
        assert mb % ndata == 0, (mb, ndata)
        res = smapped(images.reshape((M, mb) + images.shape[1:]))
        return jax.tree.map(
            lambda a: a.reshape((n,) + a.shape[2:]), res)

    return run
