"""Fused inverted-residual block kernel: pw-expand -> dw3x3 -> pw-project
(+ residual), one Pallas launch per run of blocks, expand intermediates
never touch HBM.

WHY: the backbone stages run at the HBM bound of per-layer materialization
— XLA fuses each conv's epilogue but still round-trips every expand blob
(e.g. 256x20x20x136 bf16 = 28 MB) through HBM.  The reference's analog is
conv-v6's fused fast paths (conv-v6.c:46-465): same 1x1 + depthwise-3x3
ops, fused there for cache locality, fused here for HBM traffic.

LAYOUT (the part that makes it work on TPU): ``(H, C, W*N)`` — channels on
sublanes, width x batch on lanes.  With batch a multiple of 128, the dw
taps' spatial shifts are *lane-tile-aligned* slices (dx -> +-N lanes,
dy -> row indexing), needing none of the 32-bit-only lane rotates that
killed the round-1 channels-first attempt (docs/PERF_NOTES.md).  The two
pw convs are MXU ``dot_general``s contracting C on sublanes.  A plain NHWC
blocked variant was measured 3-20x SLOWER than XLA (C<128 lane padding
starves the VPU) — that negative result lives in docs/PERF_NOTES.md.

Measured (v5e, batch 256, vs the XLA conv chain): 1.8x at 20x20/C24/E136,
1.5x at 10x10/C48/E224; C<=16 stages lose (bf16 sublane padding) and stay
on XLA — ``MIN_CHANNELS`` gates integration.

Halo: two extra single-row BlockSpecs per step (index maps clamp at the
edges); the dw's zero padding is applied to the pw-expand OUTPUT at the
true image boundary (pw1 of a zero row is act(bias), not zero).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..darknet.ir import LayerType, NetIR
from ..ops.activations import activate

# Stage gate: blocks whose input channel count is below this run faster on
# the XLA path (bf16 sublane padding at C<=16 eats the fusion win; A/B
# measured on v5e — see module docstring).
MIN_CHANNELS = 24
# Batch must be lane-tile aligned so dw shifts are tile-aligned lane slices.
BATCH_QUANTUM = 128


@dataclasses.dataclass(frozen=True)
class FusedBlock:
    """One fusable [pw 1x1, dw 3x3 s1|s2, pw 1x1 (, dropout, shortcut)]
    run.  ``start``: index of the expand conv; ``end``: index of the last
    fused layer (project conv or shortcut); ``residual``: add the block
    input; ``down``: the dw is stride 2 (a stage-transition block — halves
    H and W, never residual)."""
    start: int
    end: int
    residual: bool
    res_act: int            # shortcut activation (linear in yolo-fastest)
    down: bool = False


@dataclasses.dataclass(frozen=True)
class FusedRun:
    """Consecutive FusedBlocks sharing one layout round-trip."""
    start: int
    end: int
    blocks: Tuple[FusedBlock, ...]


def find_fused_blocks(ir: NetIR) -> Dict[int, FusedBlock]:
    """Locate fusable triples whose intermediate blobs have no consumers
    outside the block (so eliminating them is safe)."""
    layers = ir.layers
    # Blobs referenced by route/shortcut `depends` — the only way a blob is
    # read outside the sequential layer chain.
    referenced = set()
    for l in layers:
        if l.type in (LayerType.ROUTE, LayerType.SHORTCUT):
            referenced.update(d + 1 for d in l.depends)

    out: Dict[int, FusedBlock] = {}
    li = 0
    while li + 2 < len(layers):
        a, b, c = layers[li], layers[li + 1], layers[li + 2]
        ok = (a.type == LayerType.CONV and a.fs == 1 and a.stride == 1
              and a.groups == 1
              and b.type == LayerType.CONV and b.fs == 3
              and b.stride in (1, 2)
              and b.groups == a.fn and b.fn == a.fn and b.pad == 1
              and c.type == LayerType.CONV and c.fs == 1 and c.stride == 1
              and c.groups == 1)
        if not ok:
            li += 1
            continue
        if b.stride == 2:
            # Stage-transition block: [pw expand, dw3x3 s2, pw project] —
            # halves H and W (never residual: dims change).  The kernel's
            # strided W taps need even input dims (guaranteed at backbone
            # depths by ALIGN-32, checked anyway).
            if (ir.blobs[li].w % 2 == 0 and ir.blobs[li].h % 2 == 0
                    and not referenced & {li + 1, li + 2}):
                out[li] = FusedBlock(start=li, end=li + 2, residual=False,
                                     res_act=0, down=True)
                li += 3
            else:
                li += 1
            continue
        # residual variant: [triple, dropout, shortcut(from=block input)];
        # internal blobs li+1..li+4 must not be route/shortcut sources
        if (li + 4 < len(layers)
                and layers[li + 3].type == LayerType.DROPOUT
                and layers[li + 4].type == LayerType.SHORTCUT
                and layers[li + 4].depends[0] + 1 == li        # adds block in
                and ir.blobs[li].c == c.fn
                and not referenced & {li + 1, li + 2, li + 3, li + 4}):
            out[li] = FusedBlock(start=li, end=li + 4, residual=True,
                                 res_act=layers[li + 4].activation)
            li += 5
            continue
        if not referenced & {li + 1, li + 2}:   # plain triple
            out[li] = FusedBlock(start=li, end=li + 2, residual=False,
                                 res_act=0)
            li += 3
            continue
        li += 1
    return out


def plan_runs(ir: NetIR, min_channels: Optional[int] = None,
              allow_down: Optional[bool] = None) -> List[FusedRun]:
    """Group eligible blocks into maximal consecutive runs sharing one
    layout round-trip.  A block joins only when its input blob has
    >= min_channels channels (the measured XLA/kernel crossover).  Two
    adjacent blocks chain when the boundary blob between them is referenced
    ONLY from inside the second block (its own residual shortcut — which
    the kernel satisfies internally); any outside reference forces the
    boundary blob to materialize, ending the run there.

    ``allow_down`` (env FFCNN_FUSED_DOWN, default off): also admit
    stride-2 stage-transition blocks, so runs span whole backbone REGIONS
    — one layout round-trip across several stages (the round-2 C<=16
    measurements paid the round-trip per stage; VERDICT r3 #1a)."""
    from ..tuning import get_flag
    if min_channels is None:
        min_channels = int(get_flag("FFCNN_FUSED_MINC", str(MIN_CHANNELS)))
    if allow_down is None:
        allow_down = get_flag("FFCNN_FUSED_DOWN", "0") == "1"
    blocks = find_fused_blocks(ir)
    eligible = [b for s, b in sorted(blocks.items())
                if ir.blobs[b.start].c >= min_channels
                and (allow_down or not b.down)]
    ref_layers: Dict[int, List[int]] = {}
    for li, l in enumerate(ir.layers):
        if l.type in (LayerType.ROUTE, LayerType.SHORTCUT):
            for d in l.depends:
                ref_layers.setdefault(d + 1, []).append(li)

    def chainable(prev: FusedBlock, nxt: FusedBlock) -> bool:
        if prev.end + 1 != nxt.start:
            return False
        boundary = prev.end + 1              # == nxt.start (its input blob)
        return all(nxt.start <= li <= nxt.end
                   for li in ref_layers.get(boundary, []))

    runs: List[FusedRun] = []
    cur: List[FusedBlock] = []
    for b in eligible:
        if cur and chainable(cur[-1], b):
            cur.append(b)
        else:
            if cur:
                runs.append(FusedRun(cur[0].start, cur[-1].end, tuple(cur)))
            cur = [b]
    if cur:
        runs.append(FusedRun(cur[0].start, cur[-1].end, tuple(cur)))
    return runs


def _block_params(params, b: FusedBlock):
    """(w1t (E,C), s1, b1, kdw (3,3,E), s2, b2, w2t (P,E), s3, b3) as f32
    column vectors for sublane broadcasting."""
    def get(li):
        p = params[li]
        w, s, bb = (p["weights"], p["scale"], p["bias"]) \
            if isinstance(p, dict) else (p.weights, p.scale, p.bias)
        return (jnp.asarray(w, jnp.float32), jnp.asarray(s, jnp.float32),
                jnp.asarray(bb, jnp.float32))
    w1, s1, b1 = get(b.start)
    kdw, s2, b2 = get(b.start + 1)
    w2, s3, b3 = get(b.start + 2)
    c, e = w1.shape[2], w1.shape[3]
    p_ = w2.shape[3]
    return (jnp.transpose(w1.reshape(c, e)), s1[:, None], b1[:, None],
            kdw.reshape(3, 3, e), s2[:, None], b2[:, None],
            jnp.transpose(w2.reshape(e, p_)), s3[:, None], b3[:, None])


def _quantize(y, inv_scale):
    return jnp.clip(jnp.round(y * inv_scale), -127, 127)


def _make_kernel(rows: int, width: int, n: int, acts, residual: bool,
                 res_act: int, in_scale: Optional[float] = None,
                 out_scale: Optional[float] = None):
    """``in_scale``/``out_scale``: int8 boundary-blob storage (VERDICT r3
    #3) — the input rows dequantize by ``in_scale`` on load and the output
    requantizes by ``1/out_scale`` before the (int8) store.  In-kernel
    math stays f32 either way."""
    R, W, N = rows, width, n

    import os
    batched = os.environ.get("FFCNN_FUSED_DOTMODE", "loop") == "batched"

    def load(xr):
        v = xr.astype(jnp.float32)
        return v * in_scale if in_scale is not None else v

    def kern(xt, xc, xb, w1, s1, b1, kdw, s2, b2, w2, s3, b3, o_ref):
        h = pl.program_id(0)
        nh = pl.num_programs(0)
        E = w1.shape[0]
        S = W * N
        src = [load(xt[0]), *[load(xc[r]) for r in range(R)], load(xb[0])]
        if batched:
            # One rank-3 MXU dot for all rows' pw-expand (Mosaic lowers
            # rank-3 dot_general + static middle-dim indexing; measured
            # vs the per-row loop — see docs/PERF_NOTES.md session 3).
            xs = jnp.stack(src)
            a3 = lax.dot_general(w1[...], xs, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
            a3 = activate(a3 * s1[...][..., None] + b1[...][..., None],
                          acts[0])
            rows = [a3[:, i] for i in range(R + 2)]
        else:
            rows = [activate(lax.dot_general(
                        w1[...], xr,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32) * s1[...]
                        + b1[...], acts[0])
                    for xr in src]
        h1 = []
        for idx, a in enumerate(rows):
            # dw zero padding applies AFTER the pw epilogue: at the image's
            # top/bottom the halo row of h1 itself must be zero
            if idx == 0:
                a = jnp.where(h == 0, 0.0, a)
            if idx == R + 1:
                a = jnp.where(h == nh - 1, 0.0, a)
            h1.append(jnp.pad(a, ((0, 0), (N, N))))    # W-edge zero pad
        outs = []
        for r in range(R):
            acc = jnp.zeros((E, S), jnp.float32)
            for dy in range(3):
                for dx in range(3):
                    acc = acc + (h1[r + dy][:, dx * N: dx * N + S]
                                 * kdw[dy, dx][:, None])
            h2 = activate(acc * s2[...] + b2[...], acts[1])
            y = lax.dot_general(w2[...], h2, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            y = activate(y * s3[...] + b3[...], acts[2])
            if residual:
                y = activate(y + src[r + 1], res_act)
            outs.append(y)
        out = jnp.stack(outs)
        if out_scale is not None:
            out = _quantize(out, 1.0 / out_scale)
        o_ref[...] = out.astype(o_ref.dtype)

    return kern


# Compile-failure safety valve for _pick_rows (ADVICE r2): the 80 MB /
# 1.3x-factor estimate is validated at the measured flagship geometries,
# but Mosaic's true VMEM allocation isn't modelable from here — a geometry
# between the measured points could exceed the 100 MB limit and fail to
# compile.  When that happens, Net.detect_device calls reduce_rows_cap()
# and re-traces: every fused kernel then uses at most this many rows per
# grid step (0 = uncapped).  Process-wide by design: a VMEM overflow is a
# property of the backend, not of one Net instance.
_ROWS_CAP = [0]
_CAP_LADDER = (10, 8, 5, 4, 2, 1)


def reduce_rows_cap() -> bool:
    """Lower the global row cap one step; False when already at 1 (no
    further fallback possible — let the compile error propagate)."""
    cur = _ROWS_CAP[0]
    for nxt in _CAP_LADDER:
        if cur == 0 or nxt < cur:
            _ROWS_CAP[0] = nxt
            return True
    return False


def _make_down_kernel(rows: int, width: int, n: int, acts,
                      in_scale: Optional[float] = None,
                      out_scale: Optional[float] = None):
    """Stride-2 variant: R OUTPUT rows per grid step consume input rows
    [2*r0-1, 2*r0+2R-1] — a top halo row plus a 2R-row block (no bottom
    halo: with even H the y=+1 tap of the last output row is in-block).

    W taps: output col j reads original cols 2j-1 / 2j / 2j+1, so each
    pw-expand row is lane-split into even / odd column halves via a
    (E, WO, 2N) reshape + contiguous lane slices (Mosaic lowers lane
    split/merge reshapes; strided slices and >2D gathers it does NOT —
    both probed on-chip).  The dx=0 tap is the odd half shifted right one
    column (zero at j=0 = the dw zero pad)."""
    R, W, N = rows, width, n
    WO = W // 2

    def load(xr):
        v = xr.astype(jnp.float32)
        return v * in_scale if in_scale is not None else v

    def kern(xt, xc, w1, s1, b1, kdw, s2, b2, w2, s3, b3, o_ref):
        h = pl.program_id(0)
        E = w1.shape[0]
        SO = WO * N
        src = [load(xt[0]), *[load(xc[r]) for r in range(2 * R)]]
        rows_ = [activate(lax.dot_general(
                     w1[...], xr,
                     (((1,), (0,)), ((), ())),
                     preferred_element_type=jnp.float32) * s1[...]
                     + b1[...], acts[0])
                 for xr in src]
        taps = []
        for idx, a in enumerate(rows_):
            if idx == 0:                        # y=-1 tap at the image top
                a = jnp.where(h == 0, 0.0, a)
            a3 = a.reshape(E, WO, 2 * N)
            ae = a3[:, :, :N].reshape(E, SO)          # cols 2j
            ao = a3[:, :, N:].reshape(E, SO)          # cols 2j+1
            aom = jnp.pad(ao, ((0, 0), (N, 0)))[:, :SO]   # cols 2j-1
            taps.append((aom, ae, ao))
        outs = []
        for r in range(R):
            acc = jnp.zeros((E, SO), jnp.float32)
            for dy in range(3):
                for dx in range(3):
                    acc = acc + taps[2 * r + dy][dx] * kdw[dy, dx][:, None]
            h2 = activate(acc * s2[...] + b2[...], acts[1])
            y = lax.dot_general(w2[...], h2, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            outs.append(activate(y * s3[...] + b3[...], acts[2]))
        out = jnp.stack(outs)
        if out_scale is not None:
            out = _quantize(out, 1.0 / out_scale)
        o_ref[...] = out.astype(o_ref.dtype)

    return kern


def _pick_rows(h: int, e: int, s: int) -> int:
    """Rows per grid step: prefer the FEWEST grid steps whose f32 working
    set (~(R+2) expand rows of (E, S+2N) plus outputs) fits VMEM — whole-H
    steps measured fastest at the head geometries (152.9 vs 165.1 us/block
    at 20x20/C24/E136, chained device time; grid-step DMA overlap matters
    less than per-step ramp at these sizes)."""
    budget = 80 << 20
    cap = _ROWS_CAP[0]
    for r in (h, 10, 8, 5, 4, 2, 1):
        if cap and r > cap:
            continue
        if r <= h and h % r == 0 and \
                (r + 2) * e * (s + 256) * 4 * 13 // 10 <= budget:
            return r
    return 1


def _make_cascade_kernel(rows: int, width: int, n: int, metas, h_total: int,
                         in_scale: Optional[float] = None,
                         out_scale: Optional[float] = None):
    """K consecutive s1 blocks in ONE launch (halo cascade): a grid step
    computes R final-output rows from R+2K input rows; every intermediate
    block boundary stays in VMEM (the per-block path round-trips it
    through HBM — ~2x the region's remaining traffic at the big stages).
    Each block's span shrinks by 2 rows; rows outside the image are zeroed
    AFTER that block's pw-expand (dw zero-pad semantics, same rule as
    _make_kernel).  Requires rows >= K so halo BlockSpec clamping only
    ever distorts fully-invalid rows.

    ``metas``: per block (acts, residual, res_act)."""
    R, W, N = rows, width, n
    K = len(metas)

    def load(xr):
        v = xr.astype(jnp.float32)
        return v * in_scale if in_scale is not None else v

    def kern(*refs):
        o_ref = refs[-1]
        halo_t = refs[:K]
        xc = refs[K]
        halo_b = refs[K + 1:2 * K + 1]
        flat = refs[2 * K + 1:-1]
        i = pl.program_id(0)
        S = W * N
        cur = [load(halo_t[s][0]) for s in range(K)] \
            + [load(xc[r]) for r in range(R)] \
            + [load(halo_b[s][0]) for s in range(K)]
        off0 = -K
        for j, (acts, residual, res_act) in enumerate(metas):
            w1, s1, b1, kdw, s2, b2, w2, s3, b3 = flat[9 * j: 9 * j + 9]
            span = len(cur)
            h1 = []
            for idx in range(span):
                a = activate(lax.dot_general(
                        w1[...], cur[idx], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32) * s1[...]
                        + b1[...], acts[0])
                abs_row = i * R + off0 + idx
                a = jnp.where((abs_row < 0) | (abs_row >= h_total), 0.0, a)
                h1.append(jnp.pad(a, ((0, 0), (N, N))))
            outs = []
            for r in range(span - 2):
                acc = jnp.zeros((w1.shape[0], S), jnp.float32)
                for dy in range(3):
                    for dx in range(3):
                        acc = acc + (h1[r + dy][:, dx * N: dx * N + S]
                                     * kdw[dy, dx][:, None])
                h2 = activate(acc * s2[...] + b2[...], acts[1])
                y = lax.dot_general(w2[...], h2, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                y = activate(y * s3[...] + b3[...], acts[2])
                if residual:
                    y = activate(y + cur[r + 1], res_act)
                outs.append(y)
            cur = outs
            off0 += 1
        out = jnp.stack(cur)
        if out_scale is not None:
            out = _quantize(out, 1.0 / out_scale)
        o_ref[...] = out.astype(o_ref.dtype)

    return kern


def _pick_rows_cascade(h: int, e: int, s: int, k: int) -> int:
    budget = 80 << 20
    cap = _ROWS_CAP[0]
    for r in (h, 10, 8, 5, 4, 2, 1):
        if cap and r > cap:
            continue
        if k <= r <= h and h % r == 0 and \
                (r + 2 * k) * e * (s + 256) * 4 * 13 // 10 <= budget:
            return r
    return 0                                  # no legal choice -> no cascade


def _cs_cascade(x, params_list, metas, width: int, n: int,
                interpret: bool = False, out_dtype=None,
                in_scale=None, out_scale=None):
    """Chain of same-dims s1 blocks in one pallas_call; None if the
    geometry has no legal rows choice (caller falls back to per-block)."""
    hh, cc, s = x.shape
    e = max(p[0].shape[0] for p in params_list)
    k = len(metas)
    r = _pick_rows_cascade(hh, e, s, k)
    if r == 0:
        return None
    kern = _make_cascade_kernel(r, width, n, metas, hh,
                                in_scale=in_scale, out_scale=out_scale)
    p_ = params_list[-1][6].shape[0]

    def top(sl):
        return pl.BlockSpec(
            (1, cc, s), lambda i, sl=sl: (jnp.maximum(i * r - k + sl, 0),
                                          0, 0),
            memory_space=pltpu.VMEM)

    def bot(sl):
        return pl.BlockSpec(
            (1, cc, s), lambda i, sl=sl: (jnp.minimum(i * r + r + sl,
                                                      hh - 1), 0, 0),
            memory_space=pltpu.VMEM)

    cur = pl.BlockSpec((r, cc, s), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    flat = [t for p in params_list for t in p]
    return pl.pallas_call(
        kern, grid=(hh // r,),
        in_specs=[top(sl) for sl in range(k)] + [cur]
                 + [bot(sl) for sl in range(k)] + [full()] * len(flat),
        out_specs=pl.BlockSpec((r, p_, s), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hh, p_, s), out_dtype or x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*([x] * (2 * k + 1)), *flat)


def _pick_rows_down(h_out: int, e: int, s: int) -> int:
    """Output rows per grid step for the stride-2 kernel: the f32 working
    set holds 2R+1 expand rows."""
    budget = 80 << 20
    cap = _ROWS_CAP[0]
    for r in (h_out, 10, 8, 5, 4, 2, 1):
        if cap and r > cap:
            continue
        if r <= h_out and h_out % r == 0 and \
                (2 * r + 1) * e * (s + 256) * 4 * 13 // 10 <= budget:
            return r
    return 1


def _cs_down_block(x, params9, acts, width: int, n: int,
                   interpret: bool = False, out_dtype=None,
                   in_scale=None, out_scale=None):
    """One stride-2 stage-transition block in (H, C, W*N) layout ->
    (H/2, P, (W/2)*N)."""
    hh, cc, s = x.shape
    w1 = params9[0]
    e, p_ = w1.shape[0], params9[6].shape[0]
    ho, wo = hh // 2, width // 2
    r = _pick_rows_down(ho, e, s)
    kern = _make_down_kernel(r, width, n, acts, in_scale, out_scale)
    top = pl.BlockSpec((1, cc, s),
                       lambda i: (jnp.maximum(i * 2 * r - 1, 0), 0, 0),
                       memory_space=pltpu.VMEM)
    cur = pl.BlockSpec((2 * r, cc, s), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=(ho // r,),
        in_specs=[top, cur] + [full()] * 9,
        out_specs=pl.BlockSpec((r, p_, wo * n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ho, p_, wo * n),
                                       out_dtype or x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, x, *params9)


def _cs_block(x, params9, acts, residual: bool, res_act: int,
              width: int, n: int, interpret: bool = False, out_dtype=None,
              in_scale=None, out_scale=None):
    """One block in (H, C, W*N) layout -> (H, P, W*N)."""
    hh, cc, s = x.shape
    w1 = params9[0]
    e, p_ = w1.shape[0], params9[6].shape[0]
    r = _pick_rows(hh, e, s)
    kern = _make_kernel(r, width, n, acts, residual, res_act,
                        in_scale, out_scale)
    top = pl.BlockSpec((1, cc, s),
                       lambda i: (jnp.maximum(i * r - 1, 0), 0, 0),
                       memory_space=pltpu.VMEM)
    cur = pl.BlockSpec((r, cc, s), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    bot = pl.BlockSpec((1, cc, s),
                       lambda i: (jnp.minimum((i + 1) * r, hh - 1), 0, 0),
                       memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=(hh // r,),
        in_specs=[top, cur, bot] + [full()] * 9,
        out_specs=pl.BlockSpec((r, p_, s), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hh, p_, s), out_dtype or x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, x, x, *params9)


def apply_run(x, ir: NetIR, params, run: FusedRun, *,
              interpret: bool = False, quant=None):
    """Run a chain of fused blocks on an NHWC input blob: one layout
    round-trip around the whole run.  Two strategies:

    * 'mega' (default where it fits): ONE pallas_call for the whole run —
      grid over 128-image batch chunks, the full (H, C, W*128) feature map
      of one chunk resident in VMEM, blocks chained in-kernel so the
      boundary blobs between blocks never touch HBM (per-block calls
      round-trip them, padded to the sublane tile).
    * per-block (fallback / FFCNN_FUSED_MEGA=0): grid over row groups with
      halo BlockSpecs, one pallas_call per block.
    """
    import os
    n, hh, ww, cc = x.shape
    # Default OFF until A/B-measured on the real chip (CPU-interpret
    # equivalence is tested; Mosaic lowering at production geometry is not).
    if os.environ.get("FFCNN_FUSED_MEGA", "0") != "0" and \
            all(not b.down for b in run.blocks) and quant is None and \
            n % MEGA_NB == 0 and _mega_fits(ir, params, run, hh, ww):
        return _apply_run_mega(x, ir, params, run, interpret=interpret)
    # Boundary-blob storage between blocks: 'f32' stores dense f32 rows
    # instead of the input dtype.  For C<=8 blobs, bf16's (16,128) tile
    # pads sublanes 2x so dense-f32 moves the SAME bytes while skipping the
    # bf16 round-trip; at C=16 bf16 is already dense and f32 doubles bytes
    # (measure per stage — VERDICT r3 #1b).
    from ..tuning import get_flag
    store_f32 = get_flag("FFCNN_FUSED_STORE", "input") == "f32"
    mid_dtype = jnp.float32 if store_f32 else x.dtype
    xc = jnp.transpose(x, (1, 3, 2, 0)).reshape(hh, cc, ww * n)
    xc, hh, ww = run_blocks_cs(xc, ir, params, run, hh, ww, n,
                               final_dtype=x.dtype, mid_dtype=mid_dtype,
                               interpret=interpret, quant=quant)
    p_ = xc.shape[1]
    return jnp.transpose(xc.reshape(hh, p_, ww, n), (3, 0, 2, 1))


def run_blocks_cs(xc, ir: NetIR, params, run: FusedRun, hh: int, ww: int,
                  n: int, *, final_dtype, mid_dtype=None,
                  interpret: bool = False, quant=None):
    """Run a FusedRun's blocks on an already-(H, C, W*N)-layout input —
    the shared body of apply_run, also entered directly by the Pallas
    conv0 path (kernels/conv0_fused.py) so the stem's output never takes
    an NHWC detour.  Returns (xc', H', W').

    ``quant``: optional QuantPlan — INTERIOR block-boundary blobs the plan
    marks int8 are stored int8 in the fused layout (requantize in the
    producing kernel's epilogue, dequantize on the next kernel's load),
    halving their HBM round-trip where C>=24 (tools/traffic_model.py).
    The run's input and output stay float — graph/build handles edge
    requantization, identical with or without fusion."""
    from ..tuning import get_flag
    if mid_dtype is None:
        mid_dtype = jnp.float32 \
            if get_flag("FFCNN_FUSED_STORE", "input") == "f32" \
            else final_dtype
    # Halo-cascade: merge up to FFCNN_FUSED_CASCADE consecutive s1 blocks
    # into one launch so their boundary blobs never leave VMEM (default 0
    # = per-block launches, the measured round-2 configuration).
    casc = int(get_flag("FFCNN_FUSED_CASCADE", "0"))
    groups: List[List[FusedBlock]] = []
    for b in run.blocks:
        if (casc > 1 and not b.down and groups and len(groups[-1]) < casc
                and not groups[-1][-1].down):
            groups[-1].append(b)
        else:
            groups.append([b])
    acts_of = lambda b: (ir.layers[b.start].activation,
                         ir.layers[b.start + 1].activation,
                         ir.layers[b.start + 2].activation)
    in_scale = None
    for gi, grp in enumerate(groups):
        last = gi == len(groups) - 1
        out_scale = None
        if not last and quant is not None \
                and quant.blob_is_int8(grp[-1].end + 1):
            # scalar_scale is None for per-channel plans: the in-kernel
            # requantize epilogue is scalar-only, so those boundaries
            # stay float here (graph/build handles edge requantization)
            out_scale = quant.scalar_scale(grp[-1].end + 1)
        od = (jnp.int8 if out_scale is not None
              else (final_dtype if last else mid_dtype))
        b = grp[0]
        if len(grp) > 1:
            y = _cs_cascade(xc, [_block_params(params, bb) for bb in grp],
                            [(acts_of(bb), bb.residual, bb.res_act)
                             for bb in grp], ww, n, interpret=interpret,
                            out_dtype=od, in_scale=in_scale,
                            out_scale=out_scale)
            if y is not None:
                xc = y
                in_scale = out_scale
                continue
            # no legal rows choice at this geometry: per-block fallback
            grp_iter = grp
        else:
            grp_iter = grp
        for k, bb in enumerate(grp_iter):
            blast = k == len(grp_iter) - 1
            oscale = out_scale if blast else (
                quant.scalar_scale(bb.end + 1)
                if quant is not None and quant.blob_is_int8(bb.end + 1)
                else None)
            bod = (jnp.int8 if oscale is not None
                   else (od if blast else mid_dtype))
            if bb.down:
                xc = _cs_down_block(xc, _block_params(params, bb),
                                    acts_of(bb), ww, n,
                                    interpret=interpret, out_dtype=bod,
                                    in_scale=in_scale, out_scale=oscale)
                hh, ww = hh // 2, ww // 2
            else:
                xc = _cs_block(xc, _block_params(params, bb), acts_of(bb),
                               bb.residual, bb.res_act, ww, n,
                               interpret=interpret, out_dtype=bod,
                               in_scale=in_scale, out_scale=oscale)
            in_scale = oscale
    return xc, hh, ww


# ----------------------------------------------------------- mega variant
MEGA_NB = 128                  # batch images per grid step (lane quantum)
_MEGA_VMEM_BUDGET = 72 << 20   # f32 working set per chunk (2 stage buffers
#                                + input/residual + slack under the 100 MB
#                                compiler limit)


def _mega_fits(ir: NetIR, params, run: FusedRun, hh: int, ww: int) -> bool:
    emax = max(ir.layers[b.start].fn for b in run.blocks)
    s = ww * MEGA_NB
    need = 2 * hh * emax * (s + 2 * MEGA_NB) * 4        # two E-wide stages
    need += 2 * hh * max(ir.blobs[run.blocks[0].start].c,
                         ir.blobs[run.end + 1].c) * s * 4
    return need <= _MEGA_VMEM_BUDGET


def _make_mega_kernel(run_meta, rows: int, s: int):
    """Kernel over one (1, H, C, S) batch-chunk block; ``run_meta`` is a
    tuple of (acts, residual, res_act) per block; params arrive flattened
    as 9 refs per block after the x ref."""
    R, S, N = rows, s, MEGA_NB

    def kern(*refs):
        x_ref, o_ref = refs[0], refs[-1]
        x = [x_ref[0, r].astype(jnp.float32) for r in range(R)]   # (C, S)
        for bi, (acts, residual, res_act) in enumerate(run_meta):
            (w1, s1, b1, kdw, s2, b2, w2, s3, b3) = \
                [r[...] for r in refs[1 + 9 * bi: 10 + 9 * bi]]
            e = w1.shape[0]
            # pw expand + W-edge zero pad, all rows resident
            h1 = []
            for r in range(R):
                a = lax.dot_general(w1, x[r], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                a = activate(a * s1 + b1, acts[0])
                h1.append(jnp.pad(a, ((0, 0), (N, N))))
            zero = jnp.zeros_like(h1[0])
            h1 = [zero] + h1 + [zero]                  # H-edge zero pad
            out = []
            for r in range(R):
                acc = jnp.zeros((e, S), jnp.float32)
                for dy in range(3):
                    for dx in range(3):
                        acc = acc + (h1[r + dy][:, dx * N: dx * N + S]
                                     * kdw[dy, dx][:, None])
                h2 = activate(acc * s2 + b2, acts[1])
                y = lax.dot_general(w2, h2, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                y = activate(y * s3 + b3, acts[2])
                if residual:
                    y = activate(y + x[r], res_act)
                out.append(y)
            x = out
        for r in range(R):
            o_ref[0, r] = x[r].astype(o_ref.dtype)

    return kern


def _apply_run_mega(x, ir: NetIR, params, run: FusedRun, *,
                    interpret: bool = False):
    n, hh, ww, cc = x.shape
    nb = n // MEGA_NB
    p_ = ir.blobs[run.end + 1].c
    s = ww * MEGA_NB
    # (N,H,W,C) -> (NB, H, C, W*128): batch-chunk leading (grid dim), C on
    # sublanes, (w, image-within-chunk) on lanes so dw taps are +-128-lane
    # tile-aligned slices.
    x4 = jnp.transpose(x.reshape(nb, MEGA_NB, hh, ww, cc),
                       (0, 2, 4, 3, 1)).reshape(nb, hh, cc, s)
    run_meta = []
    flat_params = []
    for b in run.blocks:
        acts = (ir.layers[b.start].activation,
                ir.layers[b.start + 1].activation,
                ir.layers[b.start + 2].activation)
        run_meta.append((acts, b.residual, b.res_act))
        flat_params.extend(_block_params(params, b))
    kern = _make_mega_kernel(tuple(run_meta), hh, s)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern, grid=(nb,),
        in_specs=[pl.BlockSpec((1, hh, cc, s), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)]
                 + [full()] * len(flat_params),
        out_specs=pl.BlockSpec((1, hh, p_, s), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, hh, p_, s), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x4, *flat_params)
    return jnp.transpose(out.reshape(nb, hh, p_, ww, MEGA_NB),
                         (0, 4, 1, 3, 2)).reshape(n, hh, ww, p_)


def runs_usable(x_batch: int, backend: Optional[str] = None) -> bool:
    """Gate: lane-tile-aligned batch, TPU backend (tests force interpret),
    and the FFCNN_FUSED env kill-switch (default on)."""
    import os
    if os.environ.get("FFCNN_FUSED", "1") == "0":
        return False
    if x_batch % BATCH_QUANTUM != 0:
        return False
    if backend is None:
        backend = jax.default_backend()
    return backend == "tpu"
