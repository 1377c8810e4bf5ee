"""Fused YOLO-head chain kernel: [dw5x5, pw, dw5x5, pw, pw-head] in one
Pallas launch per batch chunk, channels-sublane layout.

WHY: the two dw5x5 stages per head are VPU-compute-bound but pay NHWC
tiny-spatial tiling (w<=20 on sublanes, C<=120 on lanes), and the
interleaved pw convs + the 255-channel head tensor round-trip HBM between
every stage.  In the ``(H, C, W*Nc)`` layout (channels on sublanes, width
x batch-chunk on lanes, Nc = 128 images per grid step) every tensor is
dense, the 5x5 taps are +-Nc-lane tile-aligned STATIC slices (no rotates,
bf16-safe), and the whole chain's intermediates stay in VMEM.

Reference anchor: these are the same ops as conv-v6's dw5x5 fast path
(conv-v6.c:291-465) and 1x1 path (conv-v6.c:46-91), fused there for
cache locality, here for VMEM residency.

Chain discovery (plan_head_runs) walks back from each yolo layer over
stride-1 convs (pw groups=1 / depthwise fs in {3,5}) until a blob with
outside consumers; the flagship yields [116..120] (10x10) and [125..129]
(20x20), leaving blob 116 materialized for route 122 exactly as the
graph requires.

Gated: FFCNN_FUSED_HEADS=1 (off by default until the on-chip A/B in
docs/PERF_NOTES.md says otherwise), batch % 128 == 0, TPU backend.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..darknet.ir import LayerType, NetIR
from ..ops.activations import activate

CHUNK = 128                    # images per grid step (lane tile quantum)
_VMEM_BUDGET = 72 << 20        # f32 working set per chunk


@dataclasses.dataclass(frozen=True)
class HeadRun:
    """Fused chain of conv layers ``start..end`` (inclusive); layer
    ``end + 1`` is the consuming yolo layer.  Interior blobs
    ``start+1..end`` never materialize.  ``nc``: images per grid step —
    128 (full lane tile) when the f32 working set fits VMEM, else 64
    (legal because ALL in-kernel math is f32, so the half-tile dx slices
    stay within Mosaic's 32-bit shift support)."""
    start: int
    end: int
    nc: int = CHUNK


def plan_head_runs(ir: NetIR) -> List[HeadRun]:
    referenced = set()
    for l in ir.layers:
        if l.type in (LayerType.ROUTE, LayerType.SHORTCUT):
            referenced.update(d + 1 for d in l.depends)

    runs: List[HeadRun] = []
    for yli, yl in enumerate(ir.layers):
        if yl.type != LayerType.YOLO:
            continue
        end = yli - 1
        li = end
        while li >= 0:
            l = ir.layers[li]
            blob_in = ir.blobs[li]
            pw = (l.type == LayerType.CONV and l.fs == 1 and l.stride == 1
                  and l.groups == 1 and l.pad == 0)
            dw = (l.type == LayerType.CONV and l.fs in (3, 5)
                  and l.stride == 1 and l.groups == l.fn
                  and l.groups == blob_in.c and l.pad == l.fs // 2)
            if not (pw or dw):
                break
            if li != end and li + 1 in referenced:
                # this layer's OUTPUT blob is read elsewhere -> it must
                # materialize, so the chain can start no earlier than li+1
                break
            li -= 1
        start = li + 1
        if end - start + 1 >= 2:           # at least two fused layers
            # every spatial dim in the chain is constant (stride-1 SAME)
            h, w = ir.blobs[start].h, ir.blobs[start].w
            for nc in (CHUNK, CHUNK // 2):
                if _fits(ir, start, end, h, w, nc):
                    runs.append(HeadRun(start=start, end=end, nc=nc))
                    break
    return runs


def _fits(ir: NetIR, start: int, end: int, h: int, w: int, nc: int) -> bool:
    """Peak f32 VMEM ~ the worst consecutive (c_in + c_out) stage pair
    (previous stage + its padded copy + next stage) plus the bf16 in/out
    blocks."""
    pair = max(ir.blobs[li].c + ir.blobs[li + 1].c
               for li in range(start, end + 1))
    s = w * nc
    need = h * (s + 4 * nc) * 4 * pair \
        + h * s * 2 * (ir.blobs[start].c + ir.blobs[end + 1].c)
    return need <= _VMEM_BUDGET


def _stage_params(params, li):
    p = params[li]
    w, s, b = (p["weights"], p["scale"], p["bias"]) \
        if isinstance(p, dict) else (p.weights, p.scale, p.bias)
    w = jnp.asarray(w, jnp.float32)
    s = jnp.asarray(s, jnp.float32)[:, None]
    b = jnp.asarray(b, jnp.float32)[:, None]
    if w.shape[0] == 1 and w.shape[1] == 1:            # pw: (1,1,Cin,Co)
        return ("pw", jnp.transpose(w.reshape(w.shape[2], w.shape[3])), s, b)
    return ("dw", w.reshape(w.shape[0], w.shape[1], w.shape[3]), s, b)


def _make_kernel(stage_meta, H: int, W: int, nc: int):
    """stage_meta: tuple of (kind, fs, act) per layer."""

    def kern(*refs):
        x_ref, o_ref = refs[0], refs[-1]
        wrefs = refs[1:-1]
        S = W * nc
        x = [x_ref[0, r].astype(jnp.float32) for r in range(H)]
        wi = 0
        for kind, fs, act in stage_meta:
            wt, sc, bi = (wrefs[wi][...], wrefs[wi + 1][...],
                          wrefs[wi + 2][...])
            wi += 3
            if kind == "pw":
                x = [activate(lax.dot_general(
                        wt, xr, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32) * sc + bi, act)
                     for xr in x]
            else:
                rad = fs // 2
                padded = [jnp.pad(xr, ((0, 0), (rad * nc, rad * nc)))
                          for xr in x]
                zero = jnp.zeros_like(padded[0])
                nxt = []
                for r in range(H):
                    acc = jnp.zeros_like(x[0])
                    for dy in range(fs):
                        rr = r + dy - rad
                        src = padded[rr] if 0 <= rr < H else zero
                        for dx in range(fs):
                            acc = acc + (src[:, dx * nc: dx * nc + S]
                                         * wt[dy, dx][:, None])
                    nxt.append(activate(acc * sc + bi, act))
                x = nxt
        for r in range(H):
            o_ref[0, r] = x[r].astype(o_ref.dtype)

    return kern


def apply_head_run(x, ir: NetIR, params, run: HeadRun, *,
                   interpret: bool = False):
    """NHWC input blob of layer ``run.start`` -> NHWC head tensor of blob
    ``run.end + 1`` (phase 2: NHWC in/out; the (H, C, S) decode path is a
    follow-up)."""
    n, hh, ww, cc = x.shape
    nc = min(run.nc, n) if interpret else run.nc
    nb = n // nc
    co = ir.blobs[run.end + 1].c
    s = ww * nc
    x4 = jnp.transpose(x.reshape(nb, nc, hh, ww, cc),
                       (0, 2, 4, 3, 1)).reshape(nb, hh, cc, s)
    stage_meta = []
    flat = []
    for li in range(run.start, run.end + 1):
        kind, wt, sc, bi = _stage_params(params, li)
        stage_meta.append((kind, ir.layers[li].fs,
                           ir.layers[li].activation))
        flat.extend((wt, sc, bi))
    kern = _make_kernel(tuple(stage_meta), hh, ww, nc)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern, grid=(nb,),
        in_specs=[pl.BlockSpec((1, hh, cc, s), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)]
                 + [full()] * len(flat),
        out_specs=pl.BlockSpec((1, hh, co, s), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, hh, co, s), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x4, *flat)
    return jnp.transpose(out.reshape(nb, hh, co, ww, nc),
                         (0, 4, 1, 3, 2)).reshape(n, hh, ww, co)


def head_runs_usable(x_batch: int, backend: Optional[str] = None) -> bool:
    import os
    if os.environ.get("FFCNN_FUSED_HEADS", "0") != "1":
        return False
    if x_batch % CHUNK != 0:
        return False
    if backend is None:
        backend = jax.default_backend()
    return backend == "tpu"
