"""Pallas conv0: the 3x3/s2 stem straight off uint8 pixels, emitting the
fused (H, C, W*N) layout.

WHY (VERDICT r3 #5): conv0 measured 596 us at batch 256 — 2.2x its HBM
floor — because XLA must relayout the batch-leading (N, H, W, 3) uint8
input into a compute layout AND materialize the NHWC output that the next
layer immediately relayouts again.  This kernel does the batch-to-lanes
transposition IN-KERNEL (load a u8 row block, cast to f32, one transpose
to (rows, 3, W*N)) and writes the stem's output directly in the fused
(H, C, W*N) layout consumed by a region run starting at layer 1
(kernels/block_fused.py) — so the stem costs one u8 read + one fused-
layout write, and the region's own input transpose disappears.

Reference analog: conv-v6 special-cases its first bottleneck too
(conv-v6.c:46-91).  Space-to-depth was measured slower (the u8 transpose
dominated, docs/PERF_NOTES.md r2 #6); the difference here is that the
transpose happens on VMEM-resident data inside the launch, not as a
separate HBM round-trip.

Numerics: identical math to conv2d_fused on the folded weights (f32
accumulate, scale/bias epilogue, activation); equivalence tested in
interpret mode.  Mosaic lowering of the in-kernel 4D transpose is the
open risk — gated FFCNN_CONV0_PALLAS=1 until measured on-chip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.activations import activate


def _make_kernel(rows: int, width: int, n: int, act: int):
    R, W, N = rows, width, n
    WO = W // 2

    def kern(xt, xc, wm, s, b, o_ref):
        h = pl.program_id(0)
        # Blocks arrive as (N, rows, W*3) u8 — last dim DENSE on lanes
        # (a (…, W, 3) block would lane-pad 3->128: 42x VMEM + DMA).
        # The top halo is an 8-row block (Mosaic requires the last two
        # block dims %8/%128 or full); with R%4==0 the halo input row
        # 2*R*h-1 always sits at STATIC in-block offset 7 (h=0 reads a
        # clamped garbage row that the where() below zeroes).
        # One relayout to (2R+1, 3, W*N): batch to lanes, once.
        # u8 -> i32 -> f32: Mosaic has no direct u8->f32 cast (probed).
        def lift(v):
            return v.astype(jnp.int32).astype(jnp.float32)
        x = jnp.concatenate([lift(xt[:, 7:8, :]), lift(xc[...])], axis=1)
        x = x.reshape(N, 2 * R + 1, W, 3)
        xt_ = jnp.transpose(x, (1, 3, 2, 0)).reshape(2 * R + 1, 3, W * N)
        SO = WO * N
        planes = []
        for i in range(2 * R + 1):
            p = xt_[i]
            if i == 0:                   # pad row -1 at the image top
                p = jnp.where(h == 0, 0.0, p)
            # Even/odd column lane split (output col j taps original cols
            # 2j-1 / 2j / 2j+1): Mosaic lowers lane split/merge reshapes;
            # strided slices and >2D gathers it does NOT (probed on-chip).
            p3 = p.reshape(3, WO, 2 * N)
            pe = p3[:, :, :N].reshape(3, SO)              # cols 2j
            po = p3[:, :, N:].reshape(3, SO)              # cols 2j+1
            pom = jnp.pad(po, ((0, 0), (N, 0)))[:, :SO]   # cols 2j-1
            planes.append((pom, pe, po))
        outs = []
        for r in range(R):
            taps = [planes[2 * r + dy][dx]
                    for dy in range(3) for dx in range(3)]
            im = jnp.concatenate(taps, axis=0)           # (27, WO*N)
            y = lax.dot_general(wm[...], im, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            outs.append(activate(y * s[...] + b[...], act))
        o_ref[...] = jnp.stack(outs).astype(o_ref.dtype)

    return kern


def _pick_rows(h_out: int, n: int, w: int) -> int:
    """VMEM per grid step: the u8 input block (dense lanes) + the f32 cast
    copy + the transposed f32 planes (~9 bytes/pixel-channel total).
    Honors the global rows cap (block_fused._ROWS_CAP) so the net-level
    VMEM-overflow retry also shrinks the stem's grid steps.

    Only R%4==0 choices are legal: the 8-row top-halo block puts the
    2*R*i-1 halo row at static offset 7 exactly when 2R ≡ 0 (mod 8).
    Returns 0 when no choice fits (caller falls back to the XLA stem)."""
    from .block_fused import _ROWS_CAP
    budget = 60 << 20
    per_row = n * w * 3 * 9
    cap = _ROWS_CAP[0]
    for r in (16, 8, 4):
        if cap and r > cap:
            continue
        if r <= h_out and h_out % r == 0 and (2 * r + 1) * per_row <= budget:
            return r
    return 0


def conv0_cs(x, w, scale, bias, act: int, *, out_dtype=jnp.bfloat16,
             interpret: bool = False):
    """(N, H, W, 3) uint8, HWIO ``w`` (3, 3, 3, F), folded scale/bias ->
    (H/2, F, (W/2)*N) in the fused channel-sublane layout.

    Requires the flagship stem shape: fs=3, stride=2, pad=1, even H/W.
    Returns None when the geometry admits no legal rows choice (H/2 not
    divisible by 4, or VMEM too small) — caller falls back to XLA."""
    n, hh, ww, ci = x.shape
    kh, kw, ci2, f = w.shape
    assert (kh, kw, ci2) == (3, 3, ci) and hh % 2 == 0 and ww % 2 == 0
    ho, wo = hh // 2, ww // 2
    r = _pick_rows(ho, n, ww)
    if r == 0:
        return None
    # (dy, dx, c) rows in the SAME order the kernel stacks taps.
    wm = jnp.transpose(jnp.asarray(w, jnp.float32).reshape(9 * ci, f))
    s = jnp.asarray(scale, jnp.float32)[:, None]
    b = jnp.asarray(bias, jnp.float32)[:, None]
    kern = _make_kernel(r, ww, n, act)
    # Flatten (W, 3) -> W*3 so the VMEM blocks' lane dim is dense (contiguous
    # minor dims; at most a cheap u8 relayout in XLA-land).
    x3 = x.reshape(n, hh, ww * ci)
    # 8-row halo block (block units of 8 input rows): input row 2ri-1
    # lives in block ri/4 - 1 at offset 7 for i>0 (R%4==0 guarantees
    # alignment); i=0 clamps to block 0 and the kernel zeroes the row.
    top = pl.BlockSpec((n, 8, ww * ci),
                       lambda i: (0, jnp.maximum(i * (r // 4) - 1, 0), 0),
                       memory_space=pltpu.VMEM)
    cur = pl.BlockSpec((n, 2 * r, ww * ci), lambda i: (0, i, 0),
                       memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=(ho // r,),
        in_specs=[top, cur, full(), full(), full()],
        out_specs=pl.BlockSpec((r, f, wo * n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ho, f, wo * n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x3, x3, wm, s, b)
