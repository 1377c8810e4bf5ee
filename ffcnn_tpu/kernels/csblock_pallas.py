"""Channels-first fused inverted-residual block kernel (Pallas TPU).

yolo-fastest's body is MobileNet-style blocks —
``pw 1x1 expand (leaky) → dw 3x3 s1 (leaky) → pw 1x1 reduce (linear)
[+ residual]`` (three groupconv calls in the reference, conv-v6.c:481-502).
As separate XLA ops each conv round-trips HBM and, worse, every tensor is
NHWC with C in 8..224 — far below the 128-wide lane tile, so VMEM tiles and
vector ops run heavily lane-padded.

This kernel flips the layout: activations live as **(C, S)** with
S = N·H·W on the lane dimension (always tile-aligned; C rides the sublane
dimension where padding is at most 2x) and the whole block executes in one
kernel per batch tile:

    mid = leaky(w1 @ x * s1 + b1)            # (Cmid,Cin)@(Cin,ST) MXU dot:
                                             # samples stream on LANES
    d   = leaky(dwconv3x3(mid) * sd + bd)    # 9 lane-rolls + masked FMAs
    y   = w2 @ d * s2 + b2 (+ res)           # MXU dot

The dw conv exploits that each grid block holds WHOLE images: a tap at
(dy,dx) is a circular lane-roll by dy*W+dx, and samples whose source pixel
falls outside the image (or wraps the block edge — block edges are image
edges by construction) are zeroed by iota-derived row/col masks, exactly
reproducing zero padding.  HBM traffic collapses to the block boundary
tensors; the fat Cmid intermediate never leaves VMEM.

STATUS — experimental, NOT on the default path.  Measured on v5e (jax 0.9,
batch 256, device time via profiler traces; see docs/PERF_NOTES.md):

    160x160  8->  8->  4   XLA 0.578 ms   this kernel 1.779 ms
     80x80   8-> 32->  8   XLA 0.449 ms   this kernel 1.193 ms
     40x40  16-> 96-> 16   XLA 0.248 ms   this kernel 0.950 ms
     20x20  24->136-> 24   XLA 0.164 ms   this kernel 0.332 ms

The 9 full-tensor lane-rotates (forced to f32 — Mosaic rotates are 32-bit
only) cost more than the HBM round-trips they save; XLA's conv path wins on
this stack.  Kept as a correct, tested reference implementation of the
channels-first layout so the approach can be retried when Mosaic gains
sub-32-bit rotates/strided ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LEAKY = 1  # activation codes used by the kernel epilogues
_LINEAR = 0


def _act(x, code):
    return jnp.where(x > 0, x, x * 0.1) if code == _LEAKY else x


def _cs_kernel(x_ref, w1_ref, s1_ref, b1_ref, wd_ref, sd_ref, bd_ref,
               w2_ref, s2_ref, b2_ref, *rest, H, W, act_mid, act_dw, act_out,
               residual):
    if residual:
        res_ref, y_ref = rest
    else:
        (y_ref,) = rest
    st = x_ref.shape[1]
    hw = H * W

    # --- pw expand: (Cmid, Cin) @ (Cin, ST); samples on lanes ---
    mid = jax.lax.dot_general(w1_ref[...], x_ref[...],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    # mid stays f32 through the dw stage: Mosaic lane-rotates are 32-bit only
    mid = _act(mid * s1_ref[...] + b1_ref[...], act_mid)

    # --- dw 3x3 stride 1: lane rolls + image-edge masks ---
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, st), 1)
    ximg = pos % W
    yimg = (pos % hw) // W
    acc = jnp.zeros(mid.shape, jnp.float32)
    # want out[s] = mid[s + off]: a circular roll by (-off) mod ST
    for dy in (-1, 0, 1):
        rolled_y = mid if dy == 0 else pltpu.roll(mid, (-dy * W) % st, axis=1)
        if dy == -1:
            my = yimg > 0
        elif dy == 1:
            my = yimg < H - 1
        else:
            my = None
        for dx in (-1, 0, 1):
            rolled = rolled_y if dx == 0 else pltpu.roll(rolled_y,
                                                         (-dx) % st, axis=1)
            if dx == -1:
                mask = ximg > 0
            elif dx == 1:
                mask = ximg < W - 1
            else:
                mask = None
            if my is not None:
                mask = my if mask is None else (mask & my)
            tap = wd_ref[dy + 1, dx + 1][:, None]       # f32 (Cmid, 1)
            term = rolled * tap
            if mask is not None:
                term = jnp.where(mask, term, 0.0)
            acc = acc + term
    d = _act(acc * sd_ref[...] + bd_ref[...], act_dw).astype(x_ref.dtype)

    # --- pw reduce ---
    y = jax.lax.dot_general(w2_ref[...], d, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = _act(y * s2_ref[...] + b2_ref[...], act_out)
    if residual:
        y = y + res_ref[...].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)


def _pick_bt(n, hw, cin, cmid, cout, residual, budget=9 * 1024 * 1024):
    per_img = hw * (2 * 2 * cin                 # x, double-buffered
                    + 2 * 2 * cout * (2 if residual else 1)   # out (+res)
                    + cmid * (4 + 4 + 2 + 4))   # mid f32, acc f32, bf16, tmp
    bt = max(1, budget // max(1, per_img))
    while n % bt:
        bt -= 1
    return bt


@functools.partial(jax.jit, static_argnames=(
    "H", "W", "act_mid", "act_dw", "act_out", "interpret"))
def fused_mbconv_cs(x_cs, w1, s1, b1, wd, sd, bd, w2, s2, b2, res_cs=None, *,
                    H: int, W: int, act_mid: int = _LEAKY,
                    act_dw: int = _LEAKY, act_out: int = _LINEAR,
                    interpret: bool = False):
    """x_cs (Cin, S) with S = N*H*W; w1 (Cmid, Cin); wd (3, 3, Cmid);
    w2 (Cout, Cmid); per-stage scale/bias (C,).  Returns (Cout, S)."""
    cin, s = x_cs.shape
    cmid = w1.shape[0]
    cout = w2.shape[0]
    hw = H * W
    n = s // hw
    residual = res_cs is not None
    bt = _pick_bt(n, hw, cin, cmid, cout, residual)
    st = bt * hw

    col = lambda v: v.astype(jnp.float32).reshape(-1, 1)
    kernel = functools.partial(_cs_kernel, H=H, W=W, act_mid=act_mid,
                               act_dw=act_dw, act_out=act_out,
                               residual=residual)
    rep = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((cin, st), lambda i: (0, i), memory_space=pltpu.VMEM),
        rep((cmid, cin)), rep((cmid, 1)), rep((cmid, 1)),
        rep((3, 3, cmid)), rep((cmid, 1)), rep((cmid, 1)),
        rep((cout, cmid)), rep((cout, 1)), rep((cout, 1)),
    ]
    args = [x_cs, w1.astype(x_cs.dtype), col(s1), col(b1),
            wd.astype(jnp.float32), col(sd), col(bd),
            w2.astype(x_cs.dtype), col(s2), col(b2)]
    if residual:
        in_specs.append(pl.BlockSpec((cout, st), lambda i: (0, i),
                                     memory_space=pltpu.VMEM))
        args.append(res_cs)
    return pl.pallas_call(
        kernel,
        grid=(n // bt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((cout, st), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cout, s), x_cs.dtype),
        interpret=interpret,
    )(*args)


def nhwc_to_cs(x):
    """(N, H, W, C) → (C, N·H·W)."""
    n, h, w, c = x.shape
    return x.reshape(n * h * w, c).T


def cs_to_nhwc(x_cs, n, h, w):
    """(C, N·H·W) → (N, H, W, C)."""
    return x_cs.T.reshape(n, h, w, x_cs.shape[0])
