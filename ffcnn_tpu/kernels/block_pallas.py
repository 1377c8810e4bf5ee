"""Fused inverted-residual block kernel (Pallas TPU).

yolo-fastest's body is a stack of MobileNet-style blocks —
``pw 1x1 expand (leaky) → dw 3x3 (leaky) → pw 1x1 reduce (linear) [+residual]``
(cfg pattern; reference executes them as three separate groupconv calls,
conv-v6.c:481-502).  Run as separate XLA ops, each conv round-trips its
activations through HBM, and the *expanded* middle tensor (4-6x the block
in/out channels) dominates the traffic; the per-layer profile shows these
blocks at ~3-6x their bandwidth bound.

This kernel keeps the whole block in VMEM: the batch is the grid, each step
loads one (BT, H, W, Cin) tile, runs

    h   = leaky(x @ w1 * s1 + b1)          # MXU, fp32 accum
    d   = leaky(dwconv3x3(h) * sd + bd)    # VPU, 9 shifted FMAs
    y   = (d @ w2) * s2 + b2 (+ res)       # MXU

and writes only the (BT, H', W', Cout) result — HBM traffic collapses to the
block boundary tensors.  Weights ride along replicated (constant index_map);
scale/bias epilogues are the load-time-folded BatchNorm (ffcnn.c:229-232).

Stride-2 blocks (no residual) subsample the dw stage exactly like the
reference's centered s2 window (pad=1 → taps at 2y+dy-1).

STATUS — experimental, NOT on the default path.  Mosaic VMEM tiles are
(sublane, 128)-lane-tiled, so channels-last blocks with C in 8..48 inflate
up to 16x and blow the 16 MB scoped-vmem budget at real batch sizes (see
docs/PERF_NOTES.md).  Superseded by the channels-first variant
(csblock_pallas.py), which compiles and is correct but still loses to XLA's
conv path on this stack; both are kept as documented negative results.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _leaky(x):
    return jnp.where(x > 0, x, x * 0.1)


def _block_kernel(x_ref, w1_ref, s1_ref, b1_ref, wd_ref, sd_ref, bd_ref,
                  w2_ref, s2_ref, b2_ref, res_ref, y_ref, pad_ref, *,
                  stride, residual, act_mid, act_out):
    bt, h, w, cin = x_ref.shape
    cmid = w1_ref.shape[1]
    cout = w2_ref.shape[1]

    # --- pw expand (MXU) ---
    x2d = x_ref[...].reshape(bt * h * w, cin)
    h1 = jax.lax.dot_general(
        x2d, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    h1 = h1 * s1_ref[...][None] + b1_ref[...][None]
    h1 = _leaky(h1) if act_mid else h1
    h1 = h1.astype(x_ref.dtype).reshape(bt, h, w, cmid)

    # --- dw 3x3 via zero-padded scratch + 9 shifted FMAs (VPU) ---
    pad_ref[...] = jnp.zeros_like(pad_ref)
    pad_ref[:, 1:h + 1, 1:w + 1, :] = h1
    oh, ow = (h // stride, w // stride) if stride == 2 else (h, w)
    acc = jnp.zeros((bt, oh, ow, cmid), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = wd_ref[dy, dx, :][None, None, None, :]
            if stride == 1:
                sl = pad_ref[:, dy:dy + h, dx:dx + w, :]
            else:
                sl = pad_ref[:, dy:dy + h:2, dx:dx + w:2, :]
            acc += sl.astype(jnp.float32) * tap.astype(jnp.float32)
    acc = acc * sd_ref[...][None, None, None] + bd_ref[...][None, None, None]
    d = _leaky(acc).astype(x_ref.dtype)

    # --- pw reduce (MXU) ---
    d2d = d.reshape(bt * oh * ow, cmid)
    y = jax.lax.dot_general(
        d2d, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = y * s2_ref[...][None] + b2_ref[...][None]
    if act_out:
        y = _leaky(y)
    if residual:
        y = y + res_ref[...].reshape(bt * oh * ow, cout).astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype).reshape(bt, oh, ow, cout)


def _pick_bt(n, h, w, cin, cmid, cout, itemsize=2,
             budget=10 * 1024 * 1024):
    """Batch tile so x/res/out blocks + padded scratch + fp32 temps fit VMEM
    (with Pallas double-buffering the HBM-blocked operands)."""
    per_img = (h * w * (cin + cout) * itemsize * 2          # x + out, 2x dbuf
               + h * w * cout * itemsize * 2                # residual
               + (h + 2) * (w + 2) * cmid * itemsize        # padded scratch
               + h * w * cmid * (4 + itemsize))             # fp32 acc + h1
    bt = max(1, budget // per_img)
    while n % bt:
        bt -= 1
    return bt


@functools.partial(
    jax.jit,
    static_argnames=("stride", "residual", "act_mid", "act_out", "interpret"))
def fused_mbconv(x, w1, s1, b1, wd, sd, bd, w2, s2, b2, res=None, *,
                 stride: int = 1, residual: bool = False, act_mid: bool = True,
                 act_out: bool = False, interpret: bool = False):
    """x (N,H,W,Cin); w1 (Cin,Cmid); wd (3,3,Cmid); w2 (Cmid,Cout);
    scales/biases per stage.  Returns (N, H/stride, W/stride, Cout)."""
    n, h, w, cin = x.shape
    cmid = w1.shape[1]
    cout = w2.shape[1]
    oh, ow = (h // stride, w // stride) if stride == 2 else (h, w)
    bt = _pick_bt(n, h, w, cin, cmid, cout, x.dtype.itemsize)
    if res is None:
        res = jnp.zeros((n, oh, ow, cout), x.dtype)

    kernel = functools.partial(_block_kernel, stride=stride,
                               residual=residual, act_mid=act_mid,
                               act_out=act_out)
    rep = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n // bt,),
        in_specs=[
            pl.BlockSpec((bt, h, w, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            rep(w1.shape), rep(s1.shape), rep(b1.shape),
            rep(wd.shape), rep(sd.shape), rep(bd.shape),
            rep(w2.shape), rep(s2.shape), rep(b2.shape),
            pl.BlockSpec((bt, oh, ow, cout), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, oh, ow, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, oh, ow, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bt, h + 2, w + 2, cmid), x.dtype),
        ],
        interpret=interpret,
    )(x, w1, s1, b1, wd, sd, bd, w2, s2, b2, res)
