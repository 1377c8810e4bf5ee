"""Fused convolution: the TPU-native replacement for all seven reference conv
variants (conv-v0..v6).

The reference dispatches between hand-written im2row/GEMM/depthwise C loops
(conv-v6.c:481-502); on TPU one ``lax.conv_general_dilated`` covers every
case — XLA lowers pointwise (1x1) convs and im2col GEMMs onto the MXU and
depthwise convs onto the VPU, and fuses the ``act(x * scale + bias)`` epilogue
(conv-v0.c:27) into the conv output.  Grouped convs map to
``feature_group_count`` with darknet's group-major filter order, which is the
same convention XLA uses.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .activations import activate

# dimension_numbers for NHWC activations / HWIO kernels
_DN = ("NHWC", "HWIO", "NHWC")


def conv2d_fused(x, weights, scale, bias, *, stride: int, pad: int,
                 groups: int, act: int, precision=None,
                 accum_dtype=jnp.float32):
    """act((conv(x, w)) * scale + bias), NHWC.

    * ``x``: (N, H, W, C)
    * ``weights``: (fs, fs, C/groups, fn) HWIO
    * ``scale``/``bias``: (fn,) folded-BN epilogue params (ffcnn.c:229-232)

    The conv accumulates in ``accum_dtype`` (fp32 on the MXU even for bf16
    inputs via ``preferred_element_type``); the epilogue is computed in fp32
    and cast back to the activation dtype.
    """
    y = lax.conv_general_dilated(
        x, weights.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=_DN,
        feature_group_count=groups,
        precision=precision,
        preferred_element_type=accum_dtype,
    )
    y = y * scale.astype(accum_dtype) + bias.astype(accum_dtype)
    return activate(y, act).astype(x.dtype)


def conv0_int8_from_u8(x_u8, weights, scale, bias, *, stride: int, pad: int,
                       act: int, float_dtype=jnp.bfloat16):
    """First-layer conv directly on raw uint8 pixels via the int8 MXU.

    The float fast path casts the (N, H, W, 3) uint8 input to bf16 inside
    conv-1's fusion; this variant keeps the 1-byte pixels all the way into
    the MXU (halving conv-1's dominant input traffic AND using the 2x int8
    MXU rate):

      * ``x - 128`` maps u8 [0,255] onto s8 exactly — computed as
        ``bitcast(x ^ 0x80)``, one fused byte op, no wider intermediate.
      * the shift is undone EXACTLY in the epilogue: with zero padding in
        the shifted domain, ``conv_f(x) = acc + 128 * M`` where
        ``M[h,w,o] = conv(ones, wq)`` counts each position's in-bounds
        taps.  M is computed on the trace-time-constant weights, so it
        bakes into the program as a (1, oh, ow, fn) constant — border
        rows/cols get their smaller correction automatically.
      * ``weights`` are the input-folded f32 weights (fold_input_transform:
        BGR swap + normalize already inside), quantized per-output-channel
        to int8 here; the dequant ``wscale`` joins the BN-fold ``scale`` in
        the one fused epilogue multiply.

    Only the weight quantization is approximate (7-bit mantissa vs bf16's
    8) — measured inside the fast-mode golden tolerance.  The reference
    has no analog (its conv-v6 1x1 path is float, conv-v6.c:46-91); this
    exists because conv-1 is the single hottest op on the chip."""
    w = jnp.asarray(weights, jnp.float32)                  # (fs, fs, 3, fn)
    wmax = jnp.max(jnp.abs(w), axis=(0, 1, 2))
    wscale = jnp.where(wmax > 0, wmax / 127.0, 1.0)        # (fn,)
    wq = jnp.round(w / wscale).astype(jnp.int8)
    xs = lax.bitcast_convert_type(x_u8 ^ jnp.uint8(0x80), jnp.int8)
    acc = lax.conv_general_dilated(
        xs, wq, window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)), dimension_numbers=_DN,
        preferred_element_type=jnp.int32)
    ones = jnp.ones((1,) + x_u8.shape[1:], jnp.float32)
    m = lax.conv_general_dilated(
        ones, wq.astype(jnp.float32), window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)), dimension_numbers=_DN)
    eff = wscale * jnp.asarray(scale, jnp.float32)
    y = (acc.astype(jnp.float32) + 128.0 * m) * eff \
        + jnp.asarray(bias, jnp.float32)
    return activate(y, act).astype(float_dtype)


def conv2d_int8(xq, wq, x_scale: float, w_scale, bias, *, stride: int,
                pad: int, groups: int, act: int, out_scale=None,
                float_dtype=jnp.bfloat16):
    """Quantized conv: int8 activations x int8 weights -> int32 MXU
    accumulation, float epilogue, optional requantize.

    * ``xq``: (N, H, W, C) int8 with per-tensor ``x_scale`` (per-channel
      plans pre-fold the input's channel scales into ``wq`` and pass
      ``x_scale=1`` — quant.build_plan)
    * ``wq``: (fs, fs, C/groups, fn) int8, per-output-channel ``w_scale``
      (the BN-fold scale is already inside wq — see quant.build_plan)
    * epilogue: ``act(acc * (x_scale * w_scale) + bias)`` in f32
    * ``out_scale``: if set, requantize the result to int8 at that scale
      (scalar or per-channel (fn,) vector); otherwise emit ``float_dtype``.

    The int8 MXU runs at 2x the bf16 rate and int8 blobs halve HBM traffic;
    the requant/dequant elementwise ops fuse into the conv epilogue.
    MEASURED (r4, v5e, darknet scale): the mode never realizes a net win —
    36,292 img/s vs fast's 38,931 at batch 256 (C<24 float fallbacks and
    requant epilogues outweigh both effects), and wide-corpus mAP@0.5 is
    0.73-0.78 vs fast's 0.96 (docs/PERF_NOTES.md round 4).  Kept, tested,
    for C>=24-heavy models; fast mode is the deployment default.
    """
    acc = lax.conv_general_dilated(
        xq, wq,
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=_DN,
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )
    eff = (w_scale.astype(jnp.float32) * jnp.float32(x_scale))
    y = acc.astype(jnp.float32) * eff + bias.astype(jnp.float32)
    y = activate(y, act)
    if out_scale is None:
        return y.astype(float_dtype)
    return jnp.clip(jnp.round(y * jnp.asarray(1.0 / np.asarray(
        out_scale, np.float32))),
                    -127, 127).astype(jnp.int8)
