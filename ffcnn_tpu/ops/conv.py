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
