"""Pooling with the reference's centered-window semantics.

The reference centers each window on the *input* position ``ox*stride`` with
offset ``-(fs-1)//2`` and clamps it to the tensor bounds (ffcnn.c:337-372);
avgpool divides by the full ``fs*fs`` even for clipped border windows
(ffcnn.c:351), and output dims are ``floor(dim/stride)`` (ffcnn.c:156-157).

On TPU this maps to one ``lax.reduce_window``: -inf padding reproduces the
clamped max; zero padding + constant divisor reproduces the clipped-window
average.  Any extra trailing window positions (when ``dim % stride != 0``)
are sliced off to match the floor dims.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _padding(size: int, fs: int, stride: int):
    """Low/high spatial padding so window i sits at ``i*stride - (fs-1)//2``
    and the last kept window (index size//stride - 1) fits."""
    osize = size // stride
    lo = (fs - 1) // 2
    hi = max(0, (osize - 1) * stride - lo + fs - size)
    return lo, hi, osize


def maxpool2d(x, fs: int, stride: int):
    """(N, H, W, C) centered max pool."""
    _, h, w, _ = x.shape
    ylo, yhi, oh = _padding(h, fs, stride)
    xlo, xhi, ow = _padding(w, fs, stride)
    neg = jnp.asarray(-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
                      else jnp.iinfo(x.dtype).min, x.dtype)
    y = lax.reduce_window(
        x, neg, lax.max,
        window_dimensions=(1, fs, fs, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (ylo, yhi), (xlo, xhi), (0, 0)))
    return y[:, :oh, :ow]


def avgpool2d(x, fs: int, stride: int):
    """(N, H, W, C) centered avg pool with the reference's constant fs*fs
    divisor (clipped windows sum fewer terms but still divide by fs*fs)."""
    _, h, w, _ = x.shape
    ylo, yhi, oh = _padding(h, fs, stride)
    xlo, xhi, ow = _padding(w, fs, stride)
    y = lax.reduce_window(
        x, jnp.asarray(0, x.dtype), lax.add,
        window_dimensions=(1, fs, fs, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (ylo, yhi), (xlo, xhi), (0, 0)))
    return (y * jnp.asarray(1.0 / (fs * fs), y.dtype))[:, :oh, :ow]


def upsample_nearest(x, stride: int):
    """Nearest-neighbor upsample ×stride (ffcnn.c:396-410):
    out[y, x] = in[y//s, x//s].  jnp.repeat compiles to a broadcast+reshape,
    which XLA fuses into the consumer."""
    return jnp.repeat(jnp.repeat(x, stride, axis=1), stride, axis=2)
