"""Activation functions (reference: utils.h:15-23, applied in conv epilogues,
shortcuts, and YOLO decode).  All are jit-safe elementwise ops that XLA fuses
into the producing conv/add."""

from __future__ import annotations

import jax.numpy as jnp

from ..darknet.ir import Activation


def activate(x, act: int):
    """Dispatch on the *static* activation id at trace time.  Unknown ids fall
    through to linear, matching the reference's switch default."""
    if act == Activation.RELU:
        return jnp.maximum(x, 0)
    if act == Activation.LEAKY:
        # leaky slope 0.1 (utils.h:19)
        return jnp.where(x > 0, x, x * jnp.asarray(0.1, x.dtype))
    if act == Activation.SIGMOID or act == Activation.LOGISTIC:
        return jnp.reciprocal(1 + jnp.exp(-x))
    if act == Activation.MISH:
        # yolov4 extension: x * tanh(softplus(x))
        return x * jnp.tanh(jnp.log1p(jnp.exp(x)))
    if act == Activation.SWISH:
        return x * jnp.reciprocal(1 + jnp.exp(-x))
    return x
