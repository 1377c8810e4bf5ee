"""IR → pure-functional JAX forward pass.

The reference walks its layer array sequentially with a refcount memory
manager (net_forward, ffcnn.c:476-520); here the same graph is traced once
into a single XLA program — blob liveness, buffer reuse, and op fusion are
the compiler's job, so the refcount machinery has no equivalent.  Tracing is
a Python loop over the static layer list (unrolled at trace time; 131 layers
for yolo-fastest), so there is no dynamic control flow inside jit.

The built function maps (params, net_input) → list of raw yolo head feature
maps; decode/NMS live in postprocess so callers can also grab raw heads.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp

from ..darknet.ir import LayerType, NetIR
from ..ops.activations import activate
from ..ops.conv import conv2d_fused
from ..ops.pool import avgpool2d, maxpool2d, upsample_nearest


def forward_features(ir: NetIR, params: Dict, x, *, precision=None,
                     accum_dtype=jnp.float32) -> List:
    """Run the graph body.  ``x``: (N, H, W, C) net input.  Returns the raw
    (N, h, w, 3*(5+classes)) feature map feeding each yolo layer, in graph
    order.  ``params`` is a pytree {layer_index: {weights, scale, bias}} (or
    FoldedConvParams)."""
    nlayers = len(ir.layers)
    blobs: List[Optional[jnp.ndarray]] = [None] * (nlayers + 1)
    blobs[0] = x
    heads: List[jnp.ndarray] = []

    for li, layer in enumerate(ir.layers):
        inp = blobs[li]
        t = layer.type
        if t == LayerType.CONV:
            p = params[li]
            w, scale, bias = (p["weights"], p["scale"], p["bias"]) \
                if isinstance(p, dict) else (p.weights, p.scale, p.bias)
            out = conv2d_fused(inp, jnp.asarray(w), jnp.asarray(scale),
                               jnp.asarray(bias), stride=layer.stride,
                               pad=layer.pad, groups=layer.groups,
                               act=layer.activation, precision=precision,
                               accum_dtype=accum_dtype)
        elif t == LayerType.MAXPOOL:
            out = maxpool2d(inp, layer.fs, layer.stride)
        elif t == LayerType.AVGPOOL:
            out = avgpool2d(inp, layer.fs, layer.stride)
        elif t == LayerType.UPSAMPLE:
            out = upsample_nearest(inp, layer.stride)
        elif t == LayerType.DROPOUT:
            out = inp                      # inference no-op (ffcnn.c:412-416)
        elif t == LayerType.SHORTCUT:
            out = activate(inp + blobs[layer.depends[0] + 1],
                           layer.activation)
        elif t == LayerType.ROUTE:
            parts = [blobs[d + 1] for d in layer.depends]
            out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
            if layer.route_groups > 1:     # yolov4-tiny extension
                gc = out.shape[-1] // layer.route_groups
                out = out[..., layer.route_group_id * gc:
                          (layer.route_group_id + 1) * gc]
        elif t == LayerType.YOLO:
            heads.append(inp)
            out = None                     # yolo produces no blob (ffcnn.c:489)
        else:
            raise ValueError(f"unsupported layer type {t}")
        blobs[li + 1] = out
    return heads


def params_to_pytree(params: Dict) -> Dict:
    """FoldedConvParams dict → plain nested-dict pytree (jit/pjit friendly)."""
    return {li: {"weights": jnp.asarray(p.weights),
                 "scale": jnp.asarray(p.scale),
                 "bias": jnp.asarray(p.bias)}
            for li, p in params.items()}
