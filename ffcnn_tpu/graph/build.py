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

import jax
import jax.numpy as jnp

from ..darknet.ir import LayerType, NetIR
from ..ops.activations import activate
from ..ops.conv import conv2d_fused
from ..ops.pool import avgpool2d, maxpool2d, upsample_nearest


def fold_input_transform(ir: NetIR, params: Dict, mean, norm) -> Dict:
    """Fold the letterbox normalize + BGR→RGB swap into the first conv.

    net_input computes ``in[c] = (bgr[2-c] - mean[c]) * norm[c]``
    (ffcnn.c:280-283); since the first conv is linear this is equivalent to
    running it directly on the raw BGR bytes with

        w'[ky,kx,cb,o] = w[ky,kx,2-cb,o] * norm[2-cb]
        bias'[o]       = bias[o] - scale[o] * Σ w[ky,kx,c,o] * norm[c] * mean[c]

    which lets the fast path skip the whole float preprocess pass — the
    uint8→float cast fuses into the conv-1 XLA fusion.  Exact-zero letterbox
    padding is preserved only for mean == 0 (the demo default, ffcnn.c:556);
    callers with a nonzero mean must use the unfolded pipeline.

    Requires the first layer to be a dense conv over all input channels."""
    first = ir.layers[0]
    if first.type != LayerType.CONV or first.groups != 1:
        raise ValueError("first layer must be a dense conv to fold input")
    p = dict(params[0])
    w = jnp.asarray(p["weights"])                       # (fs, fs, 3, fn)
    scale, bias = jnp.asarray(p["scale"]), jnp.asarray(p["bias"])
    mean = jnp.asarray(mean, w.dtype)
    norm = jnp.asarray(norm, w.dtype)
    p["weights"] = w[:, :, ::-1, :] * norm[::-1][None, None, :, None]
    s = jnp.sum(w * (norm * mean)[None, None, :, None], axis=(0, 1, 2))
    p["bias"] = bias - scale * s
    out = dict(params)
    out[0] = p
    return out


def forward_features(ir: NetIR, params: Dict, x, *, precision=None,
                     accum_dtype=jnp.float32, input_dtype=None) -> List:
    """Run the graph body.  ``x``: (N, H, W, C) net input.  Returns the raw
    (N, h, w, 3*(5+classes)) feature map feeding each yolo layer, in graph
    order.  ``params`` is a pytree {layer_index: {weights, scale, bias}} (or
    FoldedConvParams).  A non-float ``x`` (raw uint8 pixels on the folded
    fast path) is cast to ``input_dtype``; the cast fuses into conv-1."""
    if not jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(input_dtype or jnp.float32)
    nlayers = len(ir.layers)
    blobs: List[Optional[jnp.ndarray]] = [None] * (nlayers + 1)
    blobs[0] = x
    heads: List[jnp.ndarray] = []

    def run_layer(li, layer, inp):
        t = layer.type
        if t == LayerType.CONV:
            p = params[li]
            w, scale, bias = (p["weights"], p["scale"], p["bias"]) \
                if isinstance(p, dict) else (p.weights, p.scale, p.bias)
            return conv2d_fused(inp, jnp.asarray(w), jnp.asarray(scale),
                                jnp.asarray(bias), stride=layer.stride,
                                pad=layer.pad, groups=layer.groups,
                                act=layer.activation, precision=precision,
                                accum_dtype=accum_dtype)
        if t == LayerType.MAXPOOL:
            return maxpool2d(inp, layer.fs, layer.stride)
        if t == LayerType.AVGPOOL:
            return avgpool2d(inp, layer.fs, layer.stride)
        if t == LayerType.UPSAMPLE:
            return upsample_nearest(inp, layer.stride)
        if t == LayerType.DROPOUT:
            return inp                     # inference no-op (ffcnn.c:412-416)
        if t == LayerType.SHORTCUT:
            return activate(inp + blobs[layer.depends[0] + 1],
                            layer.activation)
        if t == LayerType.ROUTE:
            parts = [blobs[d + 1] for d in layer.depends]
            out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
            if layer.route_groups > 1:     # yolov4-tiny extension
                gc = out.shape[-1] // layer.route_groups
                out = out[..., layer.route_group_id * gc:
                          (layer.route_group_id + 1) * gc]
            return out
        if t == LayerType.YOLO:
            heads.append(inp)
            return None                    # yolo produces no blob (ffcnn.c:489)
        raise ValueError(f"unsupported layer type {t}")

    for li, layer in enumerate(ir.layers):
        # named_scope tags every op with its layer, so HLO fusions and
        # profiler rows map back to the net_dump table.
        with jax.named_scope(f"L{li:03d}_{layer.type.name.lower()}"):
            blobs[li + 1] = run_layer(li, layer, blobs[li])
    return heads


def params_to_pytree(params: Dict) -> Dict:
    """FoldedConvParams dict → plain nested-dict pytree (jit/pjit friendly)."""
    return {li: {"weights": jnp.asarray(p.weights),
                 "scale": jnp.asarray(p.scale),
                 "bias": jnp.asarray(p.bias)}
            for li, p in params.items()}
