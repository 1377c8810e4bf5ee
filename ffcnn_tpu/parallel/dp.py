"""Data-parallel batched detection over a device mesh.

Maps the reference's serial one-image loop (main, ffcnn.c:577-580) onto SPMD:
the image batch is sharded over the mesh ``data`` axis, params are replicated
(1.4 MB — replication is free), and every chip runs the identical jitted
pixels-to-boxes program on its shard.  Inference needs no cross-chip
collectives; results come back batch-sharded, and optional tensor parallelism
(``model`` axis) shards conv filters with XLA inserting the collectives.
"""

from __future__ import annotations




import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..darknet.ir import LayerType, NetIR
from ..graph.build import forward_features
from ..ops.nms import nms
from ..ops.preprocess import letterbox, letterbox_params
from ..ops.yolo import concat_heads, decode_head
from .mesh import MODEL_AXIS, batch_sharding, replicated


def build_sharded_pipeline(ir: NetIR, mesh: Mesh, img_h: int, img_w: int, *,
                           dtype=jnp.bfloat16, precision=None, topk: int = 128,
                           nms_threshold: float = 0.5,
                           shard_filters: bool = False, quant=None):
    """Return a jitted ``(params, uint8 batch, mean, norm) -> NMSResult``
    with the batch sharded over the mesh data axis.

    ``shard_filters=True`` additionally constrains each conv's output-channel
    dim to the ``model`` axis (tensor parallelism) — overkill for darknet-
    scale models but exercises the TP path end-to-end.

    ``quant``: optional QuantPlan (quant.py) — int8 composes freely with DP
    (no collectives touch the quantized blobs; int8 weights replicate like
    float ones).  Not combined with shard_filters: the per-output-channel
    weight scales would need the same sharding as the filters.  Fused
    Pallas runs are NOT traced here: a pallas_call under pjit would need
    shard_map partitioning — single-device pipelines get them instead."""
    if quant is not None and shard_filters:
        raise ValueError("int8 quant + filter sharding not supported yet")
    net_w, net_h = ir.blobs[0].w, ir.blobs[0].h
    _, _, s1, s2 = letterbox_params(img_w, img_h, net_w, net_h)
    heads_meta = [l for l in ir.layers if l.type == LayerType.YOLO]

    bshard = batch_sharding(mesh)

    def pipeline(params, bgr, mean, norm):
        x = letterbox(bgr, net_w, net_h, mean, norm, dtype=dtype)
        x = jax.lax.with_sharding_constraint(x, bshard)
        feats = forward_features(ir, params, x, precision=precision,
                                 quant=quant)
        decoded = concat_heads([
            decode_head(f.astype(jnp.float32), l, net_w, net_h)
            for f, l in zip(feats, heads_meta)])
        return nms(decoded.boxes, decoded.scores, decoded.classes,
                   k=topk, threshold=nms_threshold, scale1=s1, scale2=s2)

    def param_sharding(li, name, arr):
        if not shard_filters:
            return replicated(mesh)
        fn_axis = {"weights": 3, "scale": 0, "bias": 0}[name]
        fn = arr.shape[fn_axis]
        if fn % mesh.shape[MODEL_AXIS] != 0:
            return replicated(mesh)
        spec = [None] * arr.ndim
        spec[fn_axis] = MODEL_AXIS
        return NamedSharding(mesh, P(*spec))

    def place_params(params):
        return {li: {name: jax.device_put(arr, param_sharding(li, name, arr))
                     for name, arr in layer.items()}
                for li, layer in params.items()}

    jitted = jax.jit(pipeline,
                     in_shardings=(None, bshard, replicated(mesh),
                                   replicated(mesh)))
    return jitted, place_params
