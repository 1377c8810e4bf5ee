"""AOT deployment artifacts: one serialized, weights-baked program per
(batch, image-size) bucket.

The reference ships a 68 KB self-contained binary (readme.txt:128-129) — no
runtime deps, weights loaded beside it.  The TPU-native analog is a
``jax.export`` artifact: the whole pixels-to-boxes pipeline (preprocess,
131-layer forward with the weights folded in as constants, decode, NMS)
serialized as versioned StableHLO with a stability guarantee, loadable by a
serving process that has neither the cfg/weights pair nor this framework's
graph builder — just ``load_exported(path)`` and pixels.

Unlike the persistent XLA compile cache (``enable_compile_cache`` — a
per-machine compile-time optimization), an exported artifact is a portable
file with a defined compatibility window, the right shape for model
registries / fleet rollout.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _register_result_types() -> None:
    """jax.export serializes pytree structure by registered name; register
    NMSResult once (idempotent) so artifacts carry it across processes."""
    from jax import export as jexport

    from .ops.nms import NMSResult
    try:
        jexport.register_namedtuple_serialization(
            NMSResult, serialized_name="ffcnn_tpu.NMSResult")
    except ValueError:
        pass                                   # already registered


_register_result_types()


def export_net(net, path: str, *, batch_size: int = 1,
               image_size: Optional[Tuple[int, int]] = None,
               mean=None, norm=None,
               platforms: Optional[Sequence[str]] = None) -> int:
    """Serialize ``net``'s jitted pipeline for one (batch, H, W) bucket to
    ``path``.  Returns the artifact size in bytes.

    ``image_size``: (H, W) of the *incoming images* (defaults to the net
    input size).  ``platforms``: lowering platforms (e.g. ``["tpu"]``);
    defaults to the current backend.

    The pipeline captures the folded weights as constants (net.py bakes
    them per bucket), so the artifact is self-contained.  Pallas kernels
    and other backend custom calls serialize as custom-call ops; they are
    allowed explicitly on retry since their ABI stability is the
    backend's, not StableHLO's — the artifact then requires a compatible
    libtpu, which a deployment pins anyway."""
    from jax import export as jexport

    from .net import DEFAULT_MEAN, DEFAULT_NORM

    net_w, net_h = net.ir.blobs[0].w, net.ir.blobs[0].h
    img_h, img_w = image_size or (net_h, net_w)
    fn = net._pipeline_for(img_h, img_w, mean or DEFAULT_MEAN,
                           norm or DEFAULT_NORM)
    spec = jax.ShapeDtypeStruct((batch_size, img_h, img_w, 3), jnp.uint8)
    kw = {"platforms": list(platforms)} if platforms else {}
    try:
        exp = jexport.export(fn, **kw)(spec)
    except ValueError as e:
        # Allow exactly the custom-call targets the lowering used (Pallas
        # / backend ops); anything else still fails loudly.
        targets = sorted(set(re.findall(r"custom_call\s+(?:target\s+)?"
                                        r"['\"]([\w.\-]+)['\"]", str(e))))
        if not targets:
            raise
        kw["disabled_checks"] = [
            jexport.DisabledSafetyCheck.custom_call(t) for t in targets]
        exp = jexport.export(fn, **kw)(spec)
    blob = exp.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)


@dataclasses.dataclass(frozen=True)
class ExportedNet:
    """A deserialized pipeline artifact.  ``call(batch)`` runs the whole
    pixels-to-boxes program; input must match the exported (N, H, W, 3)
    uint8 spec exactly (one artifact per bucket, like the jit cache)."""
    _exported: object
    in_shape: Tuple[int, ...]
    platforms: Tuple[str, ...]

    def call(self, batch):
        batch = jnp.asarray(batch)
        if tuple(batch.shape) != self.in_shape or batch.dtype != jnp.uint8:
            raise ValueError(
                f"artifact expects uint8{list(self.in_shape)}, got "
                f"{batch.dtype}{list(batch.shape)}")
        return self._exported.call(batch)


def load_exported(path: str) -> ExportedNet:
    """Load an :func:`export_net` artifact.  Needs only this function and
    jax — no cfg, no weights file, no graph builder."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exp = jexport.deserialize(f.read())
    (spec,) = exp.in_avals
    return ExportedNet(_exported=exp, in_shape=tuple(spec.shape),
                       platforms=tuple(exp.platforms))
