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


class ArtifactNet:
    """Net-shaped facade over exported artifacts, for serving without the
    framework's model half: ``serve.py --artifact a.ffx [...]`` gives a
    worker that holds ONLY deploy artifacts — no cfg parsing, no weights
    loading, no graph building at startup (the reference analog: shipping
    the compiled binary instead of the build tree).

    Routing: a ``detect(batch)`` call picks the artifact with the batch's
    (H, W) and the smallest exported batch >= n, padding with zero images
    (the micro-batcher already pads to powers of two, so export matching
    buckets: 1, 2, ..., max_batch)."""

    def __init__(self, paths: Sequence[str]):
        if not paths:
            raise ValueError("at least one artifact path required")
        self._buckets = {}                  # (h, w) -> [(n, ExportedNet)]
        self.paths = tuple(paths)
        for p in paths:
            art = load_exported(p)
            n, h, w, _ = art.in_shape
            self._buckets.setdefault((h, w), []).append((n, art))
        for v in self._buckets.values():
            v.sort(key=lambda t: t[0])

    @property
    def input_hw(self) -> Tuple[int, int]:
        return next(iter(self._buckets))

    @property
    def max_batch(self) -> int:
        return max(n for v in self._buckets.values() for n, _ in v)

    def _pick(self, h: int, w: int, n: int) -> ExportedNet:
        sizes = self._buckets.get((h, w))
        if sizes is None:
            raise ValueError(
                f"no artifact for {h}x{w} images (have "
                f"{sorted(self._buckets)})")
        for bn, art in sizes:
            if bn >= n:
                return art
        raise ValueError(f"batch {n} exceeds largest {h}x{w} artifact "
                         f"({sizes[-1][0]})")

    def detect(self, images):
        """(N, H, W, 3) uint8 batch -> list of Detection lists (same host
        conversion as Net.detect; no saturation retry — export the net
        with the topk the deployment needs)."""
        from .net import Net

        batch = np.asarray(images)
        n, h, w, _ = batch.shape
        art = self._pick(h, w, n)
        bn = art.in_shape[0]
        if bn != n:
            batch = np.concatenate(
                [batch, np.zeros((bn - n,) + batch.shape[1:], np.uint8)])
        res = art.call(batch)
        return Net._to_detections(res)[:n]

    def warmup(self, image_sizes=None, batch_sizes=None) -> None:
        """Run every artifact once (arguments accepted for Net interface
        compatibility; artifacts are fixed-shape so they warm themselves)."""
        for (h, w), sizes in self._buckets.items():
            for n, art in sizes:
                jax.block_until_ready(
                    art.call(np.zeros((n, h, w, 3), np.uint8)))

    def dump(self) -> str:
        """Inventory table (the graph is sealed inside the artifacts)."""
        lines = ["exported artifacts:"]
        for (h, w), sizes in sorted(self._buckets.items()):
            for n, art in sizes:
                lines.append(f"  {h}x{w} batch {n:4d}  platforms "
                             f"{','.join(art.platforms)}")
        return "\n".join(lines) + "\n"
