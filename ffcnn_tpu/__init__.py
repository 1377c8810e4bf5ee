"""ffcnn-tpu: a TPU-native Darknet/YOLO inference framework (JAX/XLA/Pallas)
with the capabilities of rockcarry/ffcnn.  See README.md and SURVEY.md."""

import os

from .darknet import parse_cfg, dump, load_weights

__version__ = "0.1.0"
__all__ = ["Net", "Detection", "load", "parse_cfg", "dump", "load_weights",
           "DEFAULT_MEAN", "DEFAULT_NORM", "enable_compile_cache"]

# net.py pulls in jax; keep it lazy (PEP 562) so host-only paths — cfg
# parsing, `ffcnn dump`, the pure-numpy codec — never pay JAX startup.
_NET_EXPORTS = ("Net", "Detection", "load", "DEFAULT_MEAN", "DEFAULT_NORM")


def __getattr__(name):
    if name in _NET_EXPORTS:
        from . import net
        return getattr(net, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def enable_compile_cache(cache_dir: str | None = None) -> str:
    """Enable JAX's persistent XLA compilation cache — the serving analog of
    the reference's PGO build modes (build.sh:35-41): pay the full-graph
    compile once per (model, batch, size) and reload it on every later
    process start.  Measured on the flagship pipeline: cold start 286 s →
    7 s.  Must run before the first jit compilation; the CLI and server
    enable it by default (FFCNN_NO_COMPILE_CACHE=1 opts out)."""
    import jax

    cache_dir = cache_dir or os.environ.get(
        "FFCNN_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "ffcnn_tpu", "xla"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache_dir
