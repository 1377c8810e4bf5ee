#!/usr/bin/env python
"""Build the _ffcnn_native C extension in place.

Usage: python native/build.py [--force]

Compiles native/bmp_codec.c to ffcnn_tpu/_ffcnn_native.<abi>.so with the
interpreter's own include/ABI config (no numpy C API, no pybind11).  The
Python package works without the extension (pure-numpy fallback in
imageio/bmp.py); building it accelerates host-side image IO.
"""
import os
import subprocess
import sys
import sysconfig

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "native", "bmp_codec.c")


def build(force=False):
    ext = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(ROOT, "ffcnn_tpu", "_ffcnn_native" + ext)
    if not force and os.path.exists(out) and (
            os.path.getmtime(out) >= os.path.getmtime(SRC)):
        print(f"up to date: {out}")
        return out
    include = sysconfig.get_path("include")
    cc = os.environ.get("CC", "gcc")
    cmd = [cc, "-O2", "-Wall", "-shared", "-fPIC", f"-I{include}",
           SRC, "-o", out, "-lpthread"]
    print(" ".join(cmd))
    subprocess.check_call(cmd)
    return out


if __name__ == "__main__":
    build(force="--force" in sys.argv)
