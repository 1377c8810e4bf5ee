#!/usr/bin/env python
"""Cross-backend (CPU vs TPU) numeric check for the YOLOv8 ingest path.

The C reference cannot run ``[yolov8]`` graphs (the section is this
repo's extension; the independent semantic oracle is
tools/torch_yolov8_ref.py, host-only), so the device-side validation is
CPU-vs-device agreement — the analog of the darknet zoo's device sweep
(docs/PERF_NOTES.md "Device-parity zoo sweep"), but on the PRE-NMS
candidate tensor in fixed grid order: no score sorting, no NMS, so the
comparison is tie-free and measures the backbone+DFL-decode numerics
directly (same protocol as the torch differential, which reported max
dscore 3e-8 / dbox 1e-6 px on CPU).

Each arm runs in a fresh subprocess (the axon plugin ignores late
JAX_PLATFORMS, and a hung tunnel must not take the parent down) and
writes an npz; the parent compares and prints ONE JSON line:

  {"scale": "n", "size": 320, "images": N,
   "max_dscore": .., "max_dbox_px": .., "n_cells": ..}

Usage:
  /opt/venv/bin/python tools/v8_device_check.py            # both arms + diff
  /opt/venv/bin/python tools/v8_device_check.py --arm cpu  # one arm (internal)
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCALE = "n"
NC = 80
SIZE = 320
N_IMAGES = 4


def _images():
    """Deterministic workload: test.bmp + noisy variants (bench.py's
    recipe — random-noise-only frames are not a detection workload)."""
    import numpy as np
    from ffcnn_tpu.imageio.bmp import bmp_load
    img = bmp_load(os.path.join(REPO, "tests", "fixtures", "test320.bmp"))
    rng = np.random.RandomState(0)
    out = [img]
    for _ in range(N_IMAGES - 1):
        noise = rng.randint(0, 8, img.shape, dtype=np.uint8)
        out.append(np.clip(img.astype(np.int16) + noise, 0, 255)
                   .astype(np.uint8))
    return np.stack(out)


def run_arm(arm: str, out_npz: str) -> None:
    import jax
    if arm == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401  (backend init before helpers)
    import numpy as np

    from ffcnn_tpu import yolov8
    from ffcnn_tpu.darknet.cfg import parse_cfg
    from ffcnn_tpu.darknet.weights import load_weights
    from ffcnn_tpu.graph.build import params_to_pytree

    # ONE candidate program shared with the oracle fuzz — imported from
    # the PACKAGE, not tests/ (test modules import conftest, which
    # force-pins the CPU backend; that leak made this arm's first r5d
    # run silently measure CPU-vs-CPU).
    from ffcnn_tpu.yolov8 import candidates_fn as v8_candidates_fn

    sd = yolov8.synthesize_state_dict(NC, SCALE, seed=0)
    cfg, weights = yolov8.convert(sd, NC, SCALE, size=SIZE, conf=0.25)
    ir = parse_cfg(cfg, is_path=False)
    params, _ = load_weights(ir, weights)

    fn = v8_candidates_fn(ir, SIZE)
    d = jax.jit(fn)(params_to_pytree(params), jnp.asarray(_images()))
    np.savez(out_npz,
             scores=np.asarray(d.scores, np.float32),
             boxes=np.asarray(d.boxes, np.float32),
             classes=np.asarray(d.classes, np.int32),
             backend=np.array(jax.devices()[0].platform))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arm", choices=("cpu", "device"))
    ap.add_argument("--out", default="/tmp/v8_device_check")
    ap.add_argument("--timeout", type=int, default=1800)
    args = ap.parse_args()
    if args.arm:
        # --out names the artifact DIRECTORY (same meaning as in the
        # combined mode) unless an explicit .npz path is given, so a
        # manually produced arm lands where the later diff run looks.
        out = args.out
        if not out.endswith(".npz"):
            os.makedirs(out, exist_ok=True)
            out = os.path.join(out, f"{args.arm}.npz")
        run_arm(args.arm, out)
        return 0

    import numpy as np
    os.makedirs(args.out, exist_ok=True)
    res = {}
    for arm in ("cpu", "device"):
        npz = os.path.join(args.out, f"{arm}.npz")
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--arm", arm, "--out", npz],
            timeout=args.timeout, env=env,
            stdout=subprocess.DEVNULL, stderr=subprocess.PIPE, text=True)
        if p.returncode != 0:
            print("ARM %s FAILED rc=%d\n%s" % (arm, p.returncode,
                                               p.stderr[-2000:]),
                  file=sys.stderr)
            return 1
        res[arm] = np.load(npz)
    c, d = res["cpu"], res["device"]
    assert str(d["backend"]) != "cpu", "device arm ran on CPU backend"
    dscore = float(np.abs(c["scores"] - d["scores"]).max())
    dbox = float(np.abs(c["boxes"] - d["boxes"]).max())
    dcls = int((c["classes"] != d["classes"]).sum())
    print(json.dumps({
        "scale": SCALE, "size": SIZE, "images": int(c["scores"].shape[0]),
        "n_cells": int(c["scores"].shape[1]),
        "max_dscore": dscore, "max_dbox_px": dbox,
        "class_mismatches": dcls,
        "device_backend": str(d["backend"]),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
