#!/usr/bin/env python
"""Same-window ledger A/B for FFCNN_PARITY_PRECISION (fold discipline).

The standing fold rule (docs/ROADMAP.md) is that a default flip needs a
bench.py-harness A/B inside one tunnel window: region-harness wins have
inverted in the ledger before (casc3, tuned_defaults.json provenance).
This tool runs bench.py's OWN parity gate + timing machinery on both
arms in a single process, and *interleaves* the timed windows
(A,B,A,B,...) so tunnel drift within the window hits both arms equally
— strictly stronger than the sequential pair bench_flags measured
(r5c: base 11,145.4 vs high 12,749.6 img/s in adjacent windows).

Arms (the knob is consumed at Net construction, ffcnn_tpu/net.py):
  base: FFCNN_PARITY_PRECISION=highest — 6-pass bf16 MXU emulation,
        print-precision exact vs the C reference by construction.
  high: FFCNN_PARITY_PRECISION=high — 3-pass (drops the lo*lo term,
        ~2e-5 relative conv error); exactness is EMPIRICAL and must be
        re-proven per corpus (golden gates here; the wide-tier device
        run and the verbatim C differential ride in the same queue).

Prints one JSON line:
  {"base_img_s": .., "high_img_s": .., "speedup": ..,
   "base_windows": [..], "high_windows": [..],
   "golden_base": true, "golden_high": true, "batch": 256}
"""
import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# The A/B must not be poisoned by a tuned-defaults entry for the knob:
# if a future toolchain makes HIGH exact and apply_tuning folds it,
# _net(None) would otherwise resolve 'high' from the tuned file
# (env > tuned file > default) and this would silently run high-vs-high.
os.environ["FFCNN_TUNED_DEFAULTS"] = ""

import bench  # noqa: E402  — the ledger harness itself


def _net(precision):
    from ffcnn_tpu import Net
    if precision is None:
        os.environ.pop("FFCNN_PARITY_PRECISION", None)
    else:
        os.environ["FFCNN_PARITY_PRECISION"] = precision
    return Net.load(bench.CFG, bench.WEIGHTS, mode="parity")


def _golden(net):
    """bench.py's parity criterion on the 320x320 fixture (classes +
    int-cast boxes + printed scores exact).  Returns False on mismatch
    (recorded in the JSON) rather than aborting the run."""
    from ffcnn_tpu.imageio.bmp import bmp_load
    bgr = bmp_load(os.path.join(bench.FIXTURES, "test320.bmp"))
    dets = net.detect(bgr)
    try:
        bench._check_golden(
            dets, os.path.join(bench.FIXTURES, "golden_boxes_320x320.txt"))
    except AssertionError as e:
        bench.log("golden mismatch: %r" % (e,))
        return False
    return True


def main(batch=256, n_windows=5):
    import jax
    import jax.numpy as jnp
    from ffcnn_tpu import enable_compile_cache
    from ffcnn_tpu.imageio.bmp import bmp_load

    enable_compile_cache()
    net_base = _net(None)          # resolves to highest (default)
    net_high = _net("high")

    ok_base = _golden(net_base)
    ok_high = _golden(net_high)
    bench.log("golden 320x320: base=%s high=%s" % (ok_base, ok_high))

    img = bmp_load(os.path.join(bench.FIXTURES, "test320.bmp"))
    (hb,) = bench.noisy_batches(img, batch, 1, seed=0)
    bj = jnp.asarray(hb)
    # compile both buckets before any timing
    jax.block_until_ready(net_base.detect_device(bj))
    jax.block_until_ready(net_high.detect_device(bj))

    w_base, w_high = [], []
    for i in range(n_windows):
        w_base += bench._timed_windows(net_base, bj, 1)
        w_high += bench._timed_windows(net_high, bj, 1)
        bench.log("window %d: base %8.0f  high %8.0f img/s"
                  % (i, w_base[-1], w_high[-1]))
    base_med = statistics.median(w_base)
    high_med = statistics.median(w_high)
    print(json.dumps({
        "base_img_s": round(base_med, 1),
        "high_img_s": round(high_med, 1),
        "speedup": round(high_med / base_med, 4),
        "base_windows": [round(v, 1) for v in sorted(w_base)],
        "high_windows": [round(v, 1) for v in sorted(w_high)],
        "golden_base": ok_base,
        "golden_high": ok_high,
        "batch": batch,
    }))


if __name__ == "__main__":
    main(batch=int(sys.argv[1]) if len(sys.argv) > 1 else 256,
         n_windows=int(sys.argv[2]) if len(sys.argv) > 2 else 5)
