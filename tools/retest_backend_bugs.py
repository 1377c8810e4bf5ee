#!/usr/bin/env python
"""Backend-bug retest sweep: one command that re-runs the minimal
reproducers for every toolchain bug this project has hit (axon/Mosaic/
XLA-TPU stack, jax 0.9), so a jax/libtpu/axon update can be triaged in
minutes.  Each bug that turns FIXED reopens a parked perf lever
(docs/ROADMAP.md "Round 5 candidates" #2; bug ledger in
docs/PERF_NOTES.md "Backend bugs").

Every probe runs in a fresh subprocess with a hard timeout, so compiler
hangs are contained.  Probe classes:

* safe    — CPU-only (the GSPMD windowed-conv miscompile); always run.
* device  — need the real chip but only risk their own process
            (Mosaic lowering limits, the while+dot_general compiler
            wedge, the minc8 silent AOT death, the 160x160 scoped-VMEM
            OOM).  Enable with --device.
* wedge   — KNOWN TO LIVELOCK THE CHIP until the tunnel resets
            (~5-15 min): the reduce+bitcast and reduce+broadcast fusion
            bugs.  Enable with --include-wedges; they run LAST and the
            sweep then waits for tpu_health to recover.

Output: one line per probe + a jsonl ledger (--out).  Exit 0 means "all
probes behaved as currently recorded" is NOT the semantics — exit 0
simply means the sweep completed; read the FIXED/BROKEN column.

    /opt/venv/bin/python tools/retest_backend_bugs.py                # safe only
    /opt/venv/bin/python tools/retest_backend_bugs.py --device
    /opt/venv/bin/python tools/retest_backend_bugs.py --device --include-wedges
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PY = sys.executable

# ---------------------------------------------------------------- probes

GSPMD_WINDOWED = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
devs = jax.devices()
if len(devs) < 8:
    print("PROBE_SKIP: need XLA_FORCE 8 cpu devices, got %d" % len(devs))
    raise SystemExit(0)
mesh = Mesh(np.array(devs[:8]).reshape(2, 2, 2), ("data", "spatial", "model"))
rng = np.random.RandomState(0)
x = rng.randn(4, 16, 16, 8).astype(np.float32)
k = rng.randn(3, 3, 8, 8).astype(np.float32)
def conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
ref = np.asarray(jax.jit(conv)(x, k))
xs = jax.device_put(x, NamedSharding(mesh, P("data", "spatial")))
ks = jax.device_put(k, NamedSharding(mesh, P(None, None, None, "model")))
got = np.asarray(jax.jit(conv)(xs, ks))
dev = float(np.max(np.abs(got - ref)))
print("PROBE_FIXED" if dev < 1e-4 else "PROBE_BROKEN: max |dev| %.4g" % dev)
"""

MOSAIC_STRIDED_16 = r"""
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
def kern(x_ref, o_ref):
    o_ref[...] = x_ref[::2, :]
x = jnp.arange(16 * 128, dtype=jnp.float32).astype(jnp.bfloat16).reshape(16, 128)
try:
    y = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.bfloat16))(x)
    ok = bool(jnp.all(y == x[::2, :]))
    print("PROBE_FIXED" if ok else "PROBE_BROKEN: wrong values")
except Exception as e:
    print("PROBE_BROKEN: %s: %s" % (type(e).__name__, str(e)[:160]))
"""

MOSAIC_DYNSLICE_CARRY = r"""
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
def kern(x_ref, o_ref):
    def body(i, acc):
        seg = lax.dynamic_slice(acc, (i, 0), (8, 128))   # carried VALUE, dyn start
        return jnp.concatenate([seg, seg], axis=0)
    o_ref[...] = lax.fori_loop(0, 3, body, x_ref[...])
x = jnp.arange(16 * 128, dtype=jnp.float32).reshape(16, 128)
try:
    y = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32))(x)
    jax.block_until_ready(y)
    print("PROBE_FIXED")
except Exception as e:
    print("PROBE_BROKEN: %s: %s" % (type(e).__name__, str(e)[:160]))
"""

WHILE_DOT_GENERAL = r"""
import jax, jax.numpy as jnp
from jax import lax
M = jnp.full((4, 64, 64), 0.01, jnp.float32)
def cond(s):
    return s[0] < 3
def body(s):
    i, v = s
    nv = lax.dot_general(M, v, (((2,), (1,)), ((0,), (0,))))  # batched matvec
    return i + 1, jnp.tanh(nv)
f = jax.jit(lambda v: lax.while_loop(cond, body, (0, v))[1])
y = f(jnp.ones((4, 64), jnp.float32))
jax.block_until_ready(y)
print("PROBE_FIXED")
"""

MINC8_AOT = r"""
import os
os.environ["FFCNN_FUSED_DOWN"] = "1"
os.environ["FFCNN_FUSED_MINC"] = "8"
os.environ["FFCNN_TUNED_DEFAULTS"] = ""      # no tuned-file interference
import sys
sys.path.insert(0, {REPO})
import jax
import jax.numpy as jnp
from ffcnn_tpu import Net
net = Net.load({CFG}, {WEIGHTS}, mode="fast")
x = jnp.zeros((8, 320, 320, 3), jnp.uint8)
r = net.detect_device(x)
jax.block_until_ready(r)
print("PROBE_FIXED")
"""

VMEM_160_FULL = r"""
import sys
sys.path.insert(0, {REPO})
sys.path.insert(0, {REPO} + "/tools")
import numpy as np, jax, jax.numpy as jnp
import bisect_smallc as bs
label, H, W, C, E = bs.GEOMS[0]                    # 160x160/C8/E32
shapes = [(E, C), (E, 1), (E, 1), (3, 3, E), (E, 1), (E, 1),
          (C, E), (C, 1), (C, 1)]
rng = np.random.RandomState(0)
p9 = [jnp.asarray(rng.randn(*s).astype(np.float32) * 0.1) for s in shapes]
step = bs.variant_step("full", H, W, 256, C, E, p9, jnp.bfloat16)
x = jnp.zeros((H, C, W * 256), jnp.bfloat16)
try:
    y = jax.jit(step)(x)
    jax.block_until_ready(y)
    print("PROBE_FIXED")
except Exception as e:
    msg = str(e)
    tag = "scoped-VMEM OOM" if "vmem" in msg.lower() else type(e).__name__
    print("PROBE_BROKEN: %s: %s" % (tag, msg[:160]))
"""

DWONLY_GATHER = r"""
import sys
sys.path.insert(0, {REPO})
sys.path.insert(0, {REPO} + "/tools")
import numpy as np, jax, jax.numpy as jnp
import bisect_smallc as bs
label, H, W, C, E = bs.GEOMS[3]                    # 20x20/C24/E136
shapes = [(E, C), (E, 1), (E, 1), (3, 3, E), (E, 1), (E, 1),
          (C, E), (C, 1), (C, 1)]
rng = np.random.RandomState(0)
p9 = [jnp.asarray(rng.randn(*s).astype(np.float32) * 0.1) for s in shapes]
step = bs.variant_step("dwonly", H, W, 8, C, E, p9, jnp.bfloat16)
x = jnp.zeros((H, C, W * 8), jnp.bfloat16)
try:
    y = jax.jit(step)(x)
    jax.block_until_ready(y)
    print("PROBE_FIXED")
except Exception as e:
    msg = str(e)
    tag = ("Mosaic 2D-gather limit" if "gather" in msg.lower()
           else type(e).__name__)
    print("PROBE_BROKEN: %s: %s" % (tag, msg[:160]))
"""

REDUCE_BITCAST = r"""
import jax, jax.numpy as jnp
from jax import lax
import numpy as np
x = jnp.asarray(np.random.RandomState(0).rand(8, 80).astype(np.float32))
def packed_argmax(x):
    u = lax.bitcast_convert_type(x.astype(jnp.bfloat16), jnp.uint16)
    key = (u.astype(jnp.uint32) << 16) | jnp.arange(
        x.shape[-1], dtype=jnp.uint32)[None, :]
    m = jnp.max(key, axis=-1)                         # reduce fused w/ bit ops
    return (m & jnp.uint32(0xFFFF)).astype(jnp.int32)
y = jax.jit(packed_argmax)(x)
got = np.asarray(y)                  # the bug is a LIVELOCK: finishing = fixed
print("PROBE_FIXED (completed; got %s)" % got[:4])
"""

REDUCE_BROADCAST = r"""
import jax, jax.numpy as jnp
import numpy as np
x = jnp.asarray(np.random.RandomState(0).rand(8, 80).astype(np.float32))
def argmax_via_eq(x):
    mx = jnp.max(x, axis=-1)                          # reduce #1
    K = x.shape[-1]
    iota = jnp.arange(K, dtype=jnp.int32)
    hit = jnp.where(x == mx[..., None], iota[None], K)  # broadcast of reduce
    return jnp.min(hit, axis=-1)                      # reduce #2, one fusion
y = jax.jit(argmax_via_eq)(x)
got = np.asarray(y)
ref = np.argmax(np.asarray(x), axis=-1)
print("PROBE_FIXED" if (got == ref).all() else
      "PROBE_BROKEN: wrong argmax %s vs %s" % (got[:4], ref[:4]))
"""

CFG = "/root/reference/yolo-fastest-1.1.cfg"
WEIGHTS = "/root/reference/yolo-fastest-1.1.weights"


def _fill(code: str) -> str:
    return (code.replace("{REPO}", repr(REPO))
                .replace("{CFG}", repr(CFG))
                .replace("{WEIGHTS}", repr(WEIGHTS)))

PROBES = [
    # (name, class, timeout_s, code, ledger note while BROKEN)
    ("gspmd_windowed_conv_tp_sp", "safe", 240, GSPMD_WINDOWED,
     "GSPMD miscompiles windowed dense conv under spatial+model sharding; "
     "parallel/dp.py replicates windowed convs under spatial>1"),
    ("mosaic_strided_load_16bit", "device", 300, MOSAIC_STRIDED_16,
     "Mosaic strided loads are 32-bit-only; 16-bit kernels avoid them"),
    ("mosaic_dynslice_carry", "device", 300, MOSAIC_DYNSLICE_CARRY,
     "Mosaic: dynamic_slice on loop-carried values unsupported"),
    ("while_dot_general_wedge", "device", 180, WHILE_DOT_GENERAL,
     "batched-matvec dot_general inside while_loop wedges the compiler; "
     "ops/nms.py uses the broadcast-any sweep instead"),
    ("minc8_aot_death", "device", 600, _fill(MINC8_AOT),
     "FFCNN_FUSED_MINC<=8 full-net programs die rc=1 silently in the axon "
     "AOT compile; blocks the stem->region path (conv0 lever)"),
    ("vmem_160_full_block", "device", 420, _fill(VMEM_160_FULL),
     "160x160/C8 full fused block exceeds the 100MB scoped-VMEM limit "
     "(needs in-kernel row chunking)"),
    ("dwonly_2d_gather", "device", 300, _fill(DWONLY_GATHER),
     "Mosaic rejects the standalone dw-tap kernel ('Only 2D gather is "
     "supported') — the small-C bisect's dwonly leg is attributed by "
     "subtraction (full - pwonly) until this lowers"),
    ("reduce_bitcast_fusion_livelock", "wedge", 90, REDUCE_BITCAST,
     "last-axis reduce fused with u16 bitcast+shift LIVELOCKS the chip"),
    ("reduce_broadcast_fusion_livelock", "wedge", 90, REDUCE_BROADCAST,
     "last-axis reduce fused with a broadcast of another reduce's result "
     "LIVELOCKS the chip"),
]


def run_probe(name, cls, timeout, code):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    if cls == "safe":
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                            " --xla_force_host_platform_device_count=8").strip()
    t0 = time.time()
    try:
        p = subprocess.run([PY, "-c", code], env=env, timeout=timeout,
                           capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        return {"probe": name, "status": "BROKEN", "secs": round(timeout, 1),
                "detail": "timeout after %ds (hang — the recorded failure "
                          "mode for this bug class)" % timeout}
    secs = round(time.time() - t0, 1)
    out, err = p.stdout.strip(), p.stderr.strip()
    if "PROBE_FIXED" in out:
        return {"probe": name, "status": "FIXED", "secs": secs, "detail": out}
    if "PROBE_SKIP" in out:
        return {"probe": name, "status": "SKIP", "secs": secs, "detail": out}
    if "PROBE_BROKEN" in out:
        return {"probe": name, "status": "BROKEN", "secs": secs,
                "detail": out.split("PROBE_BROKEN:", 1)[1].strip()[:300]}
    silent = "Traceback" not in err
    tail = (err.splitlines() or ["<no stderr>"])[-1][:300]
    return {"probe": name, "status": "BROKEN", "secs": secs,
            "detail": "rc=%d %s: %s" % (
                p.returncode,
                "SILENT (no traceback)" if silent else "raised", tail)}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", action="store_true",
                    help="include probes that need the real chip")
    ap.add_argument("--include-wedges", action="store_true",
                    help="ALSO run the chip-livelock reproducers (run last; "
                         "expect a 5-15 min tunnel reset after a BROKEN one)")
    ap.add_argument("--only", help="run a single probe by name")
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--out", default="/tmp/backend_bugs.jsonl")
    args = ap.parse_args(argv)

    sel = []
    for name, cls, timeout, code, note in PROBES:
        if args.only and name != args.only:
            continue
        # The class opt-ins gate --only too: a wedge probe in its current
        # BROKEN state livelocks the chip for 5-15 min — that must never
        # happen from a probe name typed without --include-wedges.
        if cls == "wedge" and not args.include_wedges:
            if args.only:
                ap.error(f"{name} is a chip-livelock reproducer; "
                         "add --include-wedges to run it")
            continue
        if cls == "device" and not (args.device or args.only):
            continue
        sel.append((name, cls, timeout, code, note))
    if args.list:
        for name, cls, timeout, _, note in PROBES:
            print("%-34s %-6s %4ds  %s" % (name, cls, timeout, note))
        return 0

    n_fixed = 0
    with open(args.out, "a") as f:
        for name, cls, timeout, code, note in sel:
            rec = run_probe(name, cls, timeout, code)
            rec["class"], rec["note"] = cls, note
            f.write(json.dumps(rec) + "\n")
            print("%-34s %-7s %7.1fs  %s"
                  % (name, rec["status"], rec["secs"], rec["detail"][:120]),
                  flush=True)
            n_fixed += rec["status"] == "FIXED"
            if cls == "wedge" and rec["status"] == "BROKEN":
                print("  (chip may be livelocked; waiting for tpu_health)",
                      flush=True)
                subprocess.run([PY, os.path.join(REPO, "tools",
                                                 "tpu_health.py"),
                                "--wait", "60"], timeout=1800)
    if n_fixed:
        print("\n%d probe(s) FIXED — reopen the matching parked levers "
              "(docs/ROADMAP.md, docs/PERF_NOTES.md 'Backend bugs')" % n_fixed)
    return 0


if __name__ == "__main__":
    sys.exit(main())
