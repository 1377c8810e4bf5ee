"""The backend-bug retest sweep (tools/retest_backend_bugs.py) is the
round-5+ triage path for toolchain updates (docs/ROADMAP.md #2): its
probe registry and subprocess plumbing must not bit-rot.  The GSPMD
probe doubles as a live regression witness for the windowed-conv
miscompile that parallel/dp.py works around — if it ever reports FIXED,
the replication fallback can be lifted."""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "retest_backend_bugs.py")


def test_probe_registry_lists_all_recorded_bugs():
    out = subprocess.run([sys.executable, TOOL, "--list"],
                         capture_output=True, text=True, timeout=60)
    assert out.returncode == 0, out.stderr
    names = [ln.split()[0] for ln in out.stdout.strip().splitlines()]
    # one probe per entry in PERF_NOTES "Backend bugs" + the r4 additions
    assert names == [
        "gspmd_windowed_conv_tp_sp",
        "mosaic_strided_load_16bit",
        "mosaic_dynslice_carry",
        "while_dot_general_wedge",
        "minc8_aot_death",
        "vmem_160_full_block",
        "dwonly_2d_gather",
        "reduce_bitcast_fusion_livelock",
        "reduce_broadcast_fusion_livelock",
    ]
    # wedge probes must never run without the explicit opt-in flag
    for ln in out.stdout.strip().splitlines():
        if "livelock" in ln.split()[0]:
            assert "wedge" in ln


def test_only_does_not_bypass_the_wedge_gate(tmp_path):
    """A chip-livelock reproducer must refuse to run via --only without
    the explicit --include-wedges opt-in."""
    out = subprocess.run(
        [sys.executable, TOOL, "--only", "reduce_bitcast_fusion_livelock",
         "--out", str(tmp_path / "bb.jsonl")],
        capture_output=True, text=True, timeout=60)
    assert out.returncode != 0
    assert "include-wedges" in out.stderr
    assert not (tmp_path / "bb.jsonl").exists() or \
        not (tmp_path / "bb.jsonl").read_text().strip()


def test_gspmd_probe_runs_and_records(tmp_path):
    ledger = tmp_path / "bb.jsonl"
    out = subprocess.run(
        [sys.executable, TOOL, "--only", "gspmd_windowed_conv_tp_sp",
         "--out", str(ledger)],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr
    recs = [json.loads(ln) for ln in ledger.read_text().splitlines()]
    assert len(recs) == 1
    rec = recs[0]
    assert rec["probe"] == "gspmd_windowed_conv_tp_sp"
    # FIXED would be news (lift dp.py's replication fallback); SKIP means
    # the child could not get an 8-device CPU mesh; BROKEN is current state.
    assert rec["status"] in ("BROKEN", "FIXED", "SKIP")
    if rec["status"] == "BROKEN":
        assert "dev" in rec["detail"]
