"""tuning.py: tuned-defaults resolution + the apply_tuning decision rules."""
import json
import os
import subprocess
import sys

import pytest

import ffcnn_tpu.tuning as tuning

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(autouse=True)
def _fresh_cache():
    tuning.invalidate()
    yield
    tuning.invalidate()


def test_env_wins_over_file(tmp_path, monkeypatch):
    f = tmp_path / "tuned.json"
    f.write_text(json.dumps({"flags": {"FFCNN_FUSED_DOWN": "1"}}))
    monkeypatch.setenv("FFCNN_TUNED_DEFAULTS", str(f))
    tuning.invalidate()
    assert tuning.get_flag("FFCNN_FUSED_DOWN", "0") == "1"
    monkeypatch.setenv("FFCNN_FUSED_DOWN", "0")
    assert tuning.get_flag("FFCNN_FUSED_DOWN", "1") == "0"


def test_empty_path_disables_file(monkeypatch):
    monkeypatch.setenv("FFCNN_TUNED_DEFAULTS", "")
    tuning.invalidate()
    assert tuning.get_flag("FFCNN_FUSED_MINC", "24") == "24"


def test_missing_or_corrupt_file_falls_back(tmp_path, monkeypatch):
    monkeypatch.setenv("FFCNN_TUNED_DEFAULTS", str(tmp_path / "nope.json"))
    tuning.invalidate()
    assert tuning.get_flag("FFCNN_FUSED_STORE", "input") == "input"
    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    monkeypatch.setenv("FFCNN_TUNED_DEFAULTS", str(bad))
    tuning.invalidate()
    assert tuning.get_flag("FFCNN_FUSED_STORE", "input") == "input"


def test_plan_runs_honors_tuned_file(tmp_path, monkeypatch, ref_cfg):
    from ffcnn_tpu.darknet import parse_cfg
    from ffcnn_tpu.kernels.block_fused import plan_runs
    ir = parse_cfg(ref_cfg)
    f = tmp_path / "tuned.json"
    f.write_text(json.dumps({"flags": {"FFCNN_FUSED_DOWN": "1",
                                       "FFCNN_FUSED_MINC": "1"}}))
    monkeypatch.setenv("FFCNN_TUNED_DEFAULTS", str(f))
    monkeypatch.delenv("FFCNN_FUSED_DOWN", raising=False)
    monkeypatch.delenv("FFCNN_FUSED_MINC", raising=False)
    tuning.invalidate()
    runs = plan_runs(ir)
    assert any(b.down for r in runs for b in r.blocks)
    # env still wins over the file
    monkeypatch.setenv("FFCNN_FUSED_DOWN", "0")
    runs2 = plan_runs(ir)
    assert not any(b.down for r in runs2 for b in r.blocks)


def _run_apply(tmp_path, records, margin="0.02"):
    regions = tmp_path / "regions.jsonl"
    regions.write_text("\n".join(json.dumps(r) for r in records))
    out = tmp_path / "tuned_defaults.json"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "apply_tuning.py"),
         "--regions", str(regions), "--out", str(out), "--margin", margin],
        capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr
    return out, json.loads(proc.stdout)


def test_apply_tuning_flips_on_gated_win(tmp_path):
    out, report = _run_apply(tmp_path, [
        {"config": "baseline_minc24", "env": {}, "img_s": 39000,
         "golden_ok": True, "golden_batch_ok": True},
        {"config": "down_minc8_f32", "img_s": 50000,
         "env": {"FFCNN_FUSED_DOWN": "1", "FFCNN_FUSED_MINC": "8",
                 "FFCNN_FUSED_STORE": "f32"},
         "golden_ok": True, "golden_batch_ok": True},
    ])
    assert out.exists()
    doc = json.loads(out.read_text())
    assert doc["flags"]["FFCNN_FUSED_DOWN"] == "1"
    assert doc["flags"]["FFCNN_FUSED_MINC"] == "8"
    assert report["regions"]["speedup"] > 1.2


def test_apply_tuning_ignores_ungated_and_small_wins(tmp_path):
    # faster but golden gate failed -> ineligible; small win -> no flip
    out, report = _run_apply(tmp_path, [
        {"config": "baseline_minc24", "env": {}, "img_s": 39000,
         "golden_ok": True, "golden_batch_ok": True},
        {"config": "broken_fast", "img_s": 90000,
         "env": {"FFCNN_FUSED_DOWN": "1"},
         "golden_ok": False, "golden_batch_ok": True},
        {"config": "noise_win", "img_s": 39300,
         "env": {"FFCNN_FUSED_CASCADE": "3"},
         "golden_ok": True, "golden_batch_ok": True},
    ])
    assert not out.exists()
    assert "unchanged" in report["regions"]["verdict"]


def test_apply_tuning_errors_records_skipped(tmp_path):
    out, report = _run_apply(tmp_path, [
        {"config": "baseline_minc24", "env": {}, "img_s": 39000,
         "golden_ok": True, "golden_batch_ok": True},
        {"config": "crashed", "env": {"FFCNN_FUSED_DOWN": "1"},
         "error": "timeout 1500s"},
    ])
    assert not out.exists()
    assert report["regions"]["eligible"] == 1
