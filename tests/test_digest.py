"""tools/digest_onchip.py must render every artifact the queue can
produce — it runs unattended as the queue's last stage, and a crash
there would silently drop the round's measured evidence."""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import digest_onchip  # noqa: E402


def test_digest_renders_all_sections(tmp_path):
    d = tmp_path / "onchip"
    d.mkdir()
    (d / "regions.jsonl").write_text("\n".join([
        json.dumps({"config": "baseline_minc24", "img_s": 39000.0,
                    "ms_batch": 6.5, "golden_ok": True,
                    "golden_batch_ok": True, "env": {}}),
        json.dumps({"config": "down_minc8_f32", "img_s": 45000.0,
                    "ms_batch": 5.7, "golden_ok": True,
                    "golden_batch_ok": True,
                    "env": {"FFCNN_FUSED_DOWN": "1"}}),
        json.dumps({"config": "broken", "error": "timeout 1500s"}),
        "not json at all",
    ]))
    (d / "int8_minc24.json").write_text(json.dumps(
        {"img_s": 41000.0, "golden_ok": True, "golden_batch_ok": True,
         "env": {"FFCNN_INT8_MINC": "24"}}))
    (d / "tuning.json").write_text(json.dumps(
        {"flags": {"FFCNN_FUSED_DOWN": "1"}}))
    (d / "bench.json").write_text(json.dumps(
        {"metric": "t", "value": 45000.0, "unit": "img/s/chip"}))
    (d / "stream.json").write_text(json.dumps(
        {"serial_img_s": 30000.0, "stream_img_s": 38000.0,
         "speedup": 1.27, "results_identical": True}))
    (d / "gaps.log").write_text("gap A 0.4ms\ngap B 0.2ms\n")
    (d / "profile_floors.txt").write_text("conv 5184 us\n")
    (d / "drift_fast_tpu.log").write_text(
        "[flagship[fast] vs v0] 11/48 exact; drift: 82/83 paired\n")
    (d / "rows.jsonl").write_text(json.dumps({"rows": 10}) + "\n")
    (d / "tuning3.json").write_text(json.dumps(
        {"flags": {"FFCNN_FUSED_CASCADE": "4"}}))
    (d / "bisect_bf16.jsonl").write_text(json.dumps(
        {"geom": "80x80/C8/E48", "batch": 256, "store": "bf16",
         "dense_MB": 52.4, "tiled_MB": 104.9, "copy": 310.0,
         "dwonly": 450.0, "pwonly": 600.0, "full": 810.0,
         "xla": 720.0, "tpose": 260.0}) + "\n")
    (d / "bisect_f32.jsonl").write_text(json.dumps(
        {"geom": "80x80/C8/E48", "batch": 256, "store": "f32",
         "dense_MB": 104.9, "tiled_MB": 104.9, "copy": 300.0,
         "dwonly": "FAIL XlaRuntimeError", "pwonly": 590.0,
         "full": 800.0, "xla": 700.0, "tpose": 250.0}) + "\n")
    (d / "profile_640x448.txt").write_text("conv 9000 us\n")
    (d / "accuracy_tpu.log").write_text("int8 mAP@0.5 0.962\n")
    (d / "accuracy_tpu_perch.log").write_text("int8 mAP@0.5 1.000\n")

    out = tmp_path / "digest.md"
    assert digest_onchip.main(["--dir", str(d), "--out", str(out)]) == 0
    text = out.read_text()
    for section in ("Fused-region config matrix", "int8 A/B",
                    "Tuned-defaults decision", "Headline bench",
                    "Host-input stream A/B (fast)",
                    "bubble attribution", "Measured-vs-floor",
                    "fast-mode drift", "VMEM rows boundary sweep",
                    "Cascade-depth refinement re-fold",
                    "bisection, store=bf16", "bisection, store=f32",
                    "Demo-geometry profile",
                    "TPU-side detection-set accuracy",
                    "per-channel scales + corpus calibration"):
        assert section in text, section
    assert "FAIL XlaRuntimeError" in text
    assert "down_minc8_f32" in text and "45000" in text
    # best config sorts first in the table
    assert text.index("down_minc8_f32") < text.index("baseline_minc24")


def test_digest_empty_dir(tmp_path):
    out = tmp_path / "digest.md"
    assert digest_onchip.main(["--dir", str(tmp_path / "nope"),
                               "--out", str(out)]) == 0
    assert "queue has not run" in out.read_text()
