"""FFCNN_PARITY_PRECISION — the parity-mode MXU precision knob (r5 live
thread #1).  'highest' (default) is the 6-pass bf16 f32 emulation that is
print-precision exact vs the C reference; 'high' is the 3-pass scheme
(drops the lo*lo term) measured +14% parity throughput on-chip.  On the
CPU backend both settings are true f32 dots, so the golden detections
must be exact either way — these tests guard the knob's *plumbing*
(resolution order, Net wiring, stage-independence from fast mode)."""
import jax
import numpy as np
import pytest

import conftest  # noqa: F401  (forces the CPU backend)
from ffcnn_tpu import Net
from ffcnn_tpu.imageio.bmp import bmp_load
from ffcnn_tpu.tuning import invalidate

CFG = "/root/reference/yolo-fastest-1.1.cfg"
WEIGHTS = "/root/reference/yolo-fastest-1.1.weights"
GOLDEN = [(0, 1.00, (188, 96, 273, 365)),
          (18, 0.98, (397, 125, 601, 345)),
          (16, 0.95, (68, 264, 201, 350))]


@pytest.fixture(autouse=True)
def _fresh_flags(monkeypatch):
    # isolate from any tuned_defaults.json the repo ships AND from an
    # operator's exported opt-in (docs/DEPLOY.md documents
    # FFCNN_PARITY_PRECISION=high; the suite must stay green under it)
    monkeypatch.setenv("FFCNN_TUNED_DEFAULTS", "")
    monkeypatch.delenv("FFCNN_PARITY_PRECISION", raising=False)
    invalidate()
    yield
    invalidate()


def test_default_is_highest():
    net = Net.load(CFG, WEIGHTS, mode="parity")
    assert net._precision is jax.lax.Precision.HIGHEST


def test_env_selects_high(monkeypatch):
    monkeypatch.setenv("FFCNN_PARITY_PRECISION", "high")
    net = Net.load(CFG, WEIGHTS, mode="parity")
    assert net._precision is jax.lax.Precision.HIGH


def test_tuned_file_selects_high(tmp_path, monkeypatch):
    tuned = tmp_path / "tuned.json"
    tuned.write_text('{"flags": {"FFCNN_PARITY_PRECISION": "high"}}')
    monkeypatch.setenv("FFCNN_TUNED_DEFAULTS", str(tuned))
    invalidate()
    net = Net.load(CFG, WEIGHTS, mode="parity")
    assert net._precision is jax.lax.Precision.HIGH
    # env beats the tuned file
    monkeypatch.setenv("FFCNN_PARITY_PRECISION", "highest")
    net = Net.load(CFG, WEIGHTS, mode="parity")
    assert net._precision is jax.lax.Precision.HIGHEST


def test_fast_mode_ignores_knob(monkeypatch):
    monkeypatch.setenv("FFCNN_PARITY_PRECISION", "high")
    net = Net.load(CFG, WEIGHTS, mode="fast")
    assert net._precision is None


def test_golden_exact_under_high(monkeypatch):
    """CPU backend: Precision.HIGH is still an f32 dot — parity's golden
    detections stay exact (the device-side exactness is gated on-chip by
    the wide-tier accuracy leg, docs/PERF_NOTES.md)."""
    monkeypatch.setenv("FFCNN_PARITY_PRECISION", "high")
    net = Net.load(CFG, WEIGHTS, 640, 448, mode="parity")
    img = bmp_load("/root/reference/test.bmp")
    dets = net.detect(img)
    assert len(dets) == len(GOLDEN)
    for d, (cat, score, rect) in zip(dets, GOLDEN):
        assert d.class_id == cat
        assert round(d.score, 2) == score
        assert (int(d.x1), int(d.y1), int(d.x2), int(d.y2)) == rect
