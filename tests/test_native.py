"""Native codec (native/bmp_codec.c) vs the pure-numpy reference paths."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_BMP = "/root/reference/test.bmp"


@pytest.fixture(scope="module")
def native():
    r = subprocess.run([sys.executable, os.path.join(REPO, "native", "build.py")],
                       capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"native build unavailable: {r.stderr[-200:]}")
    # Rebind _native in the modules that captured it at import time (they may
    # have been imported before the .so existed on a fresh checkout).
    from ffcnn_tpu import _ffcnn_native
    import ffcnn_tpu.imageio.bmp as bmp_mod
    import ffcnn_tpu.imageio.loader as loader_mod
    for m in (bmp_mod, loader_mod):
        if m._native is None:
            m._native = _ffcnn_native
    assert bmp_mod._native is not None and loader_mod._native is not None
    return _ffcnn_native


def _py_load(path):
    """Force the pure-python decode path regardless of the native module."""
    import ffcnn_tpu.imageio.bmp as bmp
    saved = bmp._native
    bmp._native = None
    try:
        return bmp.bmp_load(path)
    finally:
        bmp._native = saved


@pytest.mark.skipif(not os.path.exists(REF_BMP), reason="no reference image")
def test_load_matches_python(native):
    ba, h, w = native.bmp_load(REF_BMP)
    img = np.frombuffer(ba, np.uint8).reshape(h, w, 3)
    np.testing.assert_array_equal(img, _py_load(REF_BMP))


@pytest.mark.skipif(not os.path.exists(REF_BMP), reason="no reference image")
def test_save_roundtrip(native, tmp_path):
    img = _py_load(REF_BMP)
    out = str(tmp_path / "out.bmp")
    native.bmp_save(out, img.tobytes(), *img.shape[:2])
    np.testing.assert_array_equal(_py_load(out), img)


@pytest.mark.skipif(not os.path.exists(REF_BMP), reason="no reference image")
def test_load_batch(native):
    from ffcnn_tpu.imageio.loader import load_batch
    batch = load_batch([REF_BMP] * 5, threads=3)
    ref = _py_load(REF_BMP)
    assert batch.shape == (5,) + ref.shape
    for i in range(5):
        np.testing.assert_array_equal(batch[i], ref)


def test_batch_dim_mismatch(native, tmp_path):
    rng = np.random.RandomState(0)
    import ffcnn_tpu.imageio.bmp as bmp
    a = str(tmp_path / "a.bmp")
    b = str(tmp_path / "b.bmp")
    bmp.bmp_save(a, rng.randint(0, 255, (8, 6, 3), dtype=np.uint8))
    bmp.bmp_save(b, rng.randint(0, 255, (10, 6, 3), dtype=np.uint8))
    from ffcnn_tpu.imageio.loader import load_batch
    with pytest.raises(IOError):
        load_batch([a, b])


def test_draw_rectangle_matches_python(native):
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (40, 60, 3), dtype=np.uint8)
    from ffcnn_tpu.imageio.bmp import draw_rectangle
    py = img.copy()
    draw_rectangle(py, -5, 10, 70, 35, 200, 100, 50)   # clips at borders
    buf = bytearray(img.tobytes())
    native.draw_rectangle(buf, 40, 60, -5, 10, 70, 35, 200, 100, 50)
    got = np.frombuffer(buf, np.uint8).reshape(40, 60, 3)
    np.testing.assert_array_equal(got, py)


def test_set_getpixel_semantics():
    """setpixel clamps color + drops OOB; getpixel returns the raw +0/+1/+2
    bytes (the reference's swapped-label quirk, bmpfile.c:133-143) and
    (0,0,0) out of bounds."""
    from ffcnn_tpu.imageio.bmp import getpixel, setpixel
    img = np.zeros((4, 4, 3), np.uint8)
    setpixel(img, 1, 2, 300, -5, 7)            # clamps to (255, 0, 7)
    assert tuple(img[2, 1]) == (7, 0, 255)     # BGR storage
    assert getpixel(img, 1, 2) == (7, 0, 255)  # raw bytes, quirk preserved
    setpixel(img, 99, 0, 1, 2, 3)              # silently dropped
    assert getpixel(img, 99, 0) == (0, 0, 0)
    assert getpixel(img, -1, 0) == (0, 0, 0)


def test_native_rejects_hostile_dims(native, tmp_path):
    """Header/dimension bounds: no int overflow paths for absurd w/h."""
    import pytest
    with pytest.raises(ValueError):
        native.bmp_save(str(tmp_path / "x.bmp"), b"\x00" * 12, 1 << 20, 1)
    with pytest.raises(ValueError):
        native.draw_rectangle(bytearray(12), 1, 1 << 20, 0, 0, 1, 1, 1, 2, 3)
    # hostile header: width 0x7fffffff/3-ish would overflow stride math
    raw = bytearray(54 + 16)
    raw[0:2] = b"BM"
    import struct
    struct.pack_into("<i", raw, 18, 0x7ffffff0)   # biWidth
    struct.pack_into("<i", raw, 22, 4)            # biHeight
    struct.pack_into("<H", raw, 28, 24)           # biBitCount
    p = tmp_path / "hostile.bmp"
    p.write_bytes(bytes(raw))
    with pytest.raises((IOError, ValueError)):
        native.bmp_load(str(p))


def test_bmp_decode_fuzz_never_crashes():
    """Random garbage and truncations must raise ValueError cleanly from
    the pure-python decoder (the serving ingest path) — no hangs, no
    absurd allocations, no non-ValueError crashes."""
    from ffcnn_tpu.imageio.bmp import bmp_decode

    rng = np.random.RandomState(0)
    good = open(REF_BMP, "rb").read()
    cases = [b"", b"BM", rng.bytes(10), rng.bytes(100), rng.bytes(4096),
             good[:40], good[:54], good[:200]]
    for i in range(50):            # bit-flipped headers on a real file
        raw = bytearray(good[:4096])
        for _ in range(4):
            raw[rng.randint(0, 64)] ^= 1 << rng.randint(0, 8)
        cases.append(bytes(raw))
    ok = 0
    for raw in cases:
        try:
            img = bmp_decode(bytes(raw))
            ok += 1                # a surviving mutation must still be sane
            assert img.ndim == 3 and img.shape[2] == 3
            assert img.size < 10 * good.__sizeof__()
        except ValueError:
            pass
    assert ok < len(cases)         # the garbage cases really were rejected
