"""Params cache, profiling report plumbing, and the CLI batch/dump paths."""

import os

import numpy as np
import pytest

from ffcnn_tpu.darknet import parse_cfg
from ffcnn_tpu.darknet.cache import cache_key, load_or_build
from ffcnn_tpu.darknet.weights import load_weights, synth_weights_bytes

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MICRO = os.path.join(REPO, "models", "ffcnn-micro.cfg")


@pytest.fixture()
def micro_files(tmp_path):
    ir = parse_cfg(MICRO)
    wpath = str(tmp_path / "micro.weights")
    with open(wpath, "wb") as f:
        f.write(synth_weights_bytes(ir, seed=7, obj_bias=2.0))
    return MICRO, wpath


def test_cache_roundtrip(micro_files, tmp_path):
    cfg, wpath = micro_files
    ir = parse_cfg(cfg)
    cache_dir = str(tmp_path / "cache")
    p1, cached1 = load_or_build(ir, cfg, wpath, cache_dir)
    assert not cached1
    p2, cached2 = load_or_build(ir, cfg, wpath, cache_dir)
    assert cached2
    direct, _ = load_weights(ir, wpath)
    assert set(p2) == set(direct)
    for li in direct:
        np.testing.assert_array_equal(p2[li].weights, direct[li].weights)
        np.testing.assert_array_equal(p2[li].scale, direct[li].scale)
        np.testing.assert_array_equal(p2[li].bias, direct[li].bias)


def test_cache_key_changes_with_content(micro_files, tmp_path):
    cfg, wpath = micro_files
    k1 = cache_key(cfg, wpath)
    w2 = str(tmp_path / "other.weights")
    ir = parse_cfg(cfg)
    with open(w2, "wb") as f:
        f.write(synth_weights_bytes(ir, seed=8))
    assert cache_key(cfg, w2) != k1
    # input size is NOT part of the key: folded params are size-independent
    assert cache_key(cfg, wpath) == k1


def test_net_load_with_cache(micro_files, tmp_path):
    from ffcnn_tpu import Net
    cfg, wpath = micro_files
    cache_dir = str(tmp_path / "cache")
    net = Net.load(cfg, wpath, mode="parity", cache_dir=cache_dir)
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (64, 64, 3), dtype=np.uint8)
    d1 = net.detect(img)
    net2 = Net.load(cfg, wpath, mode="parity", cache_dir=cache_dir)
    d2 = net2.detect(img)
    assert [repr(d) for d in d1] == [repr(d) for d in d2]
    assert any(f.startswith("ffcnn-params-") for f in os.listdir(cache_dir))


def test_cli_bench_and_profile_smoke(micro_files, capsys):
    """The bench and profile subcommands run end-to-end on CPU (tiny
    micro-model settings); output shape only — numbers are meaningless
    off-TPU."""
    from ffcnn_tpu.cli import main
    cfg, wpath = micro_files
    size = 64
    assert main(["bench", "--batch", "2", "--size", str(size), "--iters",
                 "1", "--cfg", cfg, "--weights", wpath]) == 0
    out = capsys.readouterr().out
    assert "img/s" in out
    assert main(["profile", "--batch", "2", "--size", str(size), "--iters",
                 "1", "--cfg", cfg, "--weights", wpath]) == 0
    out = capsys.readouterr().out
    assert "conv" in out and "memory" in out
    # pure-DP bench: shard_map over the 8-device CPU mesh around the
    # single-chip pipeline (build_dp_pipeline)
    assert main(["bench", "--dp", "--batch", "8", "--size", str(size),
                 "--iters", "1", "--mode", "fast",
                 "--cfg", cfg, "--weights", wpath]) == 0
    out = capsys.readouterr().out
    assert "dp mesh" in out and "img/s" in out


def test_memory_stats(micro_files):
    """memory_stats reports the compiled bucket's HBM footprint — the
    net_forward peak-memory observability analog (readme.txt:127)."""
    from ffcnn_tpu import Net
    cfg, wpath = micro_files
    net = Net.load(cfg, wpath, mode="fast")
    m = net.memory_stats(batch_size=2)
    assert set(m) == {"args", "temp", "output", "code", "peak"}
    h, w = net.ir.blobs[0].h, net.ir.blobs[0].w
    assert m["args"] >= 2 * h * w * 3            # the uint8 input batch
    assert m["peak"] > 0 and m["temp"] >= 0


def test_cli_dump_and_batch(micro_files, tmp_path, capsys):
    from ffcnn_tpu import cli
    from ffcnn_tpu.imageio.bmp import bmp_save
    cfg, wpath = micro_files

    assert cli.main(["dump", "--cfg", cfg]) == 0
    out = capsys.readouterr().out
    assert "yolo" in out and "conv" in out

    rng = np.random.RandomState(1)
    paths = []
    for i in range(3):
        p = str(tmp_path / f"img{i}.bmp")
        bmp_save(p, rng.randint(0, 256, (64, 64, 3), dtype=np.uint8))
        paths.append(p)
    rc = cli.main(["batch", *paths, "--cfg", cfg, "--weights", wpath,
                   "--mode", "parity",
                   "--cache-dir", str(tmp_path / "cache")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "3 images" in out
    assert out.count("img") >= 3
    dets_single = [l for l in out.splitlines() if "score:" in l]

    # Multi-chunk streaming (--batch 2 -> chunks of 2 + padded tail): same
    # per-image detections as the one-dispatch run above.
    rc = cli.main(["batch", *paths, "--cfg", cfg, "--weights", wpath,
                   "--mode", "parity", "--batch", "2",
                   "--cache-dir", str(tmp_path / "cache")])
    assert rc == 0
    out2 = capsys.readouterr().out
    assert "3 images" in out2
    assert [l for l in out2.splitlines() if "score:" in l] == dets_single


def test_cli_profile_renders_roofline(micro_files, capsys):
    """ffcnn profile prints the per-layer table plus the merged
    measured-vs-floor stage roofline."""
    from ffcnn_tpu import cli
    cfg, wpath = micro_files
    rc = cli.main(["profile", "--cfg", cfg, "--weights", wpath,
                   "--batch", "2", "--size", "64", "--iters", "2",
                   "--mode", "parity"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "roofline (batch 2" in out and "TOTAL" in out
    assert "x floor" in out and "memory (batch 2)" in out


def test_profile_report_renders(micro_files):
    """profile_layers runs and renders on any backend (attribution quality
    depends on the backend's trace; smoke only on CPU)."""
    from ffcnn_tpu import Net
    cfg, wpath = micro_files
    net = Net.load(cfg, wpath, mode="parity")
    rep = net.profile_layers(iters=2)
    text = rep.render()
    assert "total" in text and "profile" in text
    assert len(rep.layers) == len(net.ir.layers)


def test_enable_compile_cache(tmp_path, monkeypatch):
    import jax
    import ffcnn_tpu
    target = str(tmp_path / "xlacache")
    got = ffcnn_tpu.enable_compile_cache(target)
    assert got == target and os.path.isdir(target)
    assert jax.config.jax_compilation_cache_dir == target
    # env override path
    monkeypatch.setenv("FFCNN_COMPILE_CACHE", str(tmp_path / "envcache"))
    got2 = ffcnn_tpu.enable_compile_cache()
    assert got2.endswith("envcache") and os.path.isdir(got2)
