"""AOT export artifacts (export.py): the serialized pipeline must be
self-contained (weights baked), bit-identical to the live pipeline, and
loadable without the cfg/weights pair."""

import os

import numpy as np
import pytest

import conftest
from ffcnn_tpu.darknet import parse_cfg
from ffcnn_tpu.darknet.weights import synth_weights_bytes

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MICRO = os.path.join(REPO, "models", "ffcnn-micro.cfg")


@pytest.fixture()
def micro_net(tmp_path):
    from ffcnn_tpu import Net
    ir = parse_cfg(MICRO)
    wpath = str(tmp_path / "micro.weights")
    with open(wpath, "wb") as f:
        f.write(synth_weights_bytes(ir, seed=7, obj_bias=2.0))
    return Net.load(MICRO, wpath, mode="fast")


def test_export_roundtrip_bit_identical(micro_net, tmp_path):
    from ffcnn_tpu.export import load_exported

    net = micro_net
    net_h, net_w = net.ir.blobs[0].h, net.ir.blobs[0].w
    rng = np.random.RandomState(0)
    batch = rng.randint(0, 256, (2, net_h, net_w, 3), dtype=np.uint8)

    path = str(tmp_path / "micro.ffx")
    nbytes = net.export(path, batch_size=2)
    assert nbytes == os.path.getsize(path) > 1000

    art = load_exported(path)
    assert art.in_shape == (2, net_h, net_w, 3)
    got = art.call(batch)
    want = net.detect_device(batch)
    for a, b, nm in zip(got, want,
                        ("boxes", "scores", "classes", "count", "sat")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=nm)


def test_export_artifact_is_self_contained(micro_net, tmp_path):
    """Deserialization must not need the Net, cfg, or weights objects —
    only the artifact file."""
    from ffcnn_tpu.export import load_exported

    net = micro_net
    net_h, net_w = net.ir.blobs[0].h, net.ir.blobs[0].w
    path = str(tmp_path / "micro.ffx")
    net.export(path)
    want = net.detect_device(np.zeros((1, net_h, net_w, 3), np.uint8))
    del net

    art = load_exported(path)
    got = art.call(np.zeros((1, net_h, net_w, 3), np.uint8))
    np.testing.assert_array_equal(np.asarray(got[3]), np.asarray(want[3]))


def test_export_rejects_wrong_shape(micro_net, tmp_path):
    from ffcnn_tpu.export import load_exported

    net = micro_net
    path = str(tmp_path / "micro.ffx")
    net.export(path, batch_size=2)
    art = load_exported(path)
    net_h, net_w = net.ir.blobs[0].h, net.ir.blobs[0].w
    with pytest.raises(ValueError, match="artifact expects"):
        art.call(np.zeros((3, net_h, net_w, 3), np.uint8))
    with pytest.raises(ValueError, match="artifact expects"):
        art.call(np.zeros((2, net_h, net_w, 3), np.float32))
