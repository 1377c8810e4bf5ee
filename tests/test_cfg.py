"""cfg parser + shape inference vs the reference's golden net_dump table."""
import conftest
from ffcnn_tpu.darknet import parse_cfg, dump, LayerType


def test_golden_dump_640x448(ref_cfg):
    """Layer table must be byte-identical to the reference net_dump output
    (captured from the C binary at input 640x448; SURVEY.md §6 appendix)."""
    ir = parse_cfg(ref_cfg, 640, 448)
    with open(conftest.fixture_path("golden_dump_640x448.txt")) as f:
        golden = f.read()
    assert dump(ir) == golden


def test_layer_census(ref_cfg):
    """131 layers: 84 conv, 18 dropout, 18 shortcut, 3 maxpool, 5 route,
    1 upsample, 2 yolo (counted from the reference binary's own net_dump)."""
    ir = parse_cfg(ref_cfg, 640, 448)
    counts = {}
    for l in ir.layers:
        counts[l.type] = counts.get(l.type, 0) + 1
    assert len(ir.layers) == 131
    assert counts[LayerType.CONV] == 84
    assert counts[LayerType.DROPOUT] == 18
    assert counts[LayerType.SHORTCUT] == 18
    assert counts[LayerType.MAXPOOL] == 3
    assert counts[LayerType.ROUTE] == 5
    assert counts[LayerType.UPSAMPLE] == 1
    assert counts[LayerType.YOLO] == 2


def test_pad_quirks(ref_cfg):
    """pad is a flag: size=1 pad=1 -> 0px, size=5 pad=1 -> 2px (ffcnn.c:145)."""
    ir = parse_cfg(ref_cfg, 640, 448)
    l116 = ir.layers[116]
    assert (l116.fs, l116.pad) == (5, 2)
    l117 = ir.layers[117]
    assert (l117.fs, l117.pad) == (1, 0)


def test_stock_input_dims(ref_cfg):
    """Without an input-size override, [net] width/height rule (320x320)."""
    ir = parse_cfg(ref_cfg)
    assert (ir.blobs[0].w, ir.blobs[0].h, ir.blobs[0].c) == (320, 320, 3)
    # yolo head grids at stock size (readme.txt:52): 10x10 and 20x20
    assert (ir.blobs[120 + 1].w, ir.blobs[120 + 1].h) == (10, 10)
    assert (ir.blobs[129 + 1].w, ir.blobs[129 + 1].h) == (20, 20)


def test_align32_override(ref_cfg):
    """Caller-passed image dims become ALIGN(dim,32) (ffcnn.c:133-134)."""
    ir = parse_cfg(ref_cfg, 630, 470)
    assert (ir.blobs[0].w, ir.blobs[0].h) == (640, 480)


def test_route_index_rules():
    """route: >0 absolute, <=0 relative; shortcut: always relative."""
    cfg = """
[net]
width=64
height=64
channels=3

[convolutional]
filters=4
size=3
stride=1
pad=1
activation=leaky

[convolutional]
filters=4
size=3
stride=1
pad=1
activation=leaky

[shortcut]
from=-2
activation=linear

[route]
layers=1,-2
"""
    ir = parse_cfg(cfg, is_path=False)
    assert ir.layers[2].depends == (0,)      # from=-2 at layer 2 -> 0
    assert ir.layers[3].depends == (1, 1)    # 1 absolute, -2 relative -> 1
    assert ir.blobs[4].c == 8                # concat of two c=4 blobs


def test_weight_size(ref_cfg):
    """Exact float census of the .weights file: 1,384,268 bytes = 20-byte
    header + 346,062 float32 (SURVEY.md §6)."""
    ir = parse_cfg(ref_cfg, 640, 448)
    assert ir.darknet_file_floats() == 346062
