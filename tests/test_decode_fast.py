"""Fast-path decode pieces: the two-reduction argmax and the folded-conv1
preprocess must agree with the straightforward formulations."""

import numpy as np
import jax
import jax.numpy as jnp

from ffcnn_tpu.ops.yolo import _argmax_max


def test_argmax_max_matches_numpy_incl_ties():
    rng = np.random.RandomState(0)
    x = rng.randn(500, 80).astype(np.float32)
    x[5, 10] = x[5, 3] = x[5].max() + 1.0     # tie -> first index wins
    x[7] = 0.0                                 # all-equal row -> index 0
    for dtype in (jnp.float32, jnp.bfloat16):
        xj = jnp.asarray(x, dtype)
        ci, cs = jax.jit(_argmax_max)(xj)
        xn = np.asarray(xj, np.float32)
        np.testing.assert_array_equal(np.asarray(ci), np.argmax(xn, -1))
        np.testing.assert_allclose(np.asarray(cs), np.max(xn, -1))


def test_folded_conv1_matches_letterbox_path():
    """uint8 + folded conv-1 == float letterbox + plain conv-1 (f32)."""
    from ffcnn_tpu.darknet.ir import (Activation, BlobShape, Layer, LayerType,
                                      NetIR)
    from ffcnn_tpu.graph.build import (fold_input_transform, forward_features,
                                       params_to_pytree)
    from ffcnn_tpu.ops.preprocess import letterbox, letterbox_uint8

    rng = np.random.RandomState(1)
    ir = NetIR(
        layers=(Layer(index=0, type=LayerType.CONV, fn=8, fs=3, stride=2,
                      groups=1, pad=1, batchnorm=True,
                      activation=int(Activation.LEAKY)),),
        blobs=(BlobShape(64, 64, 3), BlobShape(32, 32, 8)),
    )
    params = params_to_pytree({0: type("P", (), {
        "weights": rng.randn(3, 3, 3, 8).astype(np.float32) * 0.3,
        "scale": rng.rand(8).astype(np.float32) + 0.5,
        "bias": rng.randn(8).astype(np.float32) * 0.1,
    })()})
    bgr = rng.randint(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    mean = jnp.zeros(3, jnp.float32)
    norm = jnp.full(3, 1 / 255.0, jnp.float32)

    x_ref = letterbox(jnp.asarray(bgr), 64, 64, mean, norm)
    ref = forward_features(ir, params, x_ref)  # no yolo layer: use last blob
    # forward_features returns heads; with no yolo layer recompute directly:
    from ffcnn_tpu.ops.conv import conv2d_fused
    p = params[0]
    ref = conv2d_fused(x_ref, p["weights"], p["scale"], p["bias"], stride=2,
                       pad=1, groups=1, act=int(Activation.LEAKY))

    folded = fold_input_transform(ir, params, mean, norm)
    x_u8 = letterbox_uint8(jnp.asarray(bgr), 64, 64)
    pf = folded[0]
    got = conv2d_fused(x_u8.astype(jnp.float32), pf["weights"], pf["scale"],
                       pf["bias"], stride=2, pad=1, groups=1,
                       act=int(Activation.LEAKY))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_folded_conv1_nonzero_mean():
    """The bias correction term handles nonzero mean (interior pixels)."""
    from ffcnn_tpu.darknet.ir import (Activation, BlobShape, Layer, LayerType,
                                      NetIR)
    from ffcnn_tpu.graph.build import fold_input_transform, params_to_pytree
    from ffcnn_tpu.ops.conv import conv2d_fused
    from ffcnn_tpu.ops.preprocess import letterbox

    rng = np.random.RandomState(2)
    ir = NetIR(
        layers=(Layer(index=0, type=LayerType.CONV, fn=4, fs=1, stride=1,
                      groups=1, pad=0, batchnorm=True,
                      activation=int(Activation.LINEAR)),),
        blobs=(BlobShape(16, 16, 3), BlobShape(16, 16, 4)),
    )
    params = params_to_pytree({0: type("P", (), {
        "weights": rng.randn(1, 1, 3, 4).astype(np.float32),
        "scale": rng.rand(4).astype(np.float32) + 0.5,
        "bias": rng.randn(4).astype(np.float32),
    })()})
    bgr = rng.randint(0, 256, (1, 16, 16, 3), dtype=np.uint8)
    mean = jnp.asarray([10.0, 20.0, 30.0])
    norm = jnp.asarray([1 / 255.0, 1 / 250.0, 1 / 245.0])

    x_ref = letterbox(jnp.asarray(bgr), 16, 16, mean, norm)
    p = params[0]
    ref = conv2d_fused(x_ref, p["weights"], p["scale"], p["bias"], stride=1,
                       pad=0, groups=1, act=0)
    folded = fold_input_transform(ir, params, mean, norm)
    pf = folded[0]
    got = conv2d_fused(jnp.asarray(bgr, jnp.float32), pf["weights"],
                       pf["scale"], pf["bias"], stride=1, pad=0, groups=1,
                       act=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_decode_impls_bit_identical(monkeypatch):
    """The anchor-slice decode (no (...,3,85) reshape — fuses into one pass
    over the head on TPU) must be bit-identical to the reshape formulation
    for every field, including argmax tie-breaking."""
    from ffcnn_tpu.darknet.ir import Layer, LayerType
    from ffcnn_tpu.ops.yolo import decode_head

    rng = np.random.RandomState(0)
    # Ties included: quantize scores so equal class logits occur.
    feat = jnp.asarray(
        np.round(rng.randn(4, 6, 5, 255) * 2) / 2, jnp.bfloat16)
    lay = Layer(index=0, type=LayerType.YOLO, class_num=80,
                ignore_thres=0.45,
                anchors=((115, 73), (119, 199), (242, 238)), scale_x_y=1.05)
    outs = {}
    for impl in ("anchor-slice", "reshape"):
        monkeypatch.setenv("FFCNN_DECODE_IMPL", impl)
        outs[impl] = decode_head(feat, lay, 320, 320)
    for a, b, nm in zip(outs["anchor-slice"], outs["reshape"],
                        ("boxes", "scores", "classes")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=nm)


def test_planar_decode_bit_identical():
    """Planar head layout: permuting the head channels field-major and
    decoding with planar=True must match the stock decode bit-for-bit."""
    from ffcnn_tpu.darknet.ir import Layer, LayerType
    from ffcnn_tpu.ops.yolo import decode_head, head_planar_permutation

    rng = np.random.RandomState(1)
    feat = jnp.asarray(
        np.round(rng.randn(4, 6, 5, 255) * 2) / 2, jnp.bfloat16)
    lay = Layer(index=0, type=LayerType.YOLO, class_num=80,
                ignore_thres=0.45,
                anchors=((115, 73), (119, 199), (242, 238)), scale_x_y=1.05)
    want = decode_head(feat, lay, 320, 320)
    got = decode_head(feat[..., head_planar_permutation(80)], lay, 320, 320,
                      planar=True)
    for a, b, nm in zip(got, want, ("boxes", "scores", "classes")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=nm)


def test_planarize_heads_safety_flags(ref_cfg):
    """_planarize_heads must refuse heads whose conv output has consumers
    besides the yolo layer, and permute params only for safe heads."""
    from ffcnn_tpu.darknet import parse_cfg
    from ffcnn_tpu.darknet.ir import LayerType
    from ffcnn_tpu.darknet.weights import zero_weights
    from ffcnn_tpu.graph.build import params_to_pytree
    from ffcnn_tpu.net import _planarize_heads

    ir = parse_cfg(ref_cfg)
    params = params_to_pytree(zero_weights(ir))
    out, flags = _planarize_heads(ir, params, None)
    yolo_lis = [li for li, l in enumerate(ir.layers)
                if l.type == LayerType.YOLO]
    assert set(flags) == set(yolo_lis)
    assert all(flags.values())          # flagship heads are all safe
    for yli in yolo_lis:
        assert out[yli - 1]["weights"].shape \
            == params[yli - 1]["weights"].shape
        assert out[yli - 1] is not params[yli - 1]

    # Synthetic unsafe case: a route also consumes the head conv's blob.
    import dataclasses
    ir2 = parse_cfg(ref_cfg)
    bad = list(ir2.layers)
    route = next(l for l in bad if l.type == LayerType.ROUTE)
    bad[bad.index(route)] = dataclasses.replace(
        route, depends=(yolo_lis[0] - 1,))  # references blob yolo_lis[0]
    ir2 = dataclasses.replace(ir2, layers=tuple(bad))
    _, flags2 = _planarize_heads(ir2, params, None)
    assert not flags2[yolo_lis[0]]
    assert flags2[yolo_lis[1]]


def test_planar_pipeline_bit_identical(ref_cfg, ref_weights, monkeypatch):
    """Whole fast pipeline with FFCNN_PLANAR_HEADS on vs off: the channel
    permutation is a relabeling, so detect_device must be bit-identical."""
    import conftest
    from ffcnn_tpu import Net
    from ffcnn_tpu.imageio.bmp import bmp_load

    img = bmp_load(conftest.fixture_path("test320.bmp"))
    batch = img[None]
    outs = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("FFCNN_PLANAR_HEADS", flag)
        net = Net.load(ref_cfg, ref_weights, mode="fast")
        outs[flag] = net.detect_device(batch)
    for a, b, nm in zip(outs["1"], outs["0"],
                        ("boxes", "scores", "classes", "count", "sat")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=nm)


def test_head_chain_layers_flagship(ref_cfg):
    """Chain discovery: the two dw5x5/pw chains feeding the yolo heads
    (116-120 and 125-129); layer 115 is excluded (its blob also feeds
    route 122), as is route 124."""
    from ffcnn_tpu.darknet.cfg import parse_cfg
    from ffcnn_tpu.graph.build import head_chain_layers
    ir = parse_cfg(open(ref_cfg).read())
    assert head_chain_layers(ir) == (frozenset(range(116, 121))
                                     | frozenset(range(125, 130)))


def test_head_f32_mechanism_and_golden(ref_cfg, ref_weights, monkeypatch):
    """FFCNN_HEAD_F32=1: the head feature maps come out f32 (the upcast at
    the chain start propagates, graph/build.py), and the end-to-end
    detections still match the golden fixture at fast tolerance."""
    import conftest
    import jax.numpy as jnp
    from ffcnn_tpu import Net
    from ffcnn_tpu.darknet.cfg import parse_cfg
    from ffcnn_tpu.darknet.weights import load_weights
    from ffcnn_tpu.graph.build import (forward_features, head_chain_layers,
                                       params_to_pytree)
    from ffcnn_tpu.imageio.bmp import bmp_load
    from ffcnn_tpu.ops.preprocess import letterbox

    ir = parse_cfg(open(ref_cfg).read())
    params = params_to_pytree(load_weights(ir, ref_weights)[0])
    img = bmp_load(conftest.fixture_path("test320.bmp"))
    x = letterbox(jnp.asarray(img[None]), ir.blobs[0].w, ir.blobs[0].h,
                  (0.0, 0.0, 0.0), (1 / 255.0,) * 3, dtype=jnp.bfloat16)
    plain = forward_features(ir, params, x, input_dtype=jnp.bfloat16)
    assert all(f.dtype == jnp.bfloat16 for f in plain)
    up = forward_features(ir, params, x, input_dtype=jnp.bfloat16,
                          f32_layers=head_chain_layers(ir))
    assert all(f.dtype == jnp.float32 for f in up)

    monkeypatch.setenv("FFCNN_HEAD_F32", "1")
    net = Net.load(ref_cfg, ref_weights, mode="fast")
    dets = net.detect(img)
    golden = [(0, (90, 66, 135, 292)), (18, (215, 111, 306, 248)),
              (16, (35, 196, 106, 268))]
    assert len(dets) == len(golden)
    for d, (cat, rect) in zip(dets, golden):
        assert d.class_id == cat
        assert all(abs(g - v) <= 2 for g, v in
                   zip(rect, (d.x1, d.y1, d.x2, d.y2)))


def test_argmax_max_packed_bit_identical(monkeypatch):
    """FFCNN_ARGMAX=packed (single uint32-key reduction — reopened after
    the 2026-08-19 toolchain fixed the reduce+bitcast fusion livelock)
    must reproduce the variadic form exactly on bf16 heads: same first-max
    tie-breaking, exact bf16 value recovery, negatives ordered correctly.
    f32 inputs (parity mode) must fall back to the variadic reduce."""
    from ffcnn_tpu.ops.yolo import _argmax_max, _argmax_max_packed

    rng = np.random.RandomState(3)
    x = np.round(rng.randn(1000, 80) * 4) / 4       # heavy ties
    x[0] = -1.0                                      # all-equal negative row
    x[1] = 0.0                                       # all-zero row
    x[2, 40:] = x[2].max() + 1.0                     # tie in the tail
    x[3] = -50.0                                     # make ±0.0 the row max:
    x[3, 10] = -0.0                                  # -0.0 before +0.0 must
    x[3, 20] = +0.0                                  # tie by index (ADVICE r4)
    xb = jnp.asarray(x, jnp.bfloat16)
    ci0, cs0 = jax.jit(_argmax_max)(xb)              # default: variadic
    ci1, cs1 = jax.jit(_argmax_max_packed)(xb)
    np.testing.assert_array_equal(np.asarray(ci0), np.asarray(ci1))
    np.testing.assert_array_equal(np.asarray(cs0), np.asarray(cs1))

    # flag plumbing: packed engages for bf16, never for f32
    monkeypatch.setenv("FFCNN_ARGMAX", "packed")
    ci2, cs2 = jax.jit(_argmax_max)(xb)
    np.testing.assert_array_equal(np.asarray(ci0), np.asarray(ci2))
    np.testing.assert_array_equal(np.asarray(cs0), np.asarray(cs2))
    xf = jnp.asarray(x, jnp.float32)
    ci3, cs3 = jax.jit(_argmax_max)(xf)
    np.testing.assert_array_equal(np.asarray(ci3), np.argmax(x, -1))


def test_decode_packed_argmax_bit_identical(monkeypatch):
    """Whole-head decode with FFCNN_ARGMAX=packed is bit-identical to the
    default for every output field."""
    from ffcnn_tpu.darknet.ir import Layer, LayerType
    from ffcnn_tpu.ops.yolo import decode_head

    rng = np.random.RandomState(1)
    feat = jnp.asarray(
        np.round(rng.randn(4, 6, 5, 255) * 2) / 2, jnp.bfloat16)
    lay = Layer(index=0, type=LayerType.YOLO, class_num=80,
                ignore_thres=0.45,
                anchors=((115, 73), (119, 199), (242, 238)), scale_x_y=1.05)
    outs = {}
    for impl in ("variadic", "packed"):
        monkeypatch.setenv("FFCNN_ARGMAX", impl)
        outs[impl] = decode_head(feat, lay, 320, 320)
    for a, b, nm in zip(outs["variadic"], outs["packed"],
                        ("boxes", "scores", "classes")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=nm)
