"""Per-op numerical tests: JAX ops vs the NumPy oracle (SURVEY.md §4b),
covering the reference's quirky semantics on randomized inputs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import conftest
from ffcnn_tpu.darknet.ir import Activation, Layer, LayerType
from ffcnn_tpu.darknet.weights import FoldedConvParams
from ffcnn_tpu.ops.conv import conv2d_fused
from ffcnn_tpu.ops.nms import nms
from ffcnn_tpu.ops.pool import avgpool2d, maxpool2d, upsample_nearest
from ffcnn_tpu.ops.preprocess import letterbox
from ffcnn_tpu.ops.yolo import decode_head
from ffcnn_tpu.oracle import numpy_ref as oracle

RNG = np.random.RandomState(42)


@pytest.mark.parametrize("case", [
    # (H, W, C, fn, fs, stride, pad_flag, groups, act)
    (14, 10, 8, 16, 3, 1, 1, 1, Activation.LEAKY),
    (14, 10, 8, 16, 3, 2, 1, 1, Activation.LEAKY),
    (14, 10, 8, 16, 1, 1, 0, 1, Activation.LINEAR),
    (14, 10, 8, 8, 3, 1, 1, 8, Activation.LEAKY),     # depthwise 3x3
    (14, 10, 8, 8, 3, 2, 1, 8, Activation.LEAKY),     # depthwise s2
    (14, 10, 8, 8, 5, 1, 1, 8, Activation.LEAKY),     # depthwise 5x5 (pad 2)
    (9, 9, 6, 4, 3, 1, 1, 2, Activation.RELU),        # grouped, g=2
    (8, 8, 4, 4, 2, 2, 0, 1, Activation.LINEAR),      # even filter size
])
def test_conv_vs_oracle(case):
    h, w, c, fn, fs, stride, pad_flag, groups, act = case
    pad = fs // 2 if pad_flag else 0
    x = RNG.randn(h, w, c).astype(np.float32)
    p = FoldedConvParams(
        weights=RNG.randn(fs, fs, c // groups, fn).astype(np.float32),
        scale=RNG.rand(fn).astype(np.float32) + 0.5,
        bias=RNG.randn(fn).astype(np.float32))
    want = oracle.conv_forward(x, p, stride, pad, groups, act)
    got = conv2d_fused(jnp.asarray(x)[None], jnp.asarray(p.weights),
                       jnp.asarray(p.scale), jnp.asarray(p.bias),
                       stride=stride, pad=pad, groups=groups, act=int(act),
                       precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(got[0]), want, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("stride,pad", [(2, 1), (1, 1), (1, 0)])
def test_conv0_int8_exact_when_representable(stride, pad):
    """conv0_int8_from_u8's shift + border-correction algebra is EXACT:
    with weights chosen so per-channel quantization is lossless, the int8
    path must equal the f32 conv bit-for-bit everywhere, borders included
    (zero padding represents raw pixel 0, not shifted 0)."""
    from ffcnn_tpu.ops.conv import conv0_int8_from_u8
    fn = 8
    x = RNG.randint(0, 256, (2, 13, 11, 3)).astype(np.uint8)
    # integer weights with wmax pinned to 127 make wscale exactly 1.0, so
    # quantization is lossless AND every f32 product/sum is an exact
    # integer < 2^24 — both paths must round identically
    w = RNG.randint(-127, 128, (3, 3, 3, fn)).astype(np.float32)
    w[0, 0, 0, :] = 127                                  # pin wmax per oc
    scale = (RNG.rand(fn) + 0.5).astype(np.float32)
    bias = RNG.randn(fn).astype(np.float32)
    got = conv0_int8_from_u8(jnp.asarray(x), jnp.asarray(w),
                             jnp.asarray(scale), jnp.asarray(bias),
                             stride=stride, pad=pad,
                             act=int(Activation.LEAKY),
                             float_dtype=jnp.float32)
    want = conv2d_fused(jnp.asarray(x, jnp.float32), jnp.asarray(w),
                        jnp.asarray(scale), jnp.asarray(bias),
                        stride=stride, pad=pad, groups=1,
                        act=int(Activation.LEAKY),
                        precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_conv0_int8_quant_error_bounded():
    """Arbitrary float weights: the only error source is 7-bit weight
    quantization — relative RMS error stays in bf16 territory."""
    from ffcnn_tpu.ops.conv import conv0_int8_from_u8
    fn = 8
    x = RNG.randint(0, 256, (2, 16, 16, 3)).astype(np.uint8)
    w = (RNG.randn(3, 3, 3, fn) / 255.0).astype(np.float32)
    scale = np.ones(fn, np.float32)
    bias = np.zeros(fn, np.float32)
    got = np.asarray(conv0_int8_from_u8(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(scale),
        jnp.asarray(bias), stride=2, pad=1, act=int(Activation.LINEAR),
        float_dtype=jnp.float32))
    want = np.asarray(conv2d_fused(
        jnp.asarray(x, jnp.float32), jnp.asarray(w), jnp.asarray(scale),
        jnp.asarray(bias), stride=2, pad=1, groups=1,
        act=int(Activation.LINEAR), precision=jax.lax.Precision.HIGHEST))
    rel = np.sqrt(np.mean((got - want) ** 2)) / (np.sqrt(np.mean(want ** 2))
                                                 + 1e-9)
    assert rel < 1e-2, rel          # bf16 epsilon is 7.8e-3 — same class


@pytest.mark.parametrize("fs,stride", [(3, 1), (5, 1), (9, 1), (2, 2),
                                       (3, 2), (2, 1)])
@pytest.mark.parametrize("is_max", [True, False])
def test_pool_vs_oracle(fs, stride, is_max):
    """Centered clamped windows; avg divides by fs*fs even clipped; floor
    output dims (incl. dims not divisible by stride)."""
    for (h, w) in [(14, 10), (7, 9), (5, 5)]:
        x = RNG.randn(h, w, 6).astype(np.float32)
        want = oracle.pool_forward(x, fs, stride, is_max)
        f = maxpool2d if is_max else avgpool2d
        got = f(jnp.asarray(x)[None], fs, stride)
        np.testing.assert_allclose(np.asarray(got[0]), want, atol=1e-6)


def test_upsample_vs_oracle():
    x = RNG.randn(7, 5, 3).astype(np.float32)
    want = oracle.upsample_forward(x, 2)
    got = upsample_nearest(jnp.asarray(x)[None], 2)
    np.testing.assert_array_equal(np.asarray(got[0]), want)


@pytest.mark.parametrize("img_hw,net_hw", [
    ((424, 640), (448, 640)),   # test.bmp geometry
    ((100, 50), (64, 64)),      # tall image
    ((50, 100), (64, 64)),      # wide image
    ((64, 64), (64, 64)),       # exact
])
def test_letterbox_vs_oracle(img_hw, net_hw):
    h, w = img_hw
    nh, nw = net_hw
    bgr = RNG.randint(0, 255, (h, w, 3)).astype(np.uint8)
    mean, norm = (1.0, 2.0, 3.0), (0.5, 0.25, 0.125)
    want, s1, s2 = oracle.letterbox(bgr, nw, nh, mean, norm)
    got = letterbox(jnp.asarray(bgr)[None], nw, nh, mean, norm)
    np.testing.assert_allclose(np.asarray(got[0]), want, atol=1e-6)


def _mk_yolo_layer():
    return Layer(index=0, type=LayerType.YOLO, class_num=80,
                 anchors=((12, 18), (37, 49), (52, 132)),
                 ignore_thres=0.45, scale_x_y=1.0)


def test_yolo_decode_vs_oracle():
    layer = _mk_yolo_layer()
    feat = (RNG.randn(6, 4, 3 * 85) * 2).astype(np.float32)
    want = oracle.yolo_decode(feat, layer, 320, 320)
    got = decode_head(jnp.asarray(feat)[None], layer, 320, 320)
    scores = np.asarray(got.scores[0])
    boxes = np.asarray(got.boxes[0])
    classes = np.asarray(got.classes[0])
    kept = np.flatnonzero(scores > 0)
    assert len(kept) == len(want)
    for idx, (cls, score, x1, y1, x2, y2) in zip(kept, want):
        assert classes[idx] == cls
        np.testing.assert_allclose(scores[idx], score, atol=1e-5)
        np.testing.assert_allclose(boxes[idx], [x1, y1, x2, y2],
                                   atol=1e-3, rtol=1e-5)


def test_nms_vs_oracle():
    """Greedy min-area-IoU NMS on random overlapping boxes, incl. rescale."""
    layer = _mk_yolo_layer()
    n = 60
    centers = RNG.rand(n, 2) * 100
    sizes = RNG.rand(n, 2) * 40 + 5
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2],
                           axis=1).astype(np.float32)
    scores = RNG.rand(n).astype(np.float32)
    scores[RNG.rand(n) < 0.3] = 0.0        # below-threshold entries
    classes = RNG.randint(0, 3, n)

    want = oracle.nms(
        [(int(classes[i]), scores[i], *boxes[i]) for i in range(n)
         if scores[i] > 0], 0.5, True, 7, 3)

    res = nms(jnp.asarray(boxes)[None], jnp.asarray(scores)[None],
              jnp.asarray(classes)[None], k=64, threshold=0.5,
              scale1=7, scale2=3)
    kscores = np.asarray(res.scores[0])
    kboxes = np.asarray(res.boxes[0])
    kclasses = np.asarray(res.classes[0])
    got = [(int(kclasses[i]), kscores[i], *kboxes[i])
           for i in range(len(kscores)) if kscores[i] > 0]
    assert int(res.count[0]) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0]
        np.testing.assert_allclose(g[1], w[1], atol=1e-6)
        np.testing.assert_allclose(g[2:], w[2:], atol=1e-3)
