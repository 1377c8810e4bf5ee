"""Dense-scene NMS capacity semantics.

The reference NMS-es every above-threshold candidate (bbox arena =
input-bytes/24 ≈ 35k at 640x448, ffcnn.c:243,461-469); the TPU pipeline's
fixed top-k can truncate the candidate set BEFORE suppression.  These tests
pin the honesty contract: truncation is always flagged (NMSResult.saturated),
parity mode auto-grows K until the census fits (bit-matching the unbounded
reference), and fast mode warns instead of silently dropping boxes.
"""
import os

import numpy as np
import pytest
import warnings

import jax
import jax.numpy as jnp

from ffcnn_tpu import Net
from ffcnn_tpu.darknet import parse_cfg
from ffcnn_tpu.darknet.weights import load_weights, synth_weights_bytes
from ffcnn_tpu.ops.nms import nms

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MICRO = os.path.join(REPO, "models", "ffcnn-micro.cfg")


def _crowd(n_boxes=200, seed=0):
    """n_boxes disjoint same-class boxes, all above threshold — unbounded NMS
    keeps every one, so any missing box is top-k truncation."""
    rng = np.random.RandomState(seed)
    xs = np.arange(n_boxes, dtype=np.float32) * 20.0
    boxes = np.stack([xs, np.zeros_like(xs), xs + 10, xs * 0 + 10], axis=-1)
    scores = rng.uniform(0.5, 1.0, n_boxes).astype(np.float32)
    classes = np.zeros(n_boxes, np.int32)
    return boxes[None], scores[None], classes[None]


def test_saturated_flag():
    boxes, scores, classes = _crowd(200)
    r64 = jax.jit(lambda b, s, c: nms(b, s, c, k=64))(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes))
    assert bool(r64.saturated[0])
    assert int(r64.count[0]) == 64            # visible truncation
    r256 = jax.jit(lambda b, s, c: nms(b, s, c, k=256))(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes))
    assert not bool(r256.saturated[0])
    assert int(r256.count[0]) == 200          # unbounded result


def test_saturated_flag_per_image():
    """The flag is per-frame: a crowded and a sparse frame in one batch."""
    boxes, scores, classes = _crowd(200)
    sparse_scores = scores.copy()
    sparse_scores[0, 10:] = 0.0
    b = np.concatenate([boxes, boxes])
    s = np.concatenate([scores, sparse_scores])
    c = np.concatenate([classes, classes])
    r = jax.jit(lambda b, s, c: nms(b, s, c, k=64))(
        jnp.asarray(b), jnp.asarray(s), jnp.asarray(c))
    assert bool(r.saturated[0]) and not bool(r.saturated[1])


@pytest.fixture(scope="module")
def micro():
    """Micro net with dense synthetic candidates (obj_bias drives most cells
    above threshold — a crowded 'scene' by construction)."""
    ir = parse_cfg(MICRO, 64, 64)
    params, _ = load_weights(ir, synth_weights_bytes(ir, seed=42, obj_bias=2.0))
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (64, 64, 3), dtype=np.uint8)
    return ir, params, img


def test_parity_auto_topk_matches_unbounded(micro):
    ir, params, img = micro
    full = Net(ir, params, mode="parity", topk=4096)
    want = full.detect(img)
    assert len(want) > 8, "fixture must be crowded enough to saturate"

    small = Net(ir, params, mode="parity", topk=8)
    got = small.detect(img)                   # must auto-grow K and retry
    assert len(got) == len(want)
    for d, w in zip(got, want):
        assert d.class_id == w.class_id
        np.testing.assert_allclose(
            [d.score, d.x1, d.y1, d.x2, d.y2],
            [w.score, w.x1, w.y1, w.x2, w.y2], rtol=1e-6, atol=1e-6)


def test_fast_mode_warns_on_saturation(micro):
    ir, params, img = micro
    net = Net(ir, params, mode="fast", topk=8)
    with pytest.warns(RuntimeWarning, match="saturated"):
        dets = net.detect(img)
    assert len(dets) == 8                     # truncated but flagged


def test_no_warning_when_capacity_fits(micro):
    ir, params, img = micro
    net = Net(ir, params, mode="fast", topk=3840)   # full candidate count
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        net.detect(img)


def test_warmup_topk_ladder_precompiles_retry_buckets(micro):
    """warmup(topk_ladder=True) compiles every K bucket the parity-mode
    saturation retry can reach, so a crowded burst hits warm programs
    (docs/DEPLOY.md production caveat)."""
    ir, params, img = micro
    net = Net(ir, params, mode="parity", topk=8)
    net.warmup(topk_ladder=True)
    compiled_ks = {key[3] for key in net._pipelines}
    want = {8}
    k, mx = 8, net._max_candidates()
    while k < mx:
        k = min(mx, k * 4)
        want.add(k)
    assert want <= compiled_ks, (want, compiled_ks)
    # the crowded detect now only hits warm buckets
    before = set(net._pipelines)
    dets = net.detect(img)
    assert len(dets) > 8
    assert set(net._pipelines) == before


def test_dpnet_parity_auto_topk_matches_unbounded(micro):
    """DPNet (serve --dp drop-in) honors the same parity-mode retry
    contract as Net.detect: a saturated crowded scene grows K and
    re-dispatches over the mesh instead of returning a truncated set."""
    from ffcnn_tpu.parallel import DPNet, make_mesh

    ir, params, img = micro
    want = Net(ir, params, mode="parity", topk=4096).detect(img)
    assert len(want) > 8
    mesh = make_mesh(jax.devices()[:2])
    dp = DPNet(Net(ir, params, mode="parity", topk=8), mesh)
    got = dp.detect(np.broadcast_to(img, (2,) + img.shape).copy())
    for dets in got:
        assert len(dets) == len(want)
        for d, w in zip(dets, want):
            assert d.class_id == w.class_id
            np.testing.assert_allclose(
                [d.score, d.x1, d.y1, d.x2, d.y2],
                [w.score, w.x1, w.y1, w.x2, w.y2], rtol=1e-6, atol=1e-6)


def test_dpnet_fast_mode_warns_on_saturation(micro):
    from ffcnn_tpu.parallel import DPNet, make_mesh

    ir, params, img = micro
    dp = DPNet(Net(ir, params, mode="fast", topk=8),
               make_mesh(jax.devices()[:2]))
    with pytest.warns(RuntimeWarning, match="saturated"):
        dets = dp.detect(np.broadcast_to(img, (2,) + img.shape).copy())
    assert all(len(d) == 8 for d in dets)
