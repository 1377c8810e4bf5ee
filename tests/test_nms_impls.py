"""The three NMS implementations (scan / sweep / pallas-interpret) must give
bit-identical keep masks — they all realize the reference's greedy
suppression (ffcnn.c:298-335)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ffcnn_tpu.ops.nms import nms


def _random_case(seed, n=16, m=200, density=0.1, classes=5):
    rng = np.random.RandomState(seed)
    xy = rng.rand(n, m, 2).astype(np.float32) * 300
    wh = rng.rand(n, m, 2).astype(np.float32) * 120
    boxes = np.concatenate([xy, xy + wh], -1)
    scores = np.where(rng.rand(n, m) < density,
                      rng.rand(n, m).astype(np.float32), 0.0).astype(np.float32)
    cls = rng.randint(0, classes, (n, m)).astype(np.int32)
    return jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(cls)


@pytest.mark.parametrize("seed,density", [(0, 0.05), (1, 0.3), (2, 0.9)])
def test_impls_bit_identical(seed, density):
    boxes, scores, cls = _random_case(seed, density=density)
    results = {}
    for impl in ("scan", "sweep", "pallas"):
        r = jax.jit(lambda b, s, c, i=impl: nms(
            b, s, c, k=64, threshold=0.5, impl=i))(boxes, scores, cls)
        results[impl] = jax.tree.map(np.asarray, r)
    for impl in ("sweep", "pallas"):
        np.testing.assert_array_equal(results["scan"].scores,
                                      results[impl].scores, err_msg=impl)
        np.testing.assert_array_equal(results["scan"].count,
                                      results[impl].count, err_msg=impl)
        kept = results["scan"].scores > 0
        np.testing.assert_array_equal(results["scan"].classes[kept],
                                      results[impl].classes[kept],
                                      err_msg=impl)


@pytest.mark.parametrize("seed,density", [(3, 0.1), (4, 0.6)])
def test_topk_impls_bit_identical(seed, density, monkeypatch):
    """The three top-k payload-selection paths (one-hot MXU-dot gather /
    stable multi-operand sort / take_along_axis) must be bit-identical —
    the one-hot dot runs at Precision.HIGHEST precisely so the gathered f32
    boxes reconstruct exactly."""
    boxes, scores, cls = _random_case(seed, density=density)
    results = {}
    for impl in ("onehot", "sort", "gather"):
        monkeypatch.setenv("FFCNN_TOPK_IMPL", impl)
        r = jax.jit(lambda b, s, c: nms(b, s, c, k=64, threshold=0.5,
                                        impl="sweep"))(boxes, scores, cls)
        results[impl] = jax.tree.map(np.asarray, r)
    live = results["onehot"].scores > 0   # score-0 padding slots may hold
    for impl in ("sort", "gather"):       # different (inert) candidates
        for field in ("scores", "count", "saturated"):
            np.testing.assert_array_equal(
                getattr(results["onehot"], field),
                getattr(results[impl], field), err_msg=f"{impl}.{field}")
        np.testing.assert_array_equal(results["onehot"].boxes[live],
                                      getattr(results[impl], "boxes")[live],
                                      err_msg=f"{impl}.boxes")
        np.testing.assert_array_equal(results["onehot"].classes[live],
                                      results[impl].classes[live],
                                      err_msg=f"{impl}.classes")


def test_sweep_matches_python_greedy():
    """Fixpoint sweeps == a literal python port of the C greedy loop."""
    boxes, scores, cls = _random_case(7, n=4, m=100, density=0.5, classes=3)
    r = jax.jit(lambda b, s, c: nms(b, s, c, k=64, threshold=0.5,
                                    impl="sweep"))(boxes, scores, cls)
    b, s, c = map(np.asarray, (boxes, scores, cls))
    for ni in range(b.shape[0]):
        order = np.argsort(-s[ni], kind="stable")[:64]
        keep = []
        for i in order:
            if s[ni, i] <= 0:
                continue
            ok = True
            for j in keep:
                if c[ni, j] != c[ni, i]:
                    continue
                x1 = max(b[ni, j, 0], b[ni, i, 0])
                y1 = max(b[ni, j, 1], b[ni, i, 1])
                x2 = min(b[ni, j, 2], b[ni, i, 2])
                y2 = min(b[ni, j, 3], b[ni, i, 3])
                inter = (x2 - x1) * (y2 - y1) if (x1 < x2 and y1 < y2) else 0.0
                a1 = (b[ni, j, 2] - b[ni, j, 0]) * (b[ni, j, 3] - b[ni, j, 1])
                a2 = (b[ni, i, 2] - b[ni, i, 0]) * (b[ni, i, 3] - b[ni, i, 1])
                if inter / min(a1, a2) > 0.5:
                    ok = False
                    break
            if ok:
                keep.append(i)
        got = np.asarray(r.scores[ni])
        got_scores = sorted(got[got > 0], reverse=True)
        want_scores = sorted((s[ni, j] for j in keep), reverse=True)
        np.testing.assert_allclose(got_scores, want_scores, rtol=1e-6)
        assert int(np.asarray(r.count[ni])) == len(keep)
