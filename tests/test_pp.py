"""Pipeline parallelism (parallel/pp.py) on the simulated 8-device CPU mesh.

Numerics are pinned to the single-device pixels-to-boxes pipeline: the
stage-split, microbatch-streamed program must produce the same detections
the one-program trace produces (same letterbox / forward / decode / NMS at
float32).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import conftest  # noqa: F401  (platform + 8-device setup)
from ffcnn_tpu.darknet import load_weights, parse_cfg
from ffcnn_tpu.darknet.ir import LayerType
from ffcnn_tpu.graph.build import forward_features, params_to_pytree
from ffcnn_tpu.ops.nms import nms
from ffcnn_tpu.ops.preprocess import letterbox, letterbox_params
from ffcnn_tpu.ops.yolo import (apply_arena_cap, arena_capacity,
                                concat_heads, decode_head)
from ffcnn_tpu.parallel import build_pp_pipeline, make_mesh, plan_stages

TOPK = 64


@pytest.fixture(scope="module")
def flagship_small(ref_cfg, ref_weights):
    """Full 131-layer flagship graph at a tiny 64x64 input, real weights."""
    ir = parse_cfg(ref_cfg, 64, 64)
    raw, _ = load_weights(ir, ref_weights)
    return ir, params_to_pytree(raw)


def single_device_reference(ir, params, images):
    """The plain one-program pipeline at float32 (same ops as pp stages)."""
    net_w, net_h = ir.blobs[0].w, ir.blobs[0].h
    _, _, s1, s2 = letterbox_params(images.shape[2], images.shape[1],
                                    net_w, net_h)
    heads_meta = [l for l in ir.layers if l.type == LayerType.YOLO]

    @jax.jit
    def run(bgr):
        x = letterbox(bgr, net_w, net_h, dtype=jnp.float32)
        feats = forward_features(ir, params, x)
        d = concat_heads([decode_head(f, l, net_w, net_h)
                          for f, l in zip(feats, heads_meta)])
        d = apply_arena_cap(d, arena_capacity(net_w, net_h, ir.blobs[0].c))
        return nms(d.boxes, d.scores, d.classes, k=TOPK, threshold=0.5,
                   scale1=s1, scale2=s2)

    return run(jnp.asarray(images))


def assert_results_match(got, want):
    np.testing.assert_array_equal(np.asarray(got.count),
                                  np.asarray(want.count))
    np.testing.assert_array_equal(np.asarray(got.classes),
                                  np.asarray(want.classes))
    np.testing.assert_allclose(np.asarray(got.scores),
                               np.asarray(want.scores), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.boxes),
                               np.asarray(want.boxes), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(got.saturated),
                                  np.asarray(want.saturated))


def _images(n, h=96, w=80, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(n, h, w, 3), dtype=np.uint8)


class TestPlanStages:
    def test_partition_invariants(self, ref_cfg):
        ir = parse_cfg(ref_cfg)
        stages = plan_stages(ir, 4)
        assert stages[0].start == 0 and stages[-1].stop == len(ir.layers)
        for a, b in zip(stages, stages[1:]):
            assert a.stop == b.start            # contiguous cover
            assert a.live_out == b.live_in      # matching wire protocol
        first_yolo = min(i for i, l in enumerate(ir.layers)
                         if l.type == LayerType.YOLO)
        assert stages[-1].start <= first_yolo   # all heads in last stage

    def test_live_sets_cover_all_cross_stage_reads(self, ref_cfg):
        ir = parse_cfg(ref_cfg)
        for n_stages in (2, 3, 4, 6):
            stages = plan_stages(ir, n_stages)
            for st in stages[1:]:
                avail = set(st.live_in)
                for li in range(st.start, st.stop):
                    l = ir.layers[li]
                    reads = (set(d + 1 for d in l.depends)
                             if l.type == LayerType.ROUTE
                             else {li} | (
                                 {l.depends[0] + 1}
                                 if l.type == LayerType.SHORTCUT else set()))
                    for bi in reads:
                        assert bi in avail or bi > st.start, \
                            f"stage {st}: layer {li} reads blob {bi}"
                    avail.add(li + 1)

    def test_route_crossing_blob_on_wire(self, ref_cfg):
        # route layer 124 reads blob 81 (layer 80's output) across the
        # 40x28 stage; any cut between them must carry blob 81.
        ir = parse_cfg(ref_cfg)
        stages = plan_stages(ir, 4)
        for st in stages[1:]:
            if st.start > 81 and st.stop > 124 and st.start <= 124:
                assert 81 in st.live_in

    def test_rejects_bad_counts(self, ref_cfg):
        ir = parse_cfg(ref_cfg)
        with pytest.raises(ValueError):
            plan_stages(ir, 0)
        with pytest.raises(ValueError):
            plan_stages(ir, 1000)


class TestPPEquivalence:
    def test_pipe_only_mesh(self, flagship_small):
        ir, params = flagship_small
        mesh = make_mesh(jax.devices()[:4], pipeline_parallel=4)
        fn = build_pp_pipeline(ir, params, mesh, 96, 80,
                               n_microbatches=4, topk=TOPK)
        images = _images(8)
        got = fn(jnp.asarray(images))
        want = single_device_reference(ir, params, images)
        assert_results_match(got, want)

    def test_dp_x_pp_mesh(self, flagship_small):
        ir, params = flagship_small
        mesh = make_mesh(jax.devices()[:8], pipeline_parallel=4)
        assert mesh.shape["data"] == 2
        fn = build_pp_pipeline(ir, params, mesh, 96, 80,
                               n_microbatches=2, topk=TOPK)
        images = _images(8, seed=1)
        got = fn(jnp.asarray(images))
        want = single_device_reference(ir, params, images)
        assert_results_match(got, want)

    def test_more_microbatches_than_stages(self, flagship_small):
        ir, params = flagship_small
        mesh = make_mesh(jax.devices()[:2], pipeline_parallel=2)
        fn = build_pp_pipeline(ir, params, mesh, 96, 80,
                               n_microbatches=6, topk=TOPK)
        images = _images(6, seed=2)
        got = fn(jnp.asarray(images))
        want = single_device_reference(ir, params, images)
        assert_results_match(got, want)


class TestPPRandomGraphs:
    @pytest.mark.parametrize("seed", [11, 23, 47, 91])
    def test_random_graph_equivalence(self, seed):
        """Random full-dialect graphs (mish, route groups, dropout aliases)
        through a 2-stage pipeline match the single-device pipeline — the
        live-set wire protocol must survive arbitrary route/shortcut
        topology, not just the flagship's."""
        from test_random_graphs import SIZE, _gen_cfg

        from ffcnn_tpu.darknet.weights import load_weights as _lw, \
            synth_weights_bytes

        rng = np.random.RandomState(seed)
        cfg_text = _gen_cfg(rng)
        ir = parse_cfg(cfg_text, SIZE, SIZE, is_path=False)
        raw, _ = _lw(ir, synth_weights_bytes(ir, seed=seed, obj_bias=1.5))
        params = params_to_pytree(raw)
        mesh = make_mesh(jax.devices()[:2], pipeline_parallel=2)
        fn = build_pp_pipeline(ir, params, mesh, SIZE, SIZE,
                               n_microbatches=2, topk=TOPK)
        images = _images(4, h=SIZE, w=SIZE, seed=seed)
        got = fn(jnp.asarray(images))
        want = single_device_reference(ir, params, images)
        assert_results_match(got, want)


class TestSegmentedForward:
    def test_segments_compose_to_whole(self, flagship_small):
        """forward_features(start/stop/blobs_in) glued at an arbitrary cut
        reproduces the unsegmented trace bit-for-bit."""
        ir, params = flagship_small
        x = jnp.asarray(np.random.RandomState(3).rand(
            2, ir.blobs[0].h, ir.blobs[0].w, 3).astype(np.float32))
        whole = forward_features(ir, params, x)
        stages = plan_stages(ir, 3)
        blobs = {}
        heads = []
        for i, st in enumerate(stages):
            h, blobs = forward_features(
                ir, params, x if i == 0 else None,
                start=st.start, stop=st.stop, blobs_in=blobs,
                keep_blobs=list(st.live_out))
            heads.extend(h)
        assert len(heads) == len(whole)
        for a, b in zip(heads, whole):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
