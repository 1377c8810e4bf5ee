"""Differential fuzzing over random darknet graphs: the jitted pipeline
must agree with the NumPy oracle on the pre-NMS candidate stream for
arbitrary VALID architectures, not just the curated zoo.  Catches shape-
inference and op-composition edge cases (route/shortcut index rules,
grouped convs, pool quirks) that fixed models can't."""

import numpy as np
import pytest

import conftest
from ffcnn_tpu.darknet import parse_cfg
from ffcnn_tpu.darknet.weights import load_weights, synth_weights_bytes
from ffcnn_tpu.oracle import numpy_ref

SIZE = 64
ACTS = ("linear", "leaky", "relu", "mish")


def _gen_cfg(rng: np.random.RandomState, acts=ACTS,
             c_safe: bool = False, head: str = "yolo") -> str:
    """Random valid darknet graph: conv (dense/depthwise/strided), pools,
    upsample, dropout, shortcut, route, one yolo head.

    ``head='yolov8'`` emits the anchor-free [yolov8] extension head
    instead (random reg_max, DFL decode path) — pure-v8 graphs skip the
    bbox arena and exercise ops/yolo.py::decode_head_v8 on arbitrary
    backbones, not just the curated v8n lowering.

    ``c_safe``: keep the graph runnable by the C REFERENCE binary too
    (tests/test_c_differential.py): route/shortcut never reference either
    side of a dropout's zero-copy blob alias — the reference's refcount
    walk double-frees the shared pointer and SEGFAULTS on such graphs
    (ffcnn.c:412-416 dropout aliasing + 511-517 frees; found by the
    differential fuzzer, minimal repro: conv, dropout, route[-2, 1]).
    This framework handles those graphs fine (blobs are SSA values)."""
    lines = ["[net]", f"width={SIZE}", f"height={SIZE}", "channels=3", ""]
    shapes = []                       # output shape of layer i
    unsafe = set()                    # dropout alias pairs (c_safe)
    h = w = SIZE // 2
    c = int(rng.choice([4, 8]))
    lines += ["[convolutional]", "batch_normalize=1", f"filters={c}",
              "size=3", "stride=2", "pad=1", "activation=leaky", ""]
    shapes.append((h, w, c))

    n_mid = rng.randint(6, 14)
    for _ in range(n_mid):
        op = rng.choice(["conv", "conv", "conv", "dw", "maxpool", "avgpool",
                         "upsample", "dropout", "shortcut", "route"])
        if op == "conv":
            fn = int(rng.choice([4, 6, 8, 12, 16]))
            fs = int(rng.choice([1, 3]))
            stride = 2 if (fs == 3 and h >= 16 and rng.rand() < 0.3) else 1
            act = str(rng.choice(acts))
            bn = int(rng.rand() < 0.8)
            lines += ["[convolutional]"] + (["batch_normalize=1"] if bn
                                            else [])
            lines += [f"filters={fn}", f"size={fs}", f"stride={stride}",
                      f"pad={1 if fs == 3 else 0}", f"activation={act}", ""]
            if stride == 2:
                h, w = h // 2, w // 2
            c = fn
        elif op == "dw":
            fs = int(rng.choice([3, 5]))
            lines += ["[convolutional]", "batch_normalize=1",
                      f"filters={c}", f"size={fs}", "stride=1",
                      f"groups={c}", "pad=1",
                      f"activation={rng.choice(acts)}", ""]
        elif op == "maxpool":
            stride = 2 if (h >= 16 and rng.rand() < 0.5) else 1
            lines += ["[maxpool]", "size=3", f"stride={stride}", ""]
            if stride == 2:
                h, w = h // 2, w // 2
        elif op == "avgpool":
            lines += ["[avgpool]", "size=3", "stride=1", ""]
        elif op == "upsample" and h <= 16:
            lines += ["[upsample]", "stride=2", ""]
            h, w = h * 2, w * 2
        elif op == "dropout":
            lines += ["[dropout]", "probability=.3", ""]
            if c_safe:
                unsafe.update({len(shapes) - 1, len(shapes)})
        elif op == "shortcut":
            # earlier layer with the CURRENT shape (relative index)
            cands = [i for i, s in enumerate(shapes[:-1])
                     if s == (h, w, c) and i not in unsafe]
            if not cands:
                continue
            frm = int(rng.choice(cands)) - len(shapes)      # negative
            lines += ["[shortcut]", f"from={frm}",
                      f"activation={rng.choice(acts)}", ""]
        elif op == "route":
            cands = [i for i, s in enumerate(shapes)
                     if s[0] == h and s[1] == w and i not in unsafe]
            if not cands:
                continue
            picks = [int(x) for x in
                     rng.choice(cands, rng.randint(1, min(3, len(cands)) + 1),
                                replace=False)]
            # index 0 would parse as RELATIVE (<=0 rule, ffcnn.c:179);
            # emit layer 0 as its negative relative form instead
            cur = len(shapes)
            lines += ["[route]",
                      "layers = " + ", ".join(
                          str(p if p > 0 else p - cur) for p in picks)]
            c = sum(shapes[p][2] for p in picks)
            # route groups/group_id (the yolov4-tiny CSP-split extension —
            # NOT parsed by the C reference, so full-dialect graphs only)
            if (not c_safe and len(picks) == 1 and c % 2 == 0
                    and rng.rand() < 0.35):
                lines += ["groups=2", f"group_id={int(rng.randint(0, 2))}"]
                c //= 2
            lines += [""]
        else:
            continue
        shapes.append((h, w, c))

    classes = 2
    if head == "yolov8":
        rm = int(rng.choice([4, 8, 16]))
        lines += ["[convolutional]", f"filters={4 * rm + classes}",
                  "size=1", "stride=1", "pad=0", "activation=linear", ""]
        shapes.append((h, w, 4 * rm + classes))
        lines += ["[yolov8]", f"classes={classes}", f"reg_max={rm}",
                  f"stride={SIZE // h}", "conf=0.45", ""]
    else:
        lines += ["[convolutional]", f"filters={3 * (5 + classes)}",
                  "size=1", "stride=1", "pad=0", "activation=linear", ""]
        shapes.append((h, w, 3 * (5 + classes)))
        lines += ["[yolo]", "mask = 0,1,2",
                  "anchors = 8,8, 16,16, 28,28, 40,40, 52,52, 60,60",
                  f"classes={classes}", "ignore_thresh = .35", ""]
    return "\n".join(lines)


def v8_candidates_fn(ir, size):
    """One shared pure-v8 candidate program — ffcnn_tpu.yolov8
    .candidates_fn (the device differential uses the same; see its
    docstring for why the single copy must NOT live in tests/)."""
    from ffcnn_tpu.yolov8 import candidates_fn
    return candidates_fn(ir, size)


def _jax_candidates_v8(ir, params, img, size):
    """Pre-NMS candidates from the jitted pipeline for a pure-v8 graph
    (decode_head_v8; no bbox arena — it is a reference-format quirk)."""
    import jax
    import jax.numpy as jnp

    from ffcnn_tpu.graph.build import params_to_pytree

    fn = v8_candidates_fn(ir, size)
    d = jax.jit(fn)(params_to_pytree(params), jnp.asarray(img[None]))
    scores = np.asarray(d.scores)[0]
    boxes = np.asarray(d.boxes)[0]
    classes = np.asarray(d.classes)[0]
    return [(int(classes[i]), float(scores[i]), *map(float, boxes[i]))
            for i in np.nonzero(scores > 0)[0]]


@pytest.mark.parametrize("seed", range(4))
def test_random_graph_oracle_parity_v8(seed):
    """decode_head_v8 differential on random backbones (random reg_max,
    random spatial stride): jit vs the NumPy oracle, candidate stream."""
    rng = np.random.RandomState(2000 + seed)
    cfg = _gen_cfg(rng, head="yolov8")
    ir = parse_cfg(cfg, is_path=False)
    params, _ = load_weights(ir, synth_weights_bytes(ir, seed=seed))
    img = rng.randint(0, 256, (SIZE, SIZE, 3), dtype=np.uint8)

    x, _, _ = numpy_ref.letterbox(img, SIZE, SIZE, (0.0,) * 3,
                                  (1 / 255.0,) * 3)
    want = numpy_ref.net_candidates(ir, params, x)
    assert want, f"vacuous comparison (no candidates)\n{cfg}"
    got = _jax_candidates_v8(ir, params, img, SIZE)

    thresh = max(l.ignore_thres for l in ir.layers
                 if l.type.name == "YOLOV8")
    if len(want) != len(got):
        keep = lambda lst: [cd for cd in lst if cd[1] > thresh + 1e-4]
        want, got = keep(want), keep(got)
    assert len(want) == len(got), cfg
    for g, w_ in zip(got, want):
        assert g[0] == w_[0], cfg
        np.testing.assert_allclose(g[1:], w_[1:], rtol=1e-3, atol=1e-3,
                                   err_msg=cfg)


@pytest.mark.parametrize("seed", range(8))
def test_random_graph_oracle_parity(seed):
    rng = np.random.RandomState(1000 + seed)
    cfg = _gen_cfg(rng)
    ir = parse_cfg(cfg, is_path=False)
    params, _ = load_weights(ir, synth_weights_bytes(ir, seed=seed,
                                                     obj_bias=2.0))
    img = rng.randint(0, 256, (SIZE, SIZE, 3), dtype=np.uint8)

    x, _, _ = numpy_ref.letterbox(img, SIZE, SIZE, (0.0,) * 3,
                                  (1 / 255.0,) * 3)
    want = numpy_ref.net_candidates(ir, params, x)
    assert want, f"vacuous comparison (no candidates)\n{cfg}"

    from test_model_zoo import _jax_candidates
    got = _jax_candidates(ir, params, img, SIZE)

    # tolerate float32-vs-float64 threshold knife-edges only
    thresh = max(l.ignore_thres for l in ir.layers
                 if l.type.name == "YOLO")
    if len(want) != len(got):
        keep = lambda lst: [cd for cd in lst if cd[1] > thresh + 1e-4]
        want, got = keep(want), keep(got)
    assert len(want) == len(got), cfg
    for g, w_ in zip(got, want):
        assert g[0] == w_[0], cfg
        np.testing.assert_allclose(g[1:], w_[1:], rtol=1e-3, atol=1e-3,
                                   err_msg=cfg)
