"""Differential tests against the LIVING C reference binary (VERDICT r2 #2).

The reference's verification story is its demo (ffcnn.c:552-593); these
tests compile that demo from the read-only source tree and run it SIDE BY
SIDE with the JAX parity pipeline — flagship real weights over a ~50-image
corpus at several ALIGN-32 geometries, plus every C-dialect zoo family fed
identical synthesized .weights files on both sides (net_load accepts any
cfg/weights pair, ffcnn.c:114-247).  Acceptance tiers and tolerances are
defined in tools/c_differential.py (exact / set-equal / fuzzy; the fuzzy
slack absorbs f32 accumulation-order knife edges only — any structural
divergence fails the count/class gates).
"""

import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import c_differential as cd  # noqa: E402

pytestmark = pytest.mark.skipif(
    shutil.which("gcc") is None or not os.path.exists(cd.REFERENCE),
    reason="needs gcc and the reference tree")


@pytest.fixture(scope="session")
def c_binary():
    return cd.build_reference("v6")


@pytest.fixture(scope="session")
def corpus(tmp_path_factory):
    out = tmp_path_factory.mktemp("corpus")
    return cd.generate_corpus(str(out))


def test_reference_binary_reproduces_golden(c_binary):
    """Sanity: the freshly built binary reproduces the golden detections
    (same output every SURVEY/BASELINE fixture was captured from)."""
    lines = cd.run_c(c_binary, os.path.join(cd.REFERENCE, "test.bmp"),
                     os.path.join(cd.REFERENCE, "yolo-fastest-1.1.cfg"),
                     os.path.join(cd.REFERENCE, "yolo-fastest-1.1.weights"))
    assert lines == [
        "score: 1.00, category:  0, rect: (188  96 273 365)",
        "score: 0.98, category: 18, rect: (397 125 601 345)",
        "score: 0.95, category: 16, rect: ( 68 264 201 350)",
    ]


def test_flagship_corpus_differential(c_binary, corpus):
    """Real trained weights, ~50 diverse images, 5 input geometries: every
    image must agree with the C binary on box count and classes with all
    boxes fuzzy-matched (<=0.03 score, <=6 px), and >=70% of images must be
    line-for-line exact (observed: ~77-87% exact; the rest are f32
    int-cast knife edges)."""
    n = sum(len(v) for v in corpus.values())
    assert n >= 45, f"corpus unexpectedly small: {n}"
    res = cd.diff_flagship(c_binary, corpus)
    assert res.total == n
    assert cd.flagship_ok(res), "\n" + res.report("flagship", verbose=True)


@pytest.mark.parametrize("family", sorted(dict(cd.C_DIALECT_ZOO,
                                               **cd.C_VARIANT_ZOO)))
def test_zoo_family_differential(c_binary, family, tmp_path):
    """Each C-dialect zoo family (plus the leaky-rewrite variants of the
    mish families) runs the SAME synthesized weights through the C binary
    and the parity pipeline.  yolov4-tiny is excluded by construction: its
    [route] groups/group_id keys are this framework's extension — the C
    parser has no such keys, so one cfg/weights pair would describe two
    different architectures (models/README.md)."""
    size = dict(cd.C_DIALECT_ZOO, **cd.C_VARIANT_ZOO)[family]
    results = cd.diff_zoo(c_binary, str(tmp_path), families={family: size})
    res = results[family]
    assert cd.zoo_ok(family, res), "\n" + res.report(family, verbose=True)
