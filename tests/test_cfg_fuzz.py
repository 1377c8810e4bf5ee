"""cfg parser robustness: the reference tolerates sloppy cfg text (strstr
key lookup, skipped unknown sections, missing keys defaulting); the parser
must never crash on weird-but-parseable input, and must raise cleanly (not
crash) on structurally broken graphs."""

import numpy as np
import pytest

from ffcnn_tpu.darknet import parse_cfg, dump

BASE = """
[net]
width=64
height=64
channels=3

[convolutional]
batch_normalize=1
filters=8
size=3
stride=2
pad=1
activation=leaky
"""


def test_whitespace_comments_and_crlf():
    noisy = BASE.replace("\n", "\r\n").replace(
        "[convolutional]", "# a comment line\n[convolutional]")
    ir = parse_cfg(noisy, is_path=False)
    assert len(ir.layers) == 1 and ir.blobs[1].c == 8


def test_missing_optional_keys_default():
    """stride/groups omitted -> 1; pad omitted -> 0 (ffcnn.c:140-145)."""
    cfg = BASE + "\n[convolutional]\nfilters=4\nsize=1\nactivation=linear\n"
    ir = parse_cfg(cfg, is_path=False)
    l = ir.layers[1]
    assert (l.stride, l.groups, l.pad) == (1, 1, 0)


def test_key_lookup_is_substring_tolerant():
    """The reference finds keys by strstr within the section window
    (ffcnn.c:64-84) — keys embedded mid-line still parse."""
    cfg = BASE.replace("stride=2", "  stride=2  # trailing words")
    ir = parse_cfg(cfg, is_path=False)
    assert ir.layers[0].stride == 2


def test_random_garbage_between_sections():
    rng = np.random.RandomState(0)
    junk = "".join(chr(c) for c in rng.randint(33, 90, 200) if chr(c) != "[")
    ir = parse_cfg(BASE + "\n" + junk, is_path=False)
    assert len(ir.layers) == 1


@pytest.mark.parametrize("mutation", [
    lambda s: s.replace("filters=8", "filters=0"),       # zero filters
    lambda s: s + "\n[shortcut]\nfrom=-99\n",            # OOB shortcut
    lambda s: s + "\n[route]\nlayers = 99\n",            # OOB route
])
def test_broken_graphs_raise_not_crash(mutation):
    cfg = mutation(BASE)
    try:
        ir = parse_cfg(cfg, is_path=False)
        dump(ir)                                  # rendering must not crash
        # a structurally broken graph either raised above or produced a
        # degenerate-but-inspectable IR; running it is what raises
    except (ValueError, IndexError, KeyError):
        pass  # clean python exception is the contract (no silent segfault)


def test_dump_roundtrip_stability():
    """dump() output is stable across repeated parses of the same text."""
    ir1 = parse_cfg(BASE, is_path=False)
    ir2 = parse_cfg(BASE, is_path=False)
    assert dump(ir1) == dump(ir2)
