"""Test env: run JAX on a simulated 8-device CPU mesh so sharding tests work
without TPU hardware (SURVEY.md §4d).  Must run before jax imports."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# Hermetic w.r.t. whatever perf config was last measured on-chip: unit
# tests exercise the CODE defaults unless a test opts in explicitly
# (ffcnn_tpu/tuning.py precedence: env > tuned file > default).
os.environ.setdefault("FFCNN_TUNED_DEFAULTS", "")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin in this image ignores the JAX_PLATFORMS env var when it
# was already set at process spawn; the config knob always wins.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def ref_cfg():
    return os.path.join(REFERENCE, "yolo-fastest-1.1.cfg")


@pytest.fixture(scope="session")
def ref_weights():
    return os.path.join(REFERENCE, "yolo-fastest-1.1.weights")


@pytest.fixture(scope="session")
def ref_bmp():
    return os.path.join(REFERENCE, "test.bmp")


def fixture_path(name):
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fixtures", name)
