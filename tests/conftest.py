"""Test configuration: force an 8-device virtual CPU mesh before JAX import.

This is the JAX-native way to exercise multi-chip sharding without TPUs
(SURVEY.md §4) — every test sees jax.devices() == 8 CPU devices.

Real-TPU lane: ``ANYLOC_TPU_LANE=1 python -m pytest tests -m tpu -q`` keeps
the shell's axon/TPU backend instead, and selects the per-kernel tests that
must execute on real hardware at least once per round — interpret-mode CPU
runs cannot catch Mosaic lowering gaps (a missing `erf` lowering shipped
past CPU tests in round 1, docs/ROUND_NOTES.md hazards).
"""

import os

TPU_LANE = os.environ.get("ANYLOC_TPU_LANE", "") == "1"

if not TPU_LANE:
    # Force CPU even when the shell exports JAX_PLATFORMS=axon/tpu: unit
    # tests validate math on the virtual 8-device CPU mesh; TPU execution is
    # covered by the tpu lane, bench.py, and the driver's compile checks.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not TPU_LANE:
    # The axon TPU harness overrides JAX_PLATFORMS at import; the config
    # update below is what actually pins tests to the virtual CPU mesh.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", False)
    assert jax.local_device_count() == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    if TPU_LANE:
        return
    skip_tpu = pytest.mark.skip(
        reason="real-TPU lane test (run with ANYLOC_TPU_LANE=1 -m tpu)"
    )
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip_tpu)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
