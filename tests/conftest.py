"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip sharding tests run on fake CPU devices per SURVEY.md §4 (the
driver separately dry-runs the multichip path); unit tests don't need the
real TPU and must not grab it.
"""

import os

# Force-set: the ambient environment pins JAX_PLATFORMS to the real TPU
# (axon); unit tests must not grab the chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
