"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (the reference has no
multi-node tests, SURVEY.md §4; our multi-chip story is validated here
without a pod, and the driver separately dry-runs `dryrun_multichip`).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import random

import pytest


@pytest.fixture
def rng():
    return random.Random(0x47454D)  # "GEM"
