"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (the reference has no
multi-node tests, SURVEY.md §4; our multi-chip story is validated here
without a pod, and the driver separately dry-runs `dryrun_multichip`).

IMPORTANT: this environment pre-imports jax at interpreter startup and
registers a real TPU ("axon") backend, with JAX_PLATFORMS=axon captured
at import time.  Setting os.environ here is therefore too late — we
must redirect via `jax.config.update` BEFORE the first backend
initialization (conftest runs before any test imports trigger one).
"""

import os

# XLA_FLAGS is read lazily at backend-init time, so the env route still
# works for the virtual device count.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: field/curve kernels are huge uint32
# graphs; caching across test processes keeps the suite fast.
# setup_compilation_cache quarantines the dir after an unclean exit
# (poison entries segfault later readers) and transparently switches a
# second concurrent pytest process to a private dir (concurrent
# writers can segfault, CLAUDE.md).
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from gemini_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache(
    os.environ.get("GEMINI_TPU_TEST_CACHE", "/tmp/gemini_tpu_jax_cache"))

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"

import random

import pytest


@pytest.fixture
def rng():
    return random.Random(0x47454D)  # "GEM"
