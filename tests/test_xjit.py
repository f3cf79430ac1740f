"""Disk trace cache (utils/xjit.py): the sumcheck kernels must produce
identical transcripts through all three paths — plain jit (cache
disabled, the CPU-test default), fresh export (write), and deserialized
export (reload).  Mirrors the kernel-vs-refimpl equality idiom."""

import os
import tempfile

import jax.numpy as jnp
import pytest

from gemini_tpu.fields.fp import FR
from gemini_tpu.subprotocols import sumcheck as sc
from gemini_tpu.transcript import GeminiTranscript
from gemini_tpu.utils import xjit


@pytest.fixture
def export_dir(monkeypatch):
    with tempfile.TemporaryDirectory() as d:
        monkeypatch.setenv("GEMINI_TPU_EXPORT_CACHE", d)
        monkeypatch.setenv("GEMINI_TPU_EXPORT_CPU", "1")
        saved = dict(xjit._MEM)
        xjit._MEM.clear()
        yield d
        xjit._MEM.clear()
        xjit._MEM.update(saved)


def _prove(n=64):
    f = jnp.asarray(FR.encode([3 + 7 * i for i in range(n)]))
    g = jnp.asarray(FR.encode([5 + 11 * i for i in range(n)]))
    t = GeminiTranscript(b"xjit-test")
    s = sc.Sumcheck.prove(t, sc.TimeProver(f, g, 12345))
    return s.messages, s.final_foldings


def test_export_cache_write_then_reload(export_dir):
    baseline = _prove()  # plain-jit reference comes from the suite's
    # other sumcheck tests; here assert write/reload self-consistency
    assert os.listdir(export_dir), "no exports written"
    xjit._MEM.clear()  # drop live jits -> force deserialize from disk
    reloaded = _prove()
    assert baseline == reloaded


def test_export_cache_disabled_matches(export_dir, monkeypatch):
    through_cache = _prove()
    monkeypatch.setenv("GEMINI_TPU_EXPORT_CACHE", "0")
    plain = _prove()
    assert through_cache == plain
