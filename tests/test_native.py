"""Native C++ transcript engine vs the pure-Python specification:
byte-for-byte equality on messages and challenges."""

import random

import pytest

from gemini_tpu import native
from gemini_tpu.transcript import GeminiTranscript, Transcript

rnd = random.Random(61)


@pytest.mark.skipif(native.load() is None, reason="no C++ toolchain")
def test_native_transcript_matches_python():
    tn = native.NativeTranscript(b"GEMINI-v0")
    tp = Transcript(b"GEMINI-v0")
    for i in range(50):
        label = bytes(f"label-{i % 7}", "ascii")
        msg = bytes(rnd.randrange(256) for _ in range(rnd.randrange(0, 100)))
        tn.append_message(label, msg)
        tp.append_message(label, msg)
        if i % 3 == 0:
            n = rnd.choice([16, 32, 64])
            assert tn.challenge_bytes(b"chal", n) == \
                tp.challenge_bytes(b"chal", n)


@pytest.mark.skipif(native.load() is None, reason="no C++ toolchain")
def test_gemini_transcript_native_vs_python_challenges():
    a = GeminiTranscript(b"GEMINI-v0")
    b = GeminiTranscript(b"GEMINI-v0", force_python=True)
    for i in range(10):
        a.append_message(b"m", bytes([i] * 32))
        b.append_message(b"m", bytes([i] * 32))
        assert a.get_challenge(b"c") == b.get_challenge(b"c")


@pytest.mark.skipif(native.load() is None, reason="no C++ toolchain")
def test_native_speedup_sanity():
    import time

    t0 = time.time()
    a = GeminiTranscript(b"bench")
    for i in range(200):
        a.append_message(b"m", b"x" * 64)
        a.get_challenge(b"c")
    native_t = time.time() - t0
    t0 = time.time()
    b = GeminiTranscript(b"bench", force_python=True)
    for i in range(200):
        b.append_message(b"m", b"x" * 64)
        b.get_challenge(b"c")
    python_t = time.time() - t0
    assert native_t < python_t  # typically ~100x
