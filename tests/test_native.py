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


# ---------------------------------------------------------------------------
# Native BLS12-381 (native/bls.py) vs the pure-Python refimpl oracle.
# hostcurve dispatches protocol code to the native path, so these pins
# are what keeps the dispatch sound.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def nbls():
    from gemini_tpu.native import bls

    if not bls.available():
        pytest.skip("no C++ toolchain for native BLS")
    return bls


def test_native_bls_group_ops_match_refimpl(nbls):
    import random

    from gemini_tpu import refimpl as ri
    from gemini_tpu.params import R

    rnd = random.Random(5)
    G, G2 = ri.g1_generator(), ri.g2_generator()
    for _ in range(4):
        k = rnd.randrange(R)
        assert nbls.g1_mul(G, k) == ri.g1_mul(G, k)
        assert nbls.g2_mul(G2, k) == ri.g2_mul(G2, k)
    p1, p2 = ri.g1_mul(G, 1234), ri.g1_mul(G, 987654321)
    assert nbls.g1_add(p1, p2) == ri.g1_add(p1, p2)
    assert nbls.g1_add(p1, p1) == ri.g1_double(p1)
    assert nbls.g1_add(p1, None) == p1
    assert nbls.g1_add(None, None) is None
    assert nbls.g1_add(p1, ri.g1_neg(p1)) is None
    assert nbls.g1_mul(p1, 0) is None
    q1, q2 = ri.g2_mul(G2, 31), ri.g2_mul(G2, 77)
    assert nbls.g2_add(q1, q2) == ri.g2_add(q1, q2)
    from gemini_tpu.refimpl.curve import g2_double
    assert nbls.g2_add(q1, q1) == g2_double(q1)
    assert nbls.g2_add(q1, ri.g2_neg(q1)) is None


def test_native_bls_msm_matches_refimpl(nbls):
    import random

    from gemini_tpu import refimpl as ri
    from gemini_tpu.params import R

    rnd = random.Random(6)
    G = ri.g1_generator()
    pts = [ri.g1_mul(G, rnd.randrange(1, R)) for _ in range(33)] + [None]
    ks = [rnd.randrange(R) for _ in range(33)] + [5]
    assert nbls.g1_msm(pts, ks) == ri.g1_msm_pippenger(pts, ks)
    assert nbls.g1_msm([], []) is None
    assert nbls.g1_msm(pts[:1], [0]) is None


def test_native_bls_pairing_matches_refimpl(nbls):
    from gemini_tpu import refimpl as ri
    from gemini_tpu.refimpl.fields import Fq12

    G, G2 = ri.g1_generator(), ri.g2_generator()
    p, q = ri.g1_mul(G, 7), ri.g2_mul(G2, 11)
    assert nbls.pairing(p, q) == ri.pairing(p, q)
    # bilinearity: e(7G, 11H) == e(77G, H)
    assert nbls.pairing(ri.g1_mul(G, 77), G2) == nbls.pairing(p, q)
    # identity edges
    assert nbls.pairing(None, q) == Fq12.one()
    assert nbls.pairing(p, None) == Fq12.one()
    # multi_pairing: e(P,Q) * e(-P,Q) == 1
    assert nbls.multi_pairing([p, ri.g1_neg(p)], [q, q]) == Fq12.one()
    assert nbls.multi_pairing([p], [q]) == ri.pairing(p, q)


def test_native_fixed_base_matches_refimpl(nbls):
    import random

    from gemini_tpu import refimpl as ri
    from gemini_tpu.params import R

    rnd = random.Random(9)
    G = ri.g1_mul(ri.g1_generator(), 55)
    ks = [0, 1, R - 1] + [rnd.randrange(R) for _ in range(10)]
    out = nbls.g1_fixed_base(G, ks)
    for k, p in zip(ks, out):
        assert p == ri.g1_mul(G, k)


def test_committer_key_host_fixed_base_matches_device():
    """The CPU-backend native SRS path must produce the identical key
    to the device table-gather pipeline."""
    import os

    import numpy as np

    from gemini_tpu.kzg.commit import CommitterKey
    from gemini_tpu.native import bls

    if not bls.available():
        import pytest

        pytest.skip("no C++ toolchain")
    os.environ["GEMINI_TPU_HOST_FIXED_BASE"] = "1"
    try:
        ck1 = CommitterKey.new(max_degree=40, max_eval_points=3, seed=5)
    finally:
        os.environ["GEMINI_TPU_HOST_FIXED_BASE"] = "0"
    try:
        ck2 = CommitterKey.new(max_degree=40, max_eval_points=3, seed=5)
    finally:
        del os.environ["GEMINI_TPU_HOST_FIXED_BASE"]
    assert np.array_equal(np.asarray(ck1.powers_of_g.x),
                          np.asarray(ck2.powers_of_g.x))
    assert np.array_equal(np.asarray(ck1.powers_of_g.y),
                          np.asarray(ck2.powers_of_g.y))
    assert ck1.powers_of_g2 == ck2.powers_of_g2
