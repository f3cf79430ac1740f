"""MSM kernel vs oracle (SURVEY.md §7 step 5 gate — the analogue of the
reference's Pippenger-vs-naive tests, variable_base.rs:180-215)."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from gemini_tpu.params import R
from gemini_tpu.refimpl import g1_generator, g1_mul, g1_msm
from gemini_tpu.curve import encode_affine, decode_jacobian
from gemini_tpu.fields.fp import FR
from gemini_tpu.ops.msm import msm, extract_digits

rnd = random.Random(5)
G = g1_generator()


@pytest.fixture(autouse=True)
def _force_device_msm(monkeypatch):
    """These tests gate the DEVICE pipeline; disable the CPU-backend
    small-n host fallback (ops/msm.py _host_msm_max) or they would
    compare refimpl against itself."""
    monkeypatch.setenv("GEMINI_TPU_HOST_MSM_MAX", "0")


def _encode_scalars(ks):
    return jnp.asarray(FR.encode(ks, mont=False))


def test_extract_digits_roundtrip():
    ks = [rnd.randrange(R) for _ in range(5)]
    enc = _encode_scalars(ks)
    for c in (3, 13, 16):
        digits = np.asarray(extract_digits(enc, c))
        for j, k in enumerate(ks):
            rec = sum(int(digits[w, j]) << (c * w) for w in range(digits.shape[0]))
            assert rec == k


def test_host_pippenger_matches_naive():
    from gemini_tpu.refimpl import g1_msm_pippenger

    n = 30
    pts = [g1_mul(G, rnd.randrange(1, R)) for _ in range(n)] + [None]
    ks = [rnd.randrange(R) for _ in range(n)] + [5]
    assert g1_msm_pippenger(pts, ks) == g1_msm(pts, ks)
    assert g1_msm_pippenger([], []) is None


def test_msm_host_fallback_matches_kernel(monkeypatch):
    """The CPU small-n host fallback must agree with the device
    pipeline bit-for-bit (same JPoint decode)."""
    n = 33
    pts = [g1_mul(G, rnd.randrange(1, R)) for _ in range(n)]
    ks = [rnd.randrange(R) for _ in range(n)]
    ap, sc = encode_affine(pts), _encode_scalars(ks)
    kernel = decode_jacobian(msm(ap, sc))[0]
    monkeypatch.setenv("GEMINI_TPU_HOST_MSM_MAX", "4096")
    host = decode_jacobian(msm(ap, sc))[0]
    assert kernel == host


def test_msm_small_exact():
    n = 17
    pts = [g1_mul(G, rnd.randrange(1, R)) for _ in range(n)]
    ks = [rnd.randrange(R) for _ in range(n)]
    got = decode_jacobian(msm(encode_affine(pts), _encode_scalars(ks)))[0]
    # oracle via scalar ops on the generator discrete logs is too slow;
    # use refimpl naive msm directly.
    assert got == g1_msm(pts, ks)


def test_msm_edge_scalars():
    pts_raw = [g1_mul(G, i + 2) for i in range(8)]
    pts = pts_raw[:6] + [None, pts_raw[7]]
    ks = [0, 1, R - 1, 2, 0, rnd.randrange(R), 12345, 0]
    got = decode_jacobian(msm(encode_affine(pts), _encode_scalars(ks)))[0]
    expect = g1_msm([p for p in pts if p is not None],
                    [k for p, k in zip(pts, ks) if p is not None])
    assert got == expect


def test_msm_batch_prefixes():
    """msm_batch (the fold-tree batch_commit pipeline) == one msm per
    set, over PREFIXES of the same base array with mixed/odd sizes."""
    from gemini_tpu.ops.msm import msm_batch

    n = 21
    pts = [g1_mul(G, rnd.randrange(1, R)) for _ in range(n)]
    base = encode_affine(pts)
    sizes = [21, 9, 4, 1]
    sets = [[rnd.randrange(R) for _ in range(s)] for s in sizes]
    sets[1][0] = 0  # dead lane inside a shorter set
    got = msm_batch(base, [_encode_scalars(ks) for ks in sets])
    for ks, r in zip(sets, got):
        assert decode_jacobian(r)[0] == g1_msm(pts[: len(ks)], ks)


def test_fixed_base_msm_vs_scalar_muls():
    """fixed_base_msm (SRS setup, packed-table tree reduction) against
    per-scalar refimpl mults, incl. 0/1/R-1 edges."""
    from gemini_tpu.kzg.commit import fixed_base_msm

    base = g1_mul(G, rnd.randrange(1, R))
    ks = [0, 1, R - 1, 2, rnd.randrange(R), 12345, 0, rnd.randrange(R)]
    out = fixed_base_msm(base, _encode_scalars(ks))
    from gemini_tpu.curve import g1 as g1mod

    pts = g1mod.decode_affine(out)
    for k, p in zip(ks, pts):
        assert p == (g1_mul(base, k) if k else None)


def test_msm_duplicate_digits_and_windows():
    # many equal scalars stress the segment machinery
    n = 64
    pts = [g1_mul(G, rnd.randrange(1, R)) for _ in range(n)]
    ks = [7] * 32 + [rnd.randrange(R) for _ in range(31)] + [0]
    for c in (4, 8):
        got = decode_jacobian(
            msm(encode_affine(pts), _encode_scalars(ks), c=c))[0]
        assert got == g1_msm(pts, ks)


def test_glv_decompose_exact():
    """Device GLV decomposition vs host big-int math: reconstruction
    mod r and the balanced component bound (ops/glv.py)."""
    from gemini_tpu.ops import glv

    ks = [rnd.randrange(R) for _ in range(61)] + [0, 1, R - 1, glv.Z2 // 2]
    enc = _encode_scalars(ks)
    k1m, k1n, k2m, k2n = [np.asarray(a) for a in glv.decompose(enc)]

    def col_int(a, j):
        return sum(int(v) << (16 * i) for i, v in enumerate(a[:, j]))

    for j, k in enumerate(ks):
        k1 = col_int(k1m, j) * (-1 if k1n[j] else 1)
        k2 = col_int(k2m, j) * (-1 if k2n[j] else 1)
        assert (k1 + k2 * glv.LAMBDA - k) % R == 0
        assert abs(k1) < glv.COMPONENT_BOUND
        assert abs(k2) < glv.COMPONENT_BOUND


def test_glv_endomorphism():
    """phi(P) = (beta*x, y) == lambda * P on the curve (host oracle)."""
    from gemini_tpu.curve import g1 as g1_mod
    from gemini_tpu.ops import glv
    from gemini_tpu.fields import fp
    from gemini_tpu.fields.fp import FQ

    pts = [g1_mul(G, rnd.randrange(1, R)) for _ in range(4)]
    ap = encode_affine(pts)
    phix = np.asarray(glv.endo_x(ap.x))
    xs = FQ.decode(fp.to_mont(FQ, fp.from_mont(FQ, jnp.asarray(phix))))
    for j, p in enumerate(pts):
        lp = g1_mul(p, glv.LAMBDA)
        assert (xs[j], p[1]) == lp


def test_msm_glv_matches_plain():
    """GLV-split MSM == plain MSM == host oracle, incl. edge scalars
    and infinity points."""
    n = 23
    pts_raw = [g1_mul(G, rnd.randrange(1, R)) for _ in range(n)]
    pts = pts_raw[:20] + [None] + pts_raw[21:]
    ks = [rnd.randrange(R) for _ in range(n - 3)] + [0, 1, R - 1]
    ap = encode_affine(pts)
    sc = _encode_scalars(ks)
    got_glv = decode_jacobian(msm(ap, sc, glv=True))[0]
    got_plain = decode_jacobian(msm(ap, sc, glv=False))[0]
    expect = g1_msm([p for p in pts if p is not None],
                    [k for p, k in zip(pts, ks) if p is not None])
    assert got_glv == got_plain == expect


def test_msm_batch_glv_matches():
    from gemini_tpu.ops.msm import msm_batch

    base = [g1_mul(G, rnd.randrange(1, R)) for _ in range(20)]
    ap = encode_affine(base)
    sets = [
        _encode_scalars([rnd.randrange(R) for _ in range(m)])
        for m in (20, 7, 13)
    ]
    outs = msm_batch(ap, sets, glv=True)
    for s, out in zip(sets, outs):
        m = s.shape[1]
        ks = [sum(int(v) << (16 * i) for i, v in enumerate(np.asarray(s)[:, j]))
              for j in range(m)]
        assert decode_jacobian(out)[0] == g1_msm(base[:m], ks)
