"""KZG commitment: device commit/open vs host oracle + pairing checks
(SURVEY.md §7 step 6 gate; mirrors kzg/tests.rs + kzg/time.rs tests)."""

import random

import jax.numpy as jnp
import pytest

from gemini_tpu.params import R
from gemini_tpu.fields.fp import FR
from gemini_tpu.curve import decode_affine
from gemini_tpu.kzg import CommitterKey, VerifierKey, KZGVerificationError
from gemini_tpu.kzg.commit import (
    _apoint_slice, divide_linear, vanishing_polynomial_host,
)
from gemini_tpu.refimpl import g1_msm, g1_mul

rnd = random.Random(3)


@pytest.fixture(scope="module")
def srs():
    ck = CommitterKey.new(12, 3, seed=1)
    vk = VerifierKey.from_committer_key(ck)
    return ck, vk


def _poly_eval(coeffs, x):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % R
    return acc


def test_srs_structure(srs):
    ck, vk = srs
    tau = ck._tau
    host = decode_affine(_apoint_slice(ck.powers_of_g, 4))
    g = host[0]
    for i in range(4):
        assert host[i] == g1_mul(g, pow(tau, i, R))
    assert len(vk.powers_of_g2) == 4


def test_divide_linear_oracle():
    n = 9
    f = [rnd.randrange(R) for _ in range(n)]
    alpha = rnd.randrange(R)
    ev, q = divide_linear(jnp.asarray(FR.encode(f)), alpha)
    assert ev == _poly_eval(f, alpha)
    # check f(x) - ev == q(x) * (x - alpha) at a random point
    x = rnd.randrange(R)
    qx = _poly_eval(FR.decode(q), x)
    assert (qx * (x - alpha)) % R == (_poly_eval(f, x) - ev) % R


def test_commit_matches_naive_msm(srs):
    ck, _ = srs
    f = [rnd.randrange(R) for _ in range(8)]
    c = ck.commit(jnp.asarray(FR.encode(f)))
    host_pows = decode_affine(_apoint_slice(ck.powers_of_g, 8))
    assert c == g1_msm(host_pows, f)


def test_open_and_verify(srs):
    ck, vk = srs
    f = [rnd.randrange(R) for _ in range(8)]
    fdev = jnp.asarray(FR.encode(f))
    c = ck.commit(fdev)
    alpha = rnd.randrange(R)
    ev, proof = ck.open(fdev, alpha)
    assert ev == _poly_eval(f, alpha)
    vk.verify(c, alpha, ev, proof)
    with pytest.raises(KZGVerificationError):
        vk.verify(c, alpha, (ev + 1) % R, proof)


def test_multi_point_batch_open_verify(srs):
    ck, vk = srs
    f1 = [rnd.randrange(R) for _ in range(8)]
    f2 = [rnd.randrange(R) for _ in range(6)]
    d1 = jnp.asarray(FR.encode(f1))
    d2 = jnp.asarray(FR.encode(f2))
    c1, c2 = ck.commit(d1), ck.commit(d2)
    points = [rnd.randrange(R) for _ in range(3)]
    chal = rnd.randrange(R)
    proof = ck.batch_open_multi_points([d1, d2], points, chal)
    evals = [[_poly_eval(f1, p) for p in points],
             [_poly_eval(f2, p) for p in points]]
    vk.verify_multi_points([c1, c2], points, evals, proof, chal)
    bad = [list(evals[0]), list(evals[1])]
    bad[1][2] = (bad[1][2] + 1) % R
    with pytest.raises(KZGVerificationError):
        vk.verify_multi_points([c1, c2], points, bad, proof, chal)


def test_vanishing_polynomial():
    pts = [10, 5, 13]
    z = vanishing_polynomial_host(pts)
    for p in pts:
        assert _poly_eval(z, p) == 0
    assert _poly_eval(z, 7) != 0
