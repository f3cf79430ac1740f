"""End-to-end SNARK tests (snark/tests.rs analogues) plus the sparse
linear-algebra and relation-layer gates they depend on."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from gemini_tpu.params import R
from gemini_tpu.fields import fp
from gemini_tpu.fields.fp import FR
from gemini_tpu.kzg.commit import CommitterKey, VerifierKey
from gemini_tpu.relation import dummy_r1cs, random_r1cs
from gemini_tpu.snark import Proof, SnarkVerificationError

rnd = random.Random(17)


def test_reduce_relaxed_matches_host_sum():
    vals = [rnd.randrange(R) for _ in range(1000)] + [0, R - 1, 1]
    enc = jnp.asarray(FR.encode(vals))
    s = fp.lane_sum(FR, enc, axis=1)
    red = fp.reduce_relaxed(FR, jnp.asarray(s)[:, None])
    assert FR.decode(red)[0] == sum(vals) % R


def test_sparse_matvec_and_rmatvec():
    r1 = random_r1cs(rnd, 16)
    assert FR.decode(r1.a.matvec(r1.z)) == r1.a.matvec_host(r1.z_int)
    r = [rnd.randrange(R) for _ in range(16)]
    got = FR.decode(r1.a.rmatvec(jnp.asarray(FR.encode(r))))
    exp = [0] * r1.a.n_cols
    for rr, cc, vv in zip(r1.a.rows, r1.a.cols, r1.a.vals_int):
        exp[int(cc)] = (exp[int(cc)] + vv * r[int(rr)]) % R
    assert got == exp


def test_relation_generators_satisfied():
    assert dummy_r1cs(rnd, 8).is_satisfied()
    assert random_r1cs(rnd, 8).is_satisfied()


@pytest.fixture(scope="module")
def keys():
    ck = CommitterKey.new(max_degree=31, max_eval_points=3, seed=11)
    return ck, VerifierKey.from_committer_key(ck)


def test_snark_random_r1cs_roundtrip(keys):
    ck, vk = keys
    r1 = random_r1cs(rnd, 16)
    proof = Proof.new_time(r1, ck)
    proof.verify(r1, vk)


def test_snark_dummy_r1cs_roundtrip(keys):
    ck, vk = keys
    r1 = dummy_r1cs(rnd, 16)
    proof = Proof.new_time(r1, ck)
    proof.verify(r1, vk)


def test_snark_rejects_tampering(keys):
    ck, vk = keys
    r1 = random_r1cs(rnd, 16)
    proof = Proof.new_time(r1, ck)

    bad = Proof.new_time(r1, ck)
    bad.zc_alpha = (bad.zc_alpha + 1) % R
    with pytest.raises(SnarkVerificationError):
        bad.verify(r1, vk)

    bad2 = Proof.new_time(r1, ck)
    m0 = bad2.second_sumcheck_msgs[0]
    m0[0] = ((m0[0][0] + 1) % R, m0[0][1])
    with pytest.raises(SnarkVerificationError):
        bad2.verify(r1, vk)

    # proof for a different witness must not verify against this one
    other = random_r1cs(rnd, 16)
    p_other = Proof.new_time(other, ck)
    with pytest.raises(SnarkVerificationError):
        p_other.verify(r1, vk)


def test_snark_roundtrip_4k():
    """Scaled e2e at 2^12 constraints (VERDICT round-1 item 5)."""
    n = 1 << 12
    ck = CommitterKey.new(max_degree=n, max_eval_points=3, seed=21)
    vk = VerifierKey.from_committer_key(ck)
    r1cs = dummy_r1cs(random.Random(12), n)
    proof = Proof.new_time(r1cs, ck)
    proof.verify(r1cs, vk)
