"""Preprocessing SNARK end-to-end (psnark/tests.rs analogue)."""

import random

import pytest

from gemini_tpu.params import R
from gemini_tpu.kzg.commit import CommitterKey, VerifierKey
from gemini_tpu.relation import random_r1cs
from gemini_tpu.relation.r1cs import joint_matrices
from gemini_tpu.psnark import Proof, PsnarkVerificationError, index

rnd = random.Random(41)


@pytest.fixture(scope="module")
def setup():
    r1 = random_r1cs(rnd, 8, row_nnz=2)
    jm = joint_matrices(r1)
    # SRS must cover the longest committed polynomial: the sorted-z /
    # accumulator vectors reach num_variables + num_non_zero + 1.
    degree = 8 + jm.num_non_zero + 8
    ck = CommitterKey.new(max_degree=degree, max_eval_points=3, seed=13)
    vk = VerifierKey.from_committer_key(ck)
    idx = index(ck, r1)
    return r1, jm, ck, vk, idx


def test_psnark_roundtrip(setup):
    r1, jm, ck, vk, idx = setup
    proof = Proof.new_time(ck, r1, idx)
    proof.verify(r1, vk, idx, jm.num_non_zero)


def test_psnark_rejects_tampering(setup):
    r1, jm, ck, vk, idx = setup
    proof = Proof.new_time(ck, r1, idx)
    proof.zc_alpha = (proof.zc_alpha + 1) % R
    with pytest.raises(PsnarkVerificationError):
        proof.verify(r1, vk, idx, jm.num_non_zero)

    proof2 = Proof.new_time(ck, r1, idx)
    proof2.set_z_ep = (proof2.set_z_ep + 1) % R
    with pytest.raises(PsnarkVerificationError):
        proof2.verify(r1, vk, idx, jm.num_non_zero)
