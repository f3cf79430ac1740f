"""Circuit-frontend tests (circuit.rs:152-175 `generate_relation`
analogue): build a non-trivial circuit with the constraint-builder API,
lower it to the COO relation, and prove + verify it end-to-end with
both SNARKs."""

import random

import pytest

from gemini_tpu.kzg.commit import CommitterKey, VerifierKey
from gemini_tpu.params import R
from gemini_tpu.relation import ConstraintBuilder, LinComb
from gemini_tpu.relation.r1cs import joint_matrices


def cubic_circuit(x_val: int = 3):
    """x^3 + x + 5 = out (the classic toy circuit)."""
    cs = ConstraintBuilder()
    out = cs.public_input((x_val**3 + x_val + 5) % R)
    x = cs.witness(x_val)
    x2 = cs.mul(x, x)
    x3 = cs.mul(x2, x)
    cs.enforce(x3 + x + 5, LinComb.one(), out)
    return cs


def test_builder_lowering_satisfied():
    r1cs = cubic_circuit().build()
    assert r1cs.is_satisfied()
    # square system, z = (1, publics, witnesses, padding)
    assert r1cs.z_int[0] == 1
    assert r1cs.x_int == r1cs.z_int[:2]
    assert len(r1cs.z_int) == r1cs.a.n_rows


def test_builder_rejects_unsatisfied():
    cs = ConstraintBuilder()
    a = cs.witness(2)
    b = cs.witness(3)
    cs.enforce(a, b, LinComb.constant(7))  # 2*3 != 7
    with pytest.raises(AssertionError):
        cs.build()


def test_builder_linear_combinations():
    cs = ConstraintBuilder()
    a = cs.witness(4)
    b = cs.witness(6)
    # (a + 2b - 1) * 3 = 45
    cs.enforce(a + 2 * b - 1, LinComb.constant(3), LinComb.constant(45))
    r1cs = cs.build()
    assert r1cs.is_satisfied()


def test_builder_circuit_snark_roundtrip():
    from gemini_tpu.snark import Proof

    r1cs = cubic_circuit().build()
    n = r1cs.a.n_rows
    ck = CommitterKey.new(max_degree=n, max_eval_points=3, seed=3)
    vk = VerifierKey.from_committer_key(ck)
    proof = Proof.new_time(r1cs, ck)
    proof.verify(r1cs, vk)


def test_builder_circuit_psnark_roundtrip():
    from gemini_tpu.psnark import Proof, index

    r1cs = cubic_circuit().build()
    jm = joint_matrices(r1cs)
    n = r1cs.a.n_rows
    degree = n + jm.num_non_zero + n
    ck = CommitterKey.new(max_degree=degree, max_eval_points=3, seed=4)
    vk = VerifierKey.from_committer_key(ck)
    idx = index(ck, r1cs)
    proof = Proof.new_time(ck, r1cs, idx)
    proof.verify(r1cs, vk, idx, jm.num_non_zero)
