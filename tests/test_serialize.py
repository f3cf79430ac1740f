"""Serialization gates: ark-compatible encodings round-trip and proof
byte layouts are deterministic."""

import random

import jax.numpy as jnp

from gemini_tpu.params import R, Q
from gemini_tpu import serialize as ser
from gemini_tpu.refimpl import g1_generator, g1_mul

rnd = random.Random(83)


def test_fr_fq_roundtrip():
    for _ in range(10):
        x = rnd.randrange(R)
        assert ser.fr_from_bytes(ser.fr_to_bytes(x)) == x
        y = rnd.randrange(Q)
        assert ser.fq_from_bytes(ser.fq_to_bytes(y)) == y


def test_g1_uncompressed_roundtrip():
    G = g1_generator()
    pts = [None] + [g1_mul(G, rnd.randrange(1, R)) for _ in range(5)]
    for p in pts:
        b = ser.g1_uncompressed(p)
        assert len(b) == 96
        assert ser.g1_from_uncompressed(b) == p


def test_g1_compressed_flags():
    G = g1_generator()
    assert len(ser.g1_compressed(G)) == 48
    inf = ser.g1_compressed(None)
    assert inf[-1] & (1 << 6)


def test_snark_proof_bytes_deterministic():
    from gemini_tpu.fields.fp import FR
    from gemini_tpu.kzg.commit import CommitterKey
    from gemini_tpu.relation import dummy_r1cs
    from gemini_tpu.snark import Proof

    r1 = dummy_r1cs(rnd, 8)
    ck = CommitterKey.new(max_degree=8, max_eval_points=3, seed=1)
    p1 = Proof.new_time(r1, ck)
    p2 = Proof.new_time(r1, ck)
    b1 = ser.snark_proof_bytes(p1)
    b2 = ser.snark_proof_bytes(p2)
    assert b1 == b2 and len(b1) > 200


def test_g1_compressed_roundtrip():
    G = g1_generator()
    pts = [None, G] + [g1_mul(G, rnd.randrange(1, R)) for _ in range(8)]
    for p in pts:
        b = ser.g1_compressed(p)
        assert ser.g1_from_compressed(b) == p


def test_g1_compressed_rejects_off_curve():
    import pytest

    # x = 1: 1 + 4 = 5 is a QR? Find an x whose rhs is a non-residue.
    for x in range(1, 50):
        rhs = (x * x * x + 4) % Q
        if pow(rhs, (Q - 1) // 2, Q) != 1:
            b = bytearray(ser.fq_to_bytes(x))
            with pytest.raises(ser.DeserializationError):
                ser.g1_from_compressed(bytes(b))
            break
    else:
        raise AssertionError("no non-residue x found in range")


def test_snark_proof_roundtrip_and_verify():
    from gemini_tpu.kzg.commit import CommitterKey, VerifierKey
    from gemini_tpu.relation import dummy_r1cs
    from gemini_tpu.snark import Proof

    r1 = dummy_r1cs(rnd, 8)
    ck = CommitterKey.new(max_degree=8, max_eval_points=3, seed=1)
    p = Proof.new_time(r1, ck)
    b = ser.snark_proof_bytes(p)
    p2 = ser.snark_proof_from_bytes(b)
    assert p2 == p
    assert ser.snark_proof_bytes(p2) == b
    # The deserialized proof must verify like the in-process object.
    vk = VerifierKey.from_committer_key(ck)
    p2.verify(r1, vk)
    # Tampered bytes must not parse into a verifying proof.
    import pytest

    bad = bytearray(b)
    bad[60] ^= 1  # inside zc_alpha
    try:
        p3 = ser.snark_proof_from_bytes(bytes(bad))
    except ser.DeserializationError:
        return
    with pytest.raises(Exception):
        p3.verify(r1, vk)


def test_psnark_proof_roundtrip():
    from gemini_tpu.kzg.commit import CommitterKey
    from gemini_tpu.psnark import Proof, index
    from gemini_tpu.relation import random_r1cs
    from gemini_tpu.relation.r1cs import joint_matrices

    r1 = random_r1cs(rnd, 8, row_nnz=2)
    jm = joint_matrices(r1)
    degree = 8 + jm.num_non_zero + 8
    ck = CommitterKey.new(max_degree=degree, max_eval_points=3, seed=13)
    idx = index(ck, r1)
    p = Proof.new_time(ck, r1, idx)
    b = ser.psnark_proof_bytes(p)
    p2 = ser.psnark_proof_from_bytes(b)
    assert p2 == p
    assert ser.psnark_proof_bytes(p2) == b
