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
