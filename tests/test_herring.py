"""Herring module-sumcheck and IPA gates (herring/ipa.rs:689-731
analogues).  Host-side pairing arithmetic — sizes kept tiny."""

import random

import pytest

from gemini_tpu.params import R
from gemini_tpu.herring import (
    Crs, FModule, G1Module, InnerProductProof, ModuleSumcheck,
    ModuleTimeProver, ModuleWitness, Vrs,
)
from gemini_tpu.herring.ipa import HerringVerificationError
from gemini_tpu.refimpl import g1_generator, g1_mul, g1_add
from gemini_tpu.transcript import GeminiTranscript

rnd = random.Random(71)


def test_module_sumcheck_f_matches_direct():
    n = 8
    f = [rnd.randrange(R) for _ in range(n)]
    g = [rnd.randrange(R) for _ in range(n)]
    p = ModuleTimeProver(ModuleWitness(FModule, f, g))
    claim = sum(a * b for a, b in zip(f, g)) % R
    reduced = claim
    msg = p.next_message(None)
    while msg is not None:
        a, b = msg
        r = rnd.randrange(R)
        c = (reduced - a) % R
        reduced = (a + b * r + c * r * r) % R
        msg = p.next_message(r)
    ff = p.final_foldings()
    assert ff[0] * ff[1] % R == reduced


def test_module_sumcheck_g1():
    n = 4
    G = g1_generator()
    pts = [g1_mul(G, rnd.randrange(1, R)) for _ in range(n)]
    sc = [rnd.randrange(R) for _ in range(n)]
    p = ModuleTimeProver(ModuleWitness(G1Module, pts, sc))
    m0 = p.next_message(None)
    assert m0 is not None  # (a, b) are G1 points
    r = rnd.randrange(R)
    m1 = p.next_message(r)
    assert m1 is not None
    p.next_message(rnd.randrange(R))
    lhs, rhs = p.final_foldings()
    assert G1Module.p(lhs, rhs) is not None


def test_ipa_roundtrip():
    d = 8
    n = 4
    crs = Crs.new(rnd, d)
    vrs = Vrs.from_crs(crs)
    a = [rnd.randrange(R) for _ in range(n)]
    b = [rnd.randrange(R) for _ in range(n)]
    y = sum(x * z for x, z in zip(a, b)) % R
    comm_a = crs.commit_g1(a)
    comm_b = crs.commit_g2(b)
    tr = GeminiTranscript(b"GEMINI-v0")
    proof = InnerProductProof.new(tr, crs, a, b)
    proof.verify_transcript(vrs, comm_a, comm_b, y)

    with pytest.raises(HerringVerificationError):
        proof.verify_transcript(vrs, comm_a, comm_b, (y + 1) % R)
