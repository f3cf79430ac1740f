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


@pytest.mark.parametrize("nf,ng,twist", [(8, 8, 1), (8, 8, 5), (6, 8, 3),
                                         (7, 5, 9), (16, 16, 1)])
def test_module_space_prover_matches_time(nf, ng, twist):
    """Space prover == time prover, message for message, across module
    types and ragged/odd lengths (the reference's load-bearing
    time/space idiom, space_prover.rs + SURVEY.md §4)."""
    from gemini_tpu.herring.space import ModuleSpaceProver

    f = [rnd.randrange(R) for _ in range(nf)]
    g = [rnd.randrange(R) for _ in range(ng)]
    pt = ModuleTimeProver(ModuleWitness(FModule, f, g, twist))
    ps = ModuleSpaceProver(ModuleWitness(FModule, f, g, twist))
    assert pt.rounds() == ps.rounds()
    r = None
    while True:
        mt = pt.next_message(r)
        ms = ps.next_message(r)
        assert mt == ms
        if mt is None:
            break
        r = rnd.randrange(R)
    assert pt.final_foldings() == ps.final_foldings()


def test_module_space_prover_g1_and_pairing():
    from gemini_tpu.herring import G2Module, PModule
    from gemini_tpu.herring.space import ModuleSpaceProver
    from gemini_tpu.refimpl import g2_generator, g2_mul

    G = g1_generator()
    H = g2_generator()
    n = 4
    pts1 = [g1_mul(G, rnd.randrange(1, R)) for _ in range(n)]
    pts2 = [g2_mul(H, rnd.randrange(1, R)) for _ in range(n)]
    sc = [rnd.randrange(R) for _ in range(n)]
    for mod, f, g in [(G1Module, pts1, sc), (G2Module, sc, pts2),
                      (PModule, pts1, pts2)]:
        pt = ModuleTimeProver(ModuleWitness(mod, f, g))
        ps = ModuleSpaceProver(ModuleWitness(mod, f, g))
        r = None
        while True:
            mt = pt.next_message(r)
            ms = ps.next_message(r)
            assert mt == ms, mod.__name__
            if mt is None:
                break
            r = rnd.randrange(R)
        assert pt.final_foldings() == ps.final_foldings()


def test_module_elastic_prover_switch():
    """ElasticProver switches space->time mid-protocol with an
    unchanged transcript (elastic_prover.rs:44-57 idiom)."""
    from gemini_tpu.herring.space import ModuleElasticProver

    n = 16
    f = [rnd.randrange(R) for _ in range(n)]
    g = [rnd.randrange(R) for _ in range(n)]
    pt = ModuleTimeProver(ModuleWitness(FModule, f, g, 7))
    pe = ModuleElasticProver(ModuleWitness(FModule, f, g, 7), threshold=2)
    r = None
    while True:
        mt = pt.next_message(r)
        me = pe.next_message(r)
        assert mt == me
        if mt is None:
            break
        r = rnd.randrange(R)
    assert pe.is_time
    assert pt.final_foldings() == pe.final_foldings()


def test_crs_stream_matches_dense():
    """CrsStream commits/truncations == dense Crs (ipa.rs:74-146)."""
    from gemini_tpu.herring import Crs, CrsStream

    r = random.Random(5)
    crs = Crs.new(r, 9)
    stream = CrsStream(crs.g1s, crs.g2s)
    sc = [rnd.randrange(R) for _ in range(8)]
    assert stream.commit_g1(sc) == crs.commit_g1(sc)
    assert stream.commit_g2(sc) == crs.commit_g2(sc)
    t = stream.truncate(2)
    assert t.materialize().g1s == crs.truncate(2).g1s
    h = t.halve()
    assert h.materialize().g2s == crs.truncate(2).halve().g2s
