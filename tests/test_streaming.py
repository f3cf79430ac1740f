"""Space/elastic-vs-time consistency — the reference's load-bearing
test idiom (SURVEY.md §4): streaming provers must emit transcripts and
proofs IDENTICAL to the dense provers."""

import random

import jax.numpy as jnp
import pytest

from gemini_tpu.params import R
from gemini_tpu.fields.fp import FR
from gemini_tpu.kzg.commit import CommitterKey, VerifierKey
from gemini_tpu.relation import random_r1cs
from gemini_tpu.snark import Proof
from gemini_tpu.streaming import (
    CommitterKeyStream, ElasticProver, HostVector, SpaceProver,
)
from gemini_tpu.subprotocols.sumcheck import Sumcheck, TimeProver
from gemini_tpu.transcript import GeminiTranscript

rnd = random.Random(53)


def _hv(vals):
    return HostVector.from_ints(vals)


@pytest.mark.parametrize("nf,ng", [(32, 32), (33, 27), (8, 8)])
def test_space_prover_matches_time(nf, ng):
    f = [rnd.randrange(R) for _ in range(nf)]
    g = [rnd.randrange(R) for _ in range(ng)]
    twist = rnd.randrange(R)
    t1 = GeminiTranscript(b"GEMINI-v0")
    dense = Sumcheck.prove(
        t1, TimeProver(jnp.asarray(FR.encode(f)), jnp.asarray(FR.encode(g)), twist)
    )
    t2 = GeminiTranscript(b"GEMINI-v0")
    space = Sumcheck.prove(
        t2, SpaceProver(_hv(f), _hv(g), twist, block_size=16)
    )
    assert dense.messages == space.messages
    assert dense.final_foldings == space.final_foldings


@pytest.mark.parametrize("threshold", [0, 2, 4, 100])
def test_elastic_prover_matches_time(threshold):
    n = 64
    f = [rnd.randrange(R) for _ in range(n)]
    g = [rnd.randrange(R) for _ in range(n)]
    twist = rnd.randrange(R)
    t1 = GeminiTranscript(b"GEMINI-v0")
    dense = Sumcheck.prove(
        t1, TimeProver(jnp.asarray(FR.encode(f)), jnp.asarray(FR.encode(g)), twist)
    )
    t2 = GeminiTranscript(b"GEMINI-v0")
    elastic = Sumcheck.prove(
        t2, ElasticProver(_hv(f), _hv(g), twist, block_size=16,
                          threshold=threshold)
    )
    assert dense.messages == elastic.messages
    assert dense.final_foldings == elastic.final_foldings


@pytest.fixture(scope="module")
def keys():
    ck = CommitterKey.new(max_degree=63, max_eval_points=3, seed=19)
    return ck, VerifierKey.from_committer_key(ck)


def test_streaming_commit_matches_dense(keys):
    ck, _ = keys
    cks = CommitterKeyStream(ck, max_msm_buffer=16)
    vals = [rnd.randrange(R) for _ in range(50)]
    coeffs = jnp.asarray(FR.encode(vals))
    assert cks.commit(_hv(vals)) == ck.commit(coeffs)


def test_streaming_open_matches_dense(keys):
    ck, vk = keys
    cks = CommitterKeyStream(ck, max_msm_buffer=16)
    vals = [rnd.randrange(R) for _ in range(50)]
    coeffs = jnp.asarray(FR.encode(vals))
    x = rnd.randrange(R)
    ev_d, prf_d = ck.open(coeffs, x)
    ev_s, prf_s = cks.open(_hv(vals), x)
    assert ev_s == ev_d
    assert prf_s == prf_d
    vk.verify(ck.commit(coeffs), x, ev_s, prf_s)


def test_snark_elastic_equals_time(keys):
    """snark/tests.rs:14-57 analogue: whole-proof equality."""
    ck, vk = keys
    cks = CommitterKeyStream(ck, max_msm_buffer=16)
    r1 = random_r1cs(rnd, 16)
    pt = Proof.new_time(r1, ck)
    pe = Proof.new_elastic(r1, cks, block_size=8, threshold=2)
    assert pt.witness_commitment == pe.witness_commitment
    assert pt.zc_alpha == pe.zc_alpha
    assert pt.first_sumcheck_msgs == pe.first_sumcheck_msgs
    assert pt.second_sumcheck_msgs == pe.second_sumcheck_msgs
    assert pt.tensorcheck_proof == pe.tensorcheck_proof
    pe.verify(r1, vk)
