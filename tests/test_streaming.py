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


def test_divide_linear_stream_matches_dense(keys):
    from gemini_tpu.kzg.commit import divide_linear
    from gemini_tpu.streaming import divide_linear_stream

    vals = [rnd.randrange(R) for _ in range(37)]
    coeffs = jnp.asarray(FR.encode(vals))
    for x in (rnd.randrange(R), 0):
        ev_d, q_d = divide_linear(coeffs, x)
        ev_s, q_s = divide_linear_stream(_hv(vals), x, block_size=8)
        assert ev_s == ev_d
        assert (q_s.limbs == jnp.asarray(q_d)).all()


def test_commit_folding_matches_dense(keys):
    from gemini_tpu.subprotocols.tensorcheck import foldings_polynomial

    ck, _ = keys
    cks = CommitterKeyStream(ck, max_msm_buffer=16)
    vals = [rnd.randrange(R) for _ in range(45)]  # odd at several levels
    coeffs = jnp.asarray(FR.encode(vals))
    challenges = [rnd.randrange(R) for _ in range(6)]
    dense_folds = foldings_polynomial(coeffs, challenges)
    dense_cms = ck.batch_commit(dense_folds)
    cms, folds = cks.commit_folding(_hv(vals), challenges)
    assert cms == dense_cms
    assert len(folds) == len(dense_folds)
    for hvf, df in zip(folds, dense_folds):
        assert (hvf.limbs == jnp.asarray(df)).all()


def test_streaming_multipoint_open_matches_dense(keys):
    ck, _ = keys
    cks = CommitterKeyStream(ck, max_msm_buffer=16)
    polys = [[rnd.randrange(R) for _ in range(n)] for n in (40, 23, 7)]
    dense = [jnp.asarray(FR.encode(p)) for p in polys]
    pts = [rnd.randrange(R) for _ in range(3)]
    chal = rnd.randrange(R)
    prf_d = ck.batch_open_multi_points(dense, pts, chal)
    prf_s = cks.batch_open_multi_points([_hv(p) for p in polys], pts, chal)
    assert prf_s == prf_d


def test_streaming_tensorcheck_matches_dense(keys):
    from gemini_tpu.subprotocols.tensorcheck import TensorcheckProof
    from gemini_tpu.streaming import tensorcheck as tc_stream
    from gemini_tpu.transcript import GeminiTranscript

    ck, _ = keys
    cks = CommitterKeyStream(ck, max_msm_buffer=16)
    base = [rnd.randrange(R) for _ in range(21)]
    f = [rnd.randrange(R) for _ in range(48)]
    g = [rnd.randrange(R) for _ in range(48)]
    chs = [rnd.randrange(R) for _ in range(6)]
    t1 = GeminiTranscript(b"tc-test")
    dense = TensorcheckProof.new_time(
        t1, ck, [jnp.asarray(FR.encode(base))],
        [((jnp.asarray(FR.encode(f)), jnp.asarray(FR.encode(g))), chs)],
    )
    t2 = GeminiTranscript(b"tc-test")
    space = tc_stream.new_space(
        t2, cks, [_hv(base)], [((_hv(f), _hv(g)), chs)]
    )
    assert dense == space
    assert t1.get_challenge(b"post") == t2.get_challenge(b"post")


def test_hv_accumulated_product_matches_dense():
    from gemini_tpu.streaming import hv_accumulated_product
    from gemini_tpu.subprotocols.entry_product import accumulated_product

    vals = [rnd.randrange(R) for _ in range(37)]
    dense = accumulated_product(jnp.asarray(FR.encode(vals)))
    stream = hv_accumulated_product(_hv(vals), block_size=8)
    assert (stream.limbs == jnp.asarray(dense)).all()


def test_dummy_stream_snark_matches_dense_and_verifies(keys):
    """Giant-instance machinery at test scale: the O(1)-memory
    DummyR1csStream + τ=1 FakeCommitterKeyStream (examples/snark.rs:
    55-67, iterable/dummy.rs:220-238 analogues) must produce the same
    proof as the dense dummy relation over a real SRS stream with the
    same trapdoor, and the proof must verify under the τ=1 key."""
    from gemini_tpu.kzg.commit import CommitterKey
    from gemini_tpu.relation.stream import DummyR1csStream
    from gemini_tpu.streaming import FakeCommitterKeyStream

    n = 32
    ds = DummyR1csStream(n, e=0xABCDE)
    fake = FakeCommitterKeyStream(max_eval_points=3, seed=7,
                                  max_msm_buffer=16)
    pe = Proof.new_elastic(ds, fake, block_size=8, threshold=2)

    # Dense twin: real CommitterKey with tau=1 and the same generators.
    dense_r1cs = ds.to_dense()
    ck1 = CommitterKey.new(max_degree=n, max_eval_points=3, seed=7, tau=1)
    pt = Proof.new_time(dense_r1cs, ck1)
    assert pt.witness_commitment == pe.witness_commitment
    assert pt.zc_alpha == pe.zc_alpha
    assert pt.first_sumcheck_msgs == pe.first_sumcheck_msgs
    assert pt.second_sumcheck_msgs == pe.second_sumcheck_msgs
    assert pt.tensorcheck_proof == pe.tensorcheck_proof

    pe.verify(dense_r1cs, fake.verifier_key())


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


def test_host_r1cs_stream_snark_matches_dense(keys):
    """HostR1csStream (host-RAM COO, block-streamed matvec/rmatvec,
    circuit.rs:26-40 R1csStream + snark/streams.rs MatrixTensor
    analogue): elastic proof bit-identical to the dense-relation one."""
    from gemini_tpu.relation import random_r1cs
    from gemini_tpu.relation.stream import HostR1csStream

    ck, vk = keys
    r1cs = random_r1cs(random.Random(31), 16, row_nnz=2)
    cks = CommitterKeyStream(ck, max_msm_buffer=8)
    dense_proof = Proof.new_elastic(r1cs, cks, block_size=8, threshold=2)
    hs = HostR1csStream.from_r1cs(r1cs, block_size=8)
    host_proof = Proof.new_elastic(hs, cks, block_size=8, threshold=2)
    assert dense_proof == host_proof
    host_proof.verify(r1cs, vk)
