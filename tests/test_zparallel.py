"""Single-chip vs multi-chip consistency — the TPU rebirth of the
reference's time/space transcript-equality idiom (SURVEY.md §4): the
sharded prover must emit bit-identical round messages.

Named test_Zparallel so these 8-virtual-device mesh tests run LAST:
with them mid-suite, a jaxlib bug segfaulted the next module's
persistent-cache read deterministically (compilation_cache
get_executable_and_time; see CLAUDE.md).  Every module passes alone;
only this global ordering interaction is affected."""

import random

import jax
import jax.numpy as jnp
import pytest

from gemini_tpu.params import R
from gemini_tpu.fields.fp import FR
from gemini_tpu.parallel import default_mesh, ShardedTimeProver
from gemini_tpu.subprotocols.sumcheck import Sumcheck, TimeProver
from gemini_tpu.transcript import GeminiTranscript

rnd = random.Random(23)


@pytest.mark.parametrize("n", [64, 96])
def test_sharded_sumcheck_matches_dense(n):
    mesh = default_mesh(8)
    f = [rnd.randrange(R) for _ in range(n)]
    g = [rnd.randrange(R) for _ in range(n)]
    twist = rnd.randrange(R)
    fd = jnp.asarray(FR.encode(f))
    gd = jnp.asarray(FR.encode(g))

    t1 = GeminiTranscript(b"GEMINI-v0")
    dense = Sumcheck.prove(t1, TimeProver(fd, gd, twist))
    t2 = GeminiTranscript(b"GEMINI-v0")
    sharded = Sumcheck.prove(t2, ShardedTimeProver(mesh, fd, gd, twist))

    assert dense.messages == sharded.messages
    assert dense.challenges == sharded.challenges
    assert dense.final_foldings == sharded.final_foldings


def test_snark_mesh_proof_equals_single():
    """mesh= on the L5 time prover: 8-virtual-device proof ==
    single-device proof (VERDICT round-1 item 7)."""
    from gemini_tpu.kzg.commit import CommitterKey, VerifierKey
    from gemini_tpu.relation import dummy_r1cs
    from gemini_tpu.snark import Proof

    n = 32
    r1cs = dummy_r1cs(random.Random(4), n)
    ck = CommitterKey.new(max_degree=n, max_eval_points=3, seed=9)
    vk = VerifierKey.from_committer_key(ck)
    single = Proof.new_time(r1cs, ck)
    meshed = Proof.new_time(r1cs, ck, mesh=default_mesh(8))
    assert single == meshed
    meshed.verify(r1cs, vk)


def test_psnark_mesh_proof_equals_single():
    from gemini_tpu.kzg.commit import CommitterKey, VerifierKey
    from gemini_tpu.psnark import Proof, index
    from gemini_tpu.relation import random_r1cs
    from gemini_tpu.relation.r1cs import joint_matrices

    r1 = random_r1cs(random.Random(6), 8, row_nnz=2)
    jm = joint_matrices(r1)
    ck = CommitterKey.new(
        max_degree=8 + jm.num_non_zero + 8, max_eval_points=3, seed=11)
    vk = VerifierKey.from_committer_key(ck)
    idx = index(ck, r1)
    single = Proof.new_time(ck, r1, idx)
    meshed = Proof.new_time(ck, r1, idx, mesh=default_mesh(8))
    assert single == meshed
    meshed.verify(r1, vk, idx, jm.num_non_zero)


def test_msm_multichip_matches_single():
    """Data-parallel MSM over 8 virtual devices == single-device MSM
    == host oracle."""
    import jax.numpy as jnp
    from gemini_tpu.fields.fp import FR
    from gemini_tpu.curve import g1 as g1_mod
    from gemini_tpu.ops.msm import msm
    from gemini_tpu.parallel.msm import msm_multichip
    from gemini_tpu.refimpl import g1_generator, g1_mul, g1_msm

    G = g1_generator()
    n = 50
    pts = [g1_mul(G, rnd.randrange(1, R)) for _ in range(n)]
    ks = [rnd.randrange(R) for _ in range(n)]
    ap = g1_mod.encode_affine(pts)
    sc = jnp.asarray(FR.encode(ks, mont=False))
    multi = g1_mod.decode_jacobian(msm_multichip(ap, sc))[0]
    single = g1_mod.decode_jacobian(msm(ap, sc))[0]
    assert multi == single == g1_msm(pts, ks)


def test_dryrun_multichip_wallclock():
    """The driver's multi-chip gate must stay fast: one SPMD compile
    for the shard_map MSM (the round-3 per-device-executable variant
    took ~15 min of XLA CPU compile and timed out the driver,
    VERDICT r3 weak 1).  Bound is generous — warm-cache runs take
    seconds, a cold in-suite run ~1.5 min."""
    import os
    import sys
    import time

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__

    t0 = time.time()
    __graft_entry__.dryrun_multichip(8)
    elapsed = time.time() - t0
    assert elapsed < 420, f"dryrun_multichip(8) took {elapsed:.0f}s"


def test_streaming_committer_mesh_matches():
    """CommitterKeyStream with mesh= (multi-chip partial MSMs) produces
    identical commitments AND an identical elastic SNARK proof
    (VERDICT r3 item 8)."""
    import jax.numpy as jnp
    from gemini_tpu.kzg.commit import CommitterKey, VerifierKey
    from gemini_tpu.relation import dummy_r1cs
    from gemini_tpu.snark import Proof
    from gemini_tpu.streaming import CommitterKeyStream
    from gemini_tpu.streaming.host import HostVector
    from gemini_tpu.fields.fp import FR

    n = 32
    ck = CommitterKey.new(max_degree=n, max_eval_points=3, seed=3)
    coeffs = [rnd.randrange(R) for _ in range(n)]
    hv = HostVector.from_ints(coeffs)
    plain = CommitterKeyStream(ck, max_msm_buffer=8)
    meshed = CommitterKeyStream(ck, max_msm_buffer=8, mesh=default_mesh(8))
    assert plain.commit(hv) == meshed.commit(hv)
    x = rnd.randrange(R)
    ev1, pr1 = plain.open(hv, x)
    ev2, pr2 = meshed.open(hv, x)
    assert (ev1, pr1) == (ev2, pr2)

    r1cs = dummy_r1cs(random.Random(8), n)
    vk = VerifierKey.from_committer_key(ck)
    pe_plain = Proof.new_elastic(r1cs, plain)
    pe_mesh = Proof.new_elastic(r1cs, meshed)
    assert pe_plain == pe_mesh
    pe_mesh.verify(r1cs, vk)


def test_msm_batch_multichip_matches_single():
    """Fold-tree-shaped batch commit over the mesh: msm_batch_multichip
    (stacked windows, SPMD shard_map) must equal the single-chip
    msm_batch results point for point (VERDICT r4 weak 8)."""
    import random

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gemini_tpu.curve import g1
    from gemini_tpu.fields.fp import FR
    from gemini_tpu.ops.msm import msm_batch
    from gemini_tpu.parallel.msm import msm_batch_multichip
    from gemini_tpu.params import R
    from gemini_tpu.refimpl import g1_generator, g1_mul

    rnd = random.Random(33)
    n = 64
    pts = [g1_mul(g1_generator(), rnd.randrange(1, R)) for _ in range(n)]
    ap = g1.encode_affine(pts)
    # halving prefix lengths, the fold-tree commit shape
    from gemini_tpu.fields import fp

    sets = []
    for m in (64, 32, 16, 8):
        enc = jnp.asarray(FR.encode([rnd.randrange(R) for _ in range(m)]))
        sets.append(fp.from_mont(FR, enc))  # canonical limbs
    import os

    os.environ["GEMINI_TPU_HOST_MSM_MAX"] = "0"
    try:
        single = msm_batch(ap, sets)
        multi = msm_batch_multichip(ap, sets, devices=jax.devices()[:4])
    finally:
        os.environ.pop("GEMINI_TPU_HOST_MSM_MAX", None)
    for s, m in zip(single, multi):
        assert g1.decode_jacobian(s)[0] == g1.decode_jacobian(m)[0]
