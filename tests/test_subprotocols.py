"""Entry-product and plookup gates (entryproduct/tests.rs,
plookup/time_prover.rs:115-148 analogues)."""

import random

import jax.numpy as jnp
import numpy as np

from gemini_tpu.params import R
from gemini_tpu.fields import fp
from gemini_tpu.fields.fp import FR
from gemini_tpu.kzg.commit import CommitterKey
from gemini_tpu.ops import poly
from gemini_tpu.subprotocols import entry_product as ep
from gemini_tpu.subprotocols import plookup as pl
from gemini_tpu.subprotocols.sumcheck import Sumcheck, Subclaim
from gemini_tpu.transcript import GeminiTranscript

rnd = random.Random(31)


def _enc(vals):
    return jnp.asarray(FR.encode(vals))


def test_accumulated_product_matches_host():
    vals = [rnd.randrange(1, R) for _ in range(13)]
    acc = ep.accumulated_product(_enc(vals))
    expect = []
    run = 1
    for v in reversed(vals):
        run = run * v % R
        expect.append(run)
    expect.reverse()
    assert FR.decode(acc) == expect


def test_entry_product_end_to_end():
    n = 15
    vals = [rnd.randrange(1, R) for _ in range(n)]
    t = 1
    for v in vals:
        t = t * v % R
    ck = CommitterKey.new(max_degree=31, max_eval_points=3, seed=3)
    tr = GeminiTranscript(b"GEMINI-v0")
    epr = ep.EntryProduct.new_time(tr, ck, _enc(vals), t)
    # run the sumcheck the argument reduced to and check the claimed
    # value equals the actual twisted inner product.
    prover = epr.provers[0]
    f0 = prover.f
    g0 = prover.g
    got = 0
    fv = FR.decode(f0)
    gv = FR.decode(g0)
    psi = epr.chal
    for i, (a, b) in enumerate(zip(fv, gv)):
        got = (got + a * b % R * pow(psi, i, R)) % R
    assert got == epr.msgs.claimed_sumchecks[0]
    sc = Sumcheck.prove(tr, prover)
    tr2 = GeminiTranscript(b"GEMINI-v0")
    # reproduce the transcript prefix: commitment + challenge
    from gemini_tpu.serialize import G1Msg
    tr2.append_serializable(b"acc_v", G1Msg(epr.msgs.acc_v_commitments[0]))
    chal2 = tr2.get_challenge(b"ep-chal")
    assert chal2 == epr.chal
    Subclaim.new(tr2, sc.messages, sc.final_foldings,
                 epr.msgs.claimed_sumchecks[0])


def test_plookup_product_relation():
    set_vals = [10, 12, 13, 14, 15, 42]
    subset_vals = [10, 13, 15, 42]
    indices = [0, 2, 4, 5]
    y, z = 47, 52
    vecs = pl.plookup(_enc(subset_vals), _enc(set_vals), indices, y, z, 0)
    prods = []
    for v in vecs:
        p = 1
        for x in FR.decode(v):
            p = p * x % R
        prods.append(p)
    lhs = prods[2]
    rhs = prods[0] * prods[1] % R * pow(1 + z, len(subset_vals), R) % R
    assert lhs == rhs


def test_plookup_with_alg_hash_relation():
    set_vals = [rnd.randrange(R) for _ in range(8)]
    indices = [1, 3, 3, 6]
    subset_vals = [set_vals[i] for i in indices]
    y, z, zeta = rnd.randrange(R), rnd.randrange(R), rnd.randrange(R)
    vecs = pl.plookup(
        _enc(subset_vals), _enc(set_vals), indices, y, z, zeta
    )
    prods = []
    for v in vecs:
        p = 1
        for x in FR.decode(v):
            p = p * x % R
        prods.append(p)
    assert prods[2] == prods[0] * prods[1] % R * pow(
        1 + z, len(subset_vals), R) % R
