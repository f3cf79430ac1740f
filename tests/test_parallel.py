"""Single-chip vs multi-chip consistency — the TPU rebirth of the
reference's time/space transcript-equality idiom (SURVEY.md §4): the
sharded prover must emit bit-identical round messages."""

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
