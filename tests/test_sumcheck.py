"""Sumcheck: TPU prover vs a host-int oracle prover (the analogue of
the reference's time/space transcript-equality idiom,
sumcheck/tests.rs:42-138), plus verifier subclaim round-trips."""

import random

import jax.numpy as jnp
import pytest

from gemini_tpu.params import R
from gemini_tpu.fields.fp import FR
from gemini_tpu.subprotocols.sumcheck import (
    Subclaim, Sumcheck, TimeProver, VerificationError, required_rounds,
)
from gemini_tpu.transcript import GeminiTranscript

rnd = random.Random(21)


# -- host oracle prover (int arithmetic, mirrors time_prover.rs) -----------


class OracleProver:
    def __init__(self, f, g, twist):
        self.f, self.g, self.twist = list(f), list(g), twist % R
        self.tot_rounds = required_rounds(max(len(f), len(g)))
        self.round = 0

    def rounds(self):
        return self.tot_rounds

    def _fold(self, v, r):
        out = []
        for k in range(0, len(v), 2):
            odd = v[k + 1] if k + 1 < len(v) else 0
            out.append((v[k] + r * odd) % R)
        return out

    def fold(self, r):
        self.f = self._fold(self.f, r * self.twist % R)
        self.g = self._fold(self.g, r)
        self.twist = self.twist * self.twist % R

    def next_message(self, challenge):
        if challenge is not None:
            self.fold(challenge)
        if self.round == self.tot_rounds:
            return None
        a = b = 0
        tw2 = self.twist * self.twist % R
        runner = 1
        for k in range(0, min(len(self.f), len(self.g)), 2):
            fe, ge = self.f[k], self.g[k]
            fo = self.f[k + 1] if k + 1 < len(self.f) else 0
            go = self.g[k + 1] if k + 1 < len(self.g) else 0
            a = (a + fe * ge % R * runner) % R
            b = (b + (fe * go + ge * fo % R * self.twist) % R * runner) % R
            runner = runner * tw2 % R
        self.round += 1
        return (a, b)

    def final_foldings(self):
        if self.round != self.tot_rounds:
            return None
        return (self.f[0], self.g[0] if self.g else 0)


def _twisted_ip(f, g, twist):
    s, t = 0, 1
    for i in range(max(len(f), len(g))):
        fi = f[i] if i < len(f) else 0
        gi = g[i] if i < len(g) else 0
        s = (s + fi * t % R * gi) % R
        t = t * twist % R
    return s


def _device(v):
    return jnp.asarray(FR.encode(v))


@pytest.mark.parametrize("nf,ng", [(8, 8), (5, 7), (16, 2), (1, 1)])
def test_time_prover_matches_oracle(nf, ng):
    f = [rnd.randrange(R) for _ in range(nf)]
    g = [rnd.randrange(R) for _ in range(ng)]
    twist = rnd.randrange(R)
    t1 = GeminiTranscript(b"GEMINI-v0")
    t2 = GeminiTranscript(b"GEMINI-v0")
    dev = Sumcheck.prove(t1, TimeProver(_device(f), _device(g), twist))
    ora = Sumcheck.prove(t2, OracleProver(f, g, twist))
    assert dev.messages == ora.messages
    assert dev.challenges == ora.challenges
    assert dev.final_foldings == ora.final_foldings


def test_prove_then_verify_subclaim():
    f = [rnd.randrange(R) for _ in range(8)]
    g = [rnd.randrange(R) for _ in range(8)]
    twist = rnd.randrange(R)
    asserted = _twisted_ip(f, g, twist)
    tp = GeminiTranscript(b"GEMINI-v0")
    proof = Sumcheck.prove(tp, TimeProver(_device(f), _device(g), twist))
    tv = GeminiTranscript(b"GEMINI-v0")
    sub = Subclaim.new(tv, proof.messages, proof.final_foldings, asserted)
    assert sub.challenges == proof.challenges
    # tampered claim must fail
    tv2 = GeminiTranscript(b"GEMINI-v0")
    with pytest.raises(VerificationError):
        Subclaim.new(tv2, proof.messages, proof.final_foldings,
                     (asserted + 1) % R)


def test_batch_prove_verify_mixed_sizes():
    sizes = [(8, 8), (4, 4), (2, 2)]
    instances = []
    for nf, ng in sizes:
        f = [rnd.randrange(R) for _ in range(nf)]
        g = [rnd.randrange(R) for _ in range(ng)]
        tw = rnd.randrange(R)
        instances.append((f, g, tw))
    asserted = [_twisted_ip(f, g, tw) for f, g, tw in instances]

    tp = GeminiTranscript(b"GEMINI-v0")
    provers = [
        TimeProver(_device(f), _device(g), tw) for f, g, tw in instances
    ]
    proof = Sumcheck.prove_batch(tp, provers)
    assert proof.rounds == 3 + 1

    tv = GeminiTranscript(b"GEMINI-v0")
    sub = Subclaim.new_batch(tv, proof.messages, proof.final_foldings, asserted)
    assert sub.challenges == proof.challenges

    tv2 = GeminiTranscript(b"GEMINI-v0")
    bad = [asserted[0], (asserted[1] + 1) % R, asserted[2]]
    with pytest.raises(VerificationError):
        Subclaim.new_batch(tv2, proof.messages, proof.final_foldings, bad)


def test_batch_matches_oracle_batch():
    instances = []
    for nf in (8, 2):
        f = [rnd.randrange(R) for _ in range(nf)]
        g = [rnd.randrange(R) for _ in range(nf)]
        instances.append((f, g, rnd.randrange(R)))
    t1 = GeminiTranscript(b"GEMINI-v0")
    t2 = GeminiTranscript(b"GEMINI-v0")
    dev = Sumcheck.prove_batch(
        t1, [TimeProver(_device(f), _device(g), tw) for f, g, tw in instances]
    )
    ora = Sumcheck.prove_batch(
        t2, [OracleProver(f, g, tw) for f, g, tw in instances]
    )
    assert dev.messages == ora.messages
    assert dev.final_foldings == ora.final_foldings


def test_round_message_tiled_matches_untiled(monkeypatch):
    """The lax.map tiling of the round-message kernel (SC_TILE) must
    not change results; force multi-tile on a small instance."""
    import jax.numpy as jnp
    from gemini_tpu.subprotocols import sumcheck as sc
    from gemini_tpu.ops import poly as poly_mod
    import random as _r

    rnd2 = _r.Random(99)
    n = 64
    f = jnp.asarray(FR.encode([rnd2.randrange(R) for _ in range(n)]))
    g = jnp.asarray(FR.encode([rnd2.randrange(R) for _ in range(n)]))
    tp = poly_mod.powers(FR, 777 * 777 % R, n // 2)
    tw = poly_mod.scalar(FR, 777)
    a0, b0 = sc._round_message_kernel(f, g, tp, tw)
    # bypass the jit cache so the patched tile size takes effect
    monkeypatch.setattr(sc, "SC_TILE", 8)
    a1, b1 = sc._round_message_kernel.__wrapped__(f, g, tp, tw)
    assert FR.decode_relaxed(jnp.asarray(a0)[:, None]) == \
        FR.decode_relaxed(jnp.asarray(a1)[:, None])
    assert FR.decode_relaxed(jnp.asarray(b0)[:, None]) == \
        FR.decode_relaxed(jnp.asarray(b1)[:, None])
