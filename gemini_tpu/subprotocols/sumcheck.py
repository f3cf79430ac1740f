"""Twisted scalar-product sumcheck (subprotocols/sumcheck analogue).

Protocol (reference mod.rs:1-12): reduce the claim
    < f ∘ (1, a, a^2, ...), g > = u
to claims about f, g via log(N) rounds.  Round messages are the two
low coefficients (a, b) of the quadratic partial-sum polynomial; the
verifier reconstructs c = claim - a (subclaim.rs:91-94).

TPU redesign vs the reference:
  * The time prover's per-round loops (time_prover.rs:96-122) become
    (L, N) limb-vector ops: elementwise Montgomery products of the
    even/odd coefficient planes against a maintained vector of twist
    powers, then a deferred-carry lane reduction.  Per round: ~6
    vector muls on N/2 lanes; total 6N muls over the whole protocol.
  * The twist-power vector T_k = twist^(2k) is maintained across
    rounds: after folding, twist' = twist^2 needs T'_k = twist^(4k)
    = T_(2k) — a subsample of the even positions, no per-round scan.
  * Host <-> device traffic is two scalars down / one challenge up per
    round (Fiat-Shamir forces this round trip in any implementation).
  * Inputs are zero-padded to 2^rounds up front, making every round a
    uniform halving; this is transcript-identical to the reference's
    ragged chunking (extra zero terms contribute nothing to (a, b) and
    fold to zero).

The space prover (re-streaming Iterables, space_prover.rs) has no
reason to exist on TPU: its job — peak-memory control — is done by
sharding the coefficient planes across chips and psum-ing (a, b)
(see parallel/), and by host-RAM offload for over-HBM instances.
`ElasticProver` is kept as the API name for the auto-switching entry.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import fp
from ..fields.fp import FR
from ..ops import poly
from ..ops import scan as scan_util
from ..params import R
from ..serialize import fr_to_bytes
from ..transcript import GeminiTranscript


def required_rounds(max_len: int) -> int:
    """ceil(log2(max_len)) with required_rounds(1) == 0 (ark_std::log2)."""
    if max_len <= 1:
        return 0
    return (max_len - 1).bit_length()


# Pairs per tile in the round-message kernel: keeps the Montgomery
# scan carry ((L+1) * lanes * 4 B) VMEM-resident — at 2^19+ lanes it
# spills to HBM and the round goes bandwidth-bound (PERF.md).
SC_TILE = 1 << 16


def _round_partials(f_e, f_o, g_e, g_o, t_pow, twist):
    a_vec = fp.mont_mul(FR, fp.mont_mul(FR, f_e, g_e), t_pow)
    cross = fp.add(
        FR,
        fp.mont_mul(FR, f_e, g_o),
        fp.mont_mul(FR, fp.mont_mul(FR, g_e, f_o), twist),
    )
    b_vec = fp.mont_mul(FR, cross, t_pow)
    a = fp.lane_sum(FR, a_vec, axis=1)
    b = fp.lane_sum(FR, b_vec, axis=1)
    return a, b


@partial(jax.jit, static_argnums=())
def _round_message_kernel(f, g, t_pow, twist):
    """(a, b) relaxed limb columns for the current round.

    a = sum_k f[2k] g[2k] T_k
    b = sum_k (f[2k] g[2k+1] + g[2k] f[2k+1] twist) T_k

    Large rounds run as a lax.map over SC_TILE-pair tiles (zero padding
    contributes nothing); per-tile relaxed sums are summed at the end
    (tile counts < 2^6 leave ample uint32 headroom).
    """
    f_e, f_o = poly.eo_split(f)
    g_e, g_o = poly.eo_split(g)
    m = f_e.shape[1]
    if m <= SC_TILE:
        return _round_partials(f_e, f_o, g_e, g_o, t_pow, twist)

    L = f.shape[0]
    t = -(-m // SC_TILE)
    npad = t * SC_TILE

    def tiled(x):
        if npad != m:
            x = jnp.concatenate(
                [x, jnp.zeros((L, npad - m), jnp.uint32)], axis=1
            )
        return x.reshape(L, t, SC_TILE).transpose(1, 0, 2)

    xs = tuple(tiled(v) for v in (f_e, f_o, g_e, g_o, t_pow))

    def body(args):
        return _round_partials(*args, twist)

    parts_a, parts_b = jax.lax.map(body, xs)  # (T, L+2)
    return (
        jnp.sum(parts_a, axis=0, dtype=jnp.uint32),
        jnp.sum(parts_b, axis=0, dtype=jnp.uint32),
    )


def _fused_round_body(f, g, t_pow, r, r_twist, twist_next, b_out: int):
    """Fold + next round message as ONE dispatch (the per-round
    Fiat-Shamir hot path: one kernel down, one (2, L+2) readback up —
    VERDICT round-1 item 10; the ~9 ms tunnel round trip dominated
    2^20 sumchecks when fold and message were separate transfers)."""
    f2, g2, t2 = _fold_kernel(f, g, t_pow, r, r_twist, b_out)
    a, b = _round_message_kernel(f2, g2, t2, twist_next)
    return f2, g2, t2, jnp.stack([a, b])


_fused_round_kernel = jax.jit(_fused_round_body, static_argnums=(6,))

# Disk trace cache (utils/xjit.py): Python re-tracing of the sumcheck
# kernels per pow-4 shape bucket was the dominant *warm* prover cost
# once the MSM pipeline got its export cache (PERF.md round-3 record:
# warm 2^14 SNARK 348 s, mostly re-tracing of non-MSM stages).  Per
# (shape, b_out) instance the fused round is exported ONCE to disk as
# StableHLO and deserialized by later processes.
_XJIT_MEM: dict = {}


def _xjit_mods():
    import sys as _sys

    from ..ops import scan as _scan

    return (_sys.modules[__name__], fp, poly, _scan)


def _fused_round_cached(f, g, t_pow, r, r_twist, twist_next, b_out: int):
    from ..utils import xjit

    fn = _XJIT_MEM.get(("fused", b_out))
    if fn is None:
        fn = jax.jit(
            lambda a1, a2, a3, a4, a5, a6: _fused_round_body(
                a1, a2, a3, a4, a5, a6, b_out
            )
        )
        _XJIT_MEM[("fused", b_out)] = fn
    return xjit.export_cached(
        "sc_fused", fn, _xjit_mods(), f, g, t_pow, r, r_twist, twist_next,
        statics=(b_out,),
    )


def _round_message_cached(f, g, t_pow, twist):
    from ..utils import xjit

    return xjit.export_cached(
        "sc_msg", _round_message_kernel, _xjit_mods(), f, g, t_pow, twist
    )


def _fold_cached(f, g, t_pow, r, r_twist, b_out: int):
    from ..utils import xjit

    fn = _XJIT_MEM.get(("fold", b_out))
    if fn is None:
        fn = jax.jit(
            lambda a1, a2, a3, a4, a5: _fold_kernel(a1, a2, a3, a4, a5, b_out)
        )
        _XJIT_MEM[("fold", b_out)] = fn
    return xjit.export_cached(
        "sc_fold", fn, _xjit_mods(), f, g, t_pow, r, r_twist,
        statics=(b_out,),
    )


@partial(jax.jit, static_argnums=(5,))
def _fold_kernel(f, g, t_pow, r, r_twist, b_out: int):
    """Fold f, g and subsample the twist powers, re-quantizing the
    physical size to the `b_out` bucket (zero tails are semantics-free;
    see ops/scan.py bucket4)."""
    f2 = poly.fold_polynomial(FR, f, r_twist)
    g2 = poly.fold_polynomial(FR, g, r)
    # T_k = twist^(2k); next round needs (twist^2)^(2k) = T_(2k):
    # subsample the even positions (no squaring).
    t2 = poly.eo_split(t_pow)[0]
    if f2.shape[1] > b_out:
        f2, g2, t2 = f2[:, :b_out], g2[:, :b_out], t2[:, : b_out // 2]
    elif f2.shape[1] < b_out:
        f2 = poly.pad_to(FR, f2, b_out)
        g2 = poly.pad_to(FR, g2, b_out)
        t2 = poly.pad_to(FR, t2, b_out // 2)
    return f2, g2, t2


class TimeProver:
    """Dense in-HBM prover for one twisted scalar product.

    Physical array sizes are quantized to power-of-4 buckets
    (ops/scan.py bucket4) so all provers in a protocol share a handful
    of compiled kernel shapes; `self.n` tracks the logical (protocol)
    length, which alone determines round count and messages."""

    def __init__(self, f, g, twist: int):
        n = 1 << required_rounds(max(f.shape[1], g.shape[1]))
        b = scan_util.bucket4(n)
        self.n = n
        self.f = poly.pad_to(FR, f, b)
        self.g = poly.pad_to(FR, g, b)
        self.twist = twist % R
        self.tot_rounds = required_rounds(n)
        self.round = 0
        # T_k = twist^(2k), k < b/2 (entries past the logical n/2 only
        # ever multiply the zero tail of f, g)
        self.t_pow = poly.powers(FR, self.twist * self.twist % R, b // 2)

    def rounds(self) -> int:
        return self.tot_rounds

    def fold(self, r: int) -> None:
        r_twist = poly.scalar(FR, r * self.twist % R)
        if self.n > 1:
            self.n //= 2
            self.f, self.g, self.t_pow = _fold_cached(
                self.f, self.g, self.t_pow, poly.scalar(FR, r), r_twist,
                scan_util.bucket4(self.n),
            )
        self.twist = self.twist * self.twist % R

    def round_arrays(self, challenge: Optional[int]):
        """Advance one round, returning the round message as a DEVICE
        (2, L+2) relaxed-limb array (None when rounds are exhausted).
        Callers that batch many provers read all messages back in one
        transfer (Sumcheck.prove_batch); `next_message` decodes inline.
        Fold + message run as one fused dispatch."""
        if challenge is not None:
            if self.n > 1 and self.round < self.tot_rounds:
                r_twist = poly.scalar(FR, challenge * self.twist % R)
                twist_next = self.twist * self.twist % R
                self.n //= 2
                self.f, self.g, self.t_pow, ab = _fused_round_cached(
                    self.f, self.g, self.t_pow,
                    poly.scalar(FR, challenge), r_twist,
                    poly.scalar(FR, twist_next),
                    scan_util.bucket4(self.n),
                )
                self.twist = twist_next
                self.round += 1
                return ab
            self.fold(challenge)  # terminal fold (no message follows)
        if self.round == self.tot_rounds:
            return None
        tw = poly.scalar(FR, self.twist)
        a, b = _round_message_cached(self.f, self.g, self.t_pow, tw)
        self.round += 1
        return jnp.stack([a, b])

    @staticmethod
    def decode_msg(ab) -> Tuple[int, int]:
        arr = np.asarray(ab)
        return (
            FR.decode_relaxed(arr[0][:, None])[0],
            FR.decode_relaxed(arr[1][:, None])[0],
        )

    def next_message(self, challenge: Optional[int]):
        ab = self.round_arrays(challenge)
        if ab is None:
            return None
        return TimeProver.decode_msg(ab)

    def final_foldings(self) -> Optional[Tuple[int, int]]:
        if self.round != self.tot_rounds:
            return None
        f0 = FR.decode(self.f[:, :1])[0]
        g0 = FR.decode(self.g[:, :1])[0]
        return (f0, g0)


def ElasticProver(f, g, twist: int, block_size: int = 1 << 20,
                  threshold: int | None = None):
    """Resource-adaptive prover entry (elastic_prover.rs:10-57
    analogue), consistent under BOTH public import paths: HostVector
    inputs run the streaming space prover with the dense switch under
    SPACE_TIME_THRESHOLD (streaming/sumcheck.py); device arrays run
    the dense TimeProver directly (already the fast path in HBM)."""
    from ..streaming.host import HostVector

    if isinstance(f, HostVector) or isinstance(g, HostVector):
        from .. import SPACE_TIME_THRESHOLD
        from ..streaming.sumcheck import ElasticProver as _StreamElastic

        if threshold is None:
            threshold = SPACE_TIME_THRESHOLD
        return _StreamElastic(f, g, twist, block_size, threshold)
    return TimeProver(f, g, twist)


def _append_round_msg(transcript: GeminiTranscript, msg: Tuple[int, int]):
    # RoundMsg derives CanonicalSerialize: a || b, 64 bytes
    # (prover.rs:10; appended at proof.rs:44).
    transcript.append_message(
        b"evaluations", fr_to_bytes(msg[0]) + fr_to_bytes(msg[1])
    )


@dataclass
class Sumcheck:
    """Transcript of a (possibly batched) sumcheck (proof.rs:20-29)."""

    messages: List[Tuple[int, int]]
    challenges: List[int]
    rounds: int
    final_foldings: List[Tuple[int, int]]

    @staticmethod
    def prove(transcript: GeminiTranscript, prover) -> "Sumcheck":
        messages: List[Tuple[int, int]] = []
        challenges: List[int] = []
        verifier_message = None
        while (message := prover.next_message(verifier_message)) is not None:
            _append_round_msg(transcript, message)
            challenge = transcript.get_challenge(b"challenge")
            verifier_message = challenge
            messages.append(message)
            challenges.append(challenge)
        final = prover.final_foldings()
        transcript.append_message(b"final-folding", fr_to_bytes(final[0]))
        transcript.append_message(b"final-folding", fr_to_bytes(final[1]))
        return Sumcheck(messages, challenges, prover.rounds(), [final])

    @staticmethod
    def prove_batch(transcript: GeminiTranscript, provers: Sequence) -> "Sumcheck":
        """Batched sumcheck over instances of different sizes
        (proof.rs:69-122): per-instance random coefficients, one extra
        round, finished instances contribute the constant f0*g0."""
        rounds = max(p.rounds() for p in provers) + 1
        coefficients = [
            transcript.get_challenge(b"batch-sumcheck") for _ in provers
        ]
        messages: List[Tuple[int, int]] = []
        challenges: List[int] = []
        verifier_message = None
        for _ in range(rounds):
            # Dispatch every prover's fused round first, then read all
            # messages back in ONE transfer — per-prover readbacks cost
            # a tunnel round trip each (13 provers in psnark sumcheck 3).
            raw: List = []
            for p in provers:
                if hasattr(p, "round_arrays"):
                    raw.append(p.round_arrays(verifier_message))
                else:
                    raw.append(p.next_message(verifier_message))
            dev_idx = [i for i, r in enumerate(raw)
                       if isinstance(r, jax.Array)]
            if dev_idx:
                got = jax.device_get([raw[i] for i in dev_idx])
                for i, arr in zip(dev_idx, got):
                    raw[i] = (
                        FR.decode_relaxed(np.asarray(arr[0])[:, None])[0],
                        FR.decode_relaxed(np.asarray(arr[1])[:, None])[0],
                    )
            msg_a, msg_b = 0, 0
            for p, c, m in zip(provers, coefficients, raw):
                if m is None:
                    ff = p.final_foldings()
                    m = (ff[0] * ff[1] % R, 0)
                msg_a = (msg_a + m[0] * c) % R
                msg_b = (msg_b + m[1] * c) % R
            message = (msg_a, msg_b)
            _append_round_msg(transcript, message)
            challenge = transcript.get_challenge(b"challenge")
            verifier_message = challenge
            messages.append(message)
            challenges.append(challenge)
        final_foldings = []
        for p in provers:
            ff = p.final_foldings()
            transcript.append_message(b"final-folding-lhs", fr_to_bytes(ff[0]))
            transcript.append_message(b"final-folding-rhs", fr_to_bytes(ff[1]))
            final_foldings.append(ff)
        return Sumcheck(messages, challenges, rounds, final_foldings)

    @staticmethod
    def new_time(transcript, f, g, twist: int) -> "Sumcheck":
        return Sumcheck.prove(transcript, TimeProver(f, g, twist))


class VerificationError(Exception):
    pass


@dataclass
class Subclaim:
    """Verifier-side claim reduction (subclaim.rs:13-18)."""

    challenges: List[int]
    final_foldings: List[Tuple[int, int]]

    @staticmethod
    def _reduce(transcript, messages, asserted_sum: int):
        reduced = asserted_sum % R
        challenges = []
        for (a, b) in messages:
            _append_round_msg(transcript, (a, b))
            r = transcript.get_challenge(b"challenge")
            challenges.append(r)
            c = (reduced - a) % R
            reduced = (a + r * b + c * r * r) % R
        return challenges, reduced

    @staticmethod
    def new(transcript, messages, final_foldings, asserted_sum: int) -> "Subclaim":
        challenges, reduced = Subclaim._reduce(transcript, messages, asserted_sum)
        ff = final_foldings[0]
        transcript.append_message(b"final-folding", fr_to_bytes(ff[0]))
        transcript.append_message(b"final-folding", fr_to_bytes(ff[1]))
        if ff[0] * ff[1] % R != reduced:
            raise VerificationError("sumcheck final folding mismatch")
        return Subclaim(challenges, list(final_foldings))

    @staticmethod
    def new_batch(transcript, messages, final_foldings,
                  asserted_sums: Sequence[int]) -> "Subclaim":
        coefficients = [
            transcript.get_challenge(b"batch-sumcheck") for _ in asserted_sums
        ]
        asserted = sum(c * s for c, s in zip(coefficients, asserted_sums)) % R
        challenges, reduced = Subclaim._reduce(transcript, messages, asserted)
        expected = 0
        for ff, c in zip(final_foldings, coefficients):
            transcript.append_message(b"final-folding-lhs", fr_to_bytes(ff[0]))
            transcript.append_message(b"final-folding-rhs", fr_to_bytes(ff[1]))
            expected = (expected + ff[0] * ff[1] % R * c) % R
        if expected != reduced:
            raise VerificationError("batched sumcheck final folding mismatch")
        return Subclaim(challenges, list(final_foldings))
