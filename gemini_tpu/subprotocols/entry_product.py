"""Entry (grand) product argument (subprotocols/entryproduct).

Reduces ∏ f = t to the twisted sumcheck
    ⟨g ∘ y, rrot(monic(f))⟩ = ψ·g(ψ) + t − ψ^N
with g the suffix-product accumulator of monic(f) and y = (1, ψ, ...)
(mod.rs:7-23).

TPU mapping: the suffix products become a reverse multiplicative scan
(ops/scan.py — log-depth, one cached Fr-mul kernel per level); monic /
right-rotation are single concatenations; everything stays on device
until the accumulator commitment (one MSM).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..fields import fp
from ..fields.fp import FR
from ..kzg.commit import CommitterKey
from ..ops import poly, scan
from ..params import R
from ..serialize import G1Msg
from ..subprotocols.sumcheck import TimeProver
from ..transcript import GeminiTranscript

G1Host = Optional[Tuple[int, int]]

_fr_mul_jit = jax.jit(lambda a, b: fp.mont_mul(FR, a, b))


def monic(v: jnp.ndarray) -> jnp.ndarray:
    """f(x) + x^N: append a trailing 1 (time_prover.rs:47-53)."""
    return jnp.concatenate([v, FR.ones_mont((1,))], axis=1)


def right_rotation(v: jnp.ndarray) -> jnp.ndarray:
    """(f_{n-1}, f_0, ..., f_{n-2}) (time_prover.rs:15-24)."""
    return jnp.concatenate([v[:, -1:], v[:, :-1]], axis=1)


def accumulated_product(v: jnp.ndarray) -> jnp.ndarray:
    """Suffix products acc[i] = prod_{j >= i} v[j]
    (time_prover.rs:34-44) via a reverse multiplicative scan."""
    n = v.shape[1]
    npad = scan.next_pow2(n)
    if npad != n:  # pad the tail with ones: suffix products unchanged
        v = jnp.concatenate([v, FR.ones_mont((npad - n,))], axis=1)
    out = scan.inclusive_scan(_fr_mul_jit, v, axis=1, reverse=True)
    return out[:, :n]


@dataclass
class ProverMsgs:
    """entryproduct ProverMsgs: the claimed product t itself is never
    added to the transcript (upper protocol layer's responsibility, mod.rs:41-47)."""

    acc_v_commitments: List[G1Host]
    claimed_sumchecks: List[int]


@dataclass
class EntryProduct:
    msgs: ProverMsgs
    chal: int
    provers: List[TimeProver]
    acc_vs: List[jnp.ndarray]  # unpadded accumulators (committed form)

    @staticmethod
    def new_time(transcript: GeminiTranscript, ck: CommitterKey,
                 v: jnp.ndarray, claimed_product: int) -> "EntryProduct":
        return EntryProduct.new_time_batch(
            transcript, ck, [v], [claimed_product]
        )

    @staticmethod
    def new_time_batch(transcript: GeminiTranscript, ck: CommitterKey,
                       vs: Sequence[jnp.ndarray],
                       claimed_products: Sequence[int]) -> "EntryProduct":
        """time_prover.rs:61-117."""
        assert len(vs) == len(claimed_products)
        monic_vs = [monic(v) for v in vs]
        rrot_vs = [right_rotation(m) for m in monic_vs]
        acc_vs = [accumulated_product(m) for m in monic_vs]
        acc_v_commitments = ck.batch_commit(acc_vs)
        for cm in acc_v_commitments:
            transcript.append_serializable(b"acc_v", G1Msg(cm))
        chal = transcript.get_challenge(b"ep-chal")

        provers = [
            TimeProver(acc_v, rrot_v, chal)
            for acc_v, rrot_v in zip(acc_vs, rrot_vs)
        ]
        claimed_sumchecks = []
        for cp, acc_v in zip(claimed_products, acc_vs):
            acc_v_chal = poly.evaluate_le(FR, acc_v, chal)
            chal_n = pow(chal, acc_v.shape[1], R)
            claimed_sumchecks.append(
                (acc_v_chal * chal + cp - chal_n) % R
            )
        return EntryProduct(
            msgs=ProverMsgs(acc_v_commitments, claimed_sumchecks),
            chal=chal,
            provers=provers,
            acc_vs=acc_vs,
        )

    @staticmethod
    def new_elastic_batch(transcript: GeminiTranscript, ck_stream,
                          vs: Sequence, claimed_products: Sequence[int],
                          block_size: int = 1 << 20,
                          threshold: int | None = None) -> "EntryProduct":
        """Streaming flavour over HostVectors
        (entryproduct/elastic_prover.rs:68-135 `new_elastic_batch`):
        accumulators via block-stitched suffix-product scans
        (ProductStream analogue), commitments through bounded MSM
        buffers, sumcheck provers elastic.  Transcript-identical to
        `new_time_batch` (tested); `acc_vs` are HostVectors."""
        from .. import SPACE_TIME_THRESHOLD
        from ..streaming import ElasticProver
        from ..streaming.ops import (
            hv_accumulated_product, hv_evaluate, hv_monic,
            hv_right_rotation,
        )

        if threshold is None:
            threshold = SPACE_TIME_THRESHOLD
        assert len(vs) == len(claimed_products)
        monic_vs = [hv_monic(v) for v in vs]
        rrot_vs = [hv_right_rotation(m) for m in monic_vs]
        acc_vs = [hv_accumulated_product(m, block_size) for m in monic_vs]
        acc_v_commitments = [ck_stream.commit(a) for a in acc_vs]
        for cm in acc_v_commitments:
            transcript.append_serializable(b"acc_v", G1Msg(cm))
        chal = transcript.get_challenge(b"ep-chal")

        provers = [
            ElasticProver(acc_v, rrot_v, chal, block_size, threshold)
            for acc_v, rrot_v in zip(acc_vs, rrot_vs)
        ]
        claimed_sumchecks = []
        for cp, acc_v in zip(claimed_products, acc_vs):
            acc_v_chal = hv_evaluate(acc_v, chal, block_size)
            chal_n = pow(chal, len(acc_v), R)
            claimed_sumchecks.append((acc_v_chal * chal + cp - chal_n) % R)
        return EntryProduct(
            msgs=ProverMsgs(acc_v_commitments, claimed_sumchecks),
            chal=chal,
            provers=provers,
            acc_vs=acc_vs,
        )
