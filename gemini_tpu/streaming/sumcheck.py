"""Space- and elastic-flavour sumcheck provers
(subprotocols/sumcheck/{space,elastic}_prover.rs analogues).

The reference's space prover re-streams every coefficient through a
`FoldedPolynomialStream` each round (O(1) state, O(N) work per round).
The TPU mapping: coefficients stay in HOST RAM (`HostVector`); each
round streams blocks into HBM and computes the current folding of a
block as one tensor contraction

    f^(j)[i] = Σ_b  w_f[b] · f[i·2^j + b],   w_f = ⊗_l (1, r_l·twist^(2^l))

(a reshape + broadcast-multiply + relaxed lane reduction — the fold
"stack automaton" of sumcheck/streams.rs:13-139 collapses into one
vectorized contraction).  Round messages are the same (a, b) partial
sums as the dense prover, accumulated across blocks on the host.

Per-round device memory: one block + the 2^j-entry weight tensor.
With the elastic switch at SPACE_TIME_THRESHOLD (lib.rs:76), j never
exceeds log2(N) - threshold, so weights stay tiny and the memory
profile matches the reference's log-space claim with HBM in place of
CPU RAM.

Transcript equality with the dense prover is exact and tested
(tests/test_streaming.py) — the rebirth of the reference's
time/space consistency idiom (SURVEY.md §4).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import SPACE_TIME_THRESHOLD
from ..fields import fp
from ..fields.fp import FR
from ..ops import poly
from ..params import R
from ..subprotocols.sumcheck import TimeProver, required_rounds
from .host import HostVector, to_device_limbs


def _fold_weights(challenges: List[int], twisted: bool, twist: int):
    """⊗_l (1, r_l) or ⊗_l (1, r_l · twist^(2^l)) as an (L, 2^j)
    device vector."""
    if twisted:
        tw = twist % R
        elems = []
        for r_l in challenges:
            elems.append(r_l * tw % R)
            tw = tw * tw % R
        return poly.tensor_device(FR, elems)
    return poly.tensor_device(FR, challenges)


def _fold_block(block: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """(L, B) base block -> (L, B / 2^j) folded values."""
    L, B = block.shape
    m = weights.shape[1]
    assert B % m == 0
    grouped = block.reshape(L, B // m, m)
    prods = fp.mont_mul(FR, grouped, weights[:, None, :])
    s = fp.lane_sum(FR, prods, axis=2)
    return fp.reduce_relaxed(FR, s)


class SpaceProver:
    """Streaming sumcheck prover over host-resident f, g; emits round
    messages bit-identical to the dense TimeProver."""

    def __init__(self, f: HostVector, g: HostVector, twist: int,
                 block_size: int = 1 << 20):
        self.fv = f
        self.gv = g
        self.twist0 = twist % R
        self.block_size = block_size
        self.tot_rounds = required_rounds(max(len(f), len(g)))
        self.emitted = 0
        self.challenges: List[int] = []
        self.twist = self.twist0  # twist^(2^len(challenges))

    def rounds(self) -> int:
        return self.tot_rounds

    def fold(self, r: int) -> None:
        self.challenges.append(r)
        self.twist = self.twist * self.twist % R

    def _stream_round_message(self):
        """(a, b) ints for the current round from one streaming pass."""
        j = len(self.challenges)
        group = 1 << (j + 1)  # base coeffs per output PAIR
        blk = max(self.block_size, group)
        blk -= blk % group
        wf = _fold_weights(self.challenges, True, self.twist0)
        wg = _fold_weights(self.challenges, False, 0)
        tw2 = self.twist * self.twist % R
        a_acc, b_acc = 0, 0
        n = max(len(self.fv), len(self.gv))
        for off in range(0, n, blk):
            size = min(blk, n - off)
            fb = self._load(self.fv, off, size, group)
            gb = self._load(self.gv, off, size, group)
            ff = _fold_block(fb, wf)  # (L, m*2) folded f values
            gf = _fold_block(gb, wg)
            f_e, f_o = poly.eo_split(ff)
            g_e, g_o = poly.eo_split(gf)
            m = f_e.shape[1]
            # T_k = twist_j^(2(k0 + k)) for global pair index
            k0 = off // group
            t0 = poly.scalar(FR, pow(self.twist, 2 * k0, R))
            t_pow = fp.mont_mul(
                FR, poly.powers(FR, tw2, m), t0
            )
            tw = poly.scalar(FR, self.twist)
            a_vec = fp.mont_mul(FR, fp.mont_mul(FR, f_e, g_e), t_pow)
            cross = fp.add(
                FR,
                fp.mont_mul(FR, f_e, g_o),
                fp.mont_mul(FR, fp.mont_mul(FR, g_e, f_o), tw),
            )
            b_vec = fp.mont_mul(FR, cross, t_pow)
            a_rel = fp.lane_sum(FR, a_vec, axis=1)
            b_rel = fp.lane_sum(FR, b_vec, axis=1)
            a_acc = (a_acc + FR.decode_relaxed(np.asarray(a_rel)[:, None])[0]) % R
            b_acc = (b_acc + FR.decode_relaxed(np.asarray(b_rel)[:, None])[0]) % R
        return a_acc, b_acc

    def _load(self, hv: HostVector, off: int, size: int,
              group: int) -> jnp.ndarray:
        """Device block [off, off+size) zero-padded to a group multiple
        (and zero-filled beyond the vector's end).  Device-generated /
        device-resident sources transfer nothing (host.device_block)."""
        from .host import device_block

        end = min(off + size, len(hv))
        m = max(0, end - off)
        pad_to = m + (-m % group)
        if pad_to < size:
            pad_to = size + (-size % group)
        return device_block(hv, off, end, pad_to=pad_to)

    def next_message(self, challenge: Optional[int]):
        if challenge is not None:
            self.fold(challenge)
        if self.emitted == self.tot_rounds:
            return None
        msg = self._stream_round_message()
        self.emitted += 1
        return msg

    def final_foldings(self) -> Optional[Tuple[int, int]]:
        if len(self.challenges) != self.tot_rounds:
            return None
        f0 = self._materialize_folded(twisted=True)
        g0 = self._materialize_folded(twisted=False)
        return (FR.decode(f0[:, :1])[0], FR.decode(g0[:, :1])[0])

    def _materialize_folded(self, twisted: bool) -> jnp.ndarray:
        """Current folding of f or g as a dense device vector."""
        j = len(self.challenges)
        group = 1 << j
        hv = self.fv if twisted else self.gv
        w = _fold_weights(self.challenges, twisted, self.twist0)
        blk = max(self.block_size, group)
        blk -= blk % group
        outs = []
        n = 1 << self.tot_rounds
        for off in range(0, n, blk):
            size = min(blk, n - off)
            b = self._load(hv, off, size, group)
            outs.append(_fold_block(b, w))
        return jnp.concatenate(outs, axis=1)


class ElasticProver:
    """Space prover that transcribes to the dense prover once the
    folded instance fits under SPACE_TIME_THRESHOLD
    (sumcheck/elastic_prover.rs:44-57)."""

    def __init__(self, f: HostVector, g: HostVector, twist: int,
                 block_size: int = 1 << 20,
                 threshold: int = SPACE_TIME_THRESHOLD):
        self.space = SpaceProver(f, g, twist, block_size)
        self.threshold = threshold
        self.time: Optional[TimeProver] = None
        self._maybe_switch()

    def _maybe_switch(self):
        s = self.space
        remaining = s.tot_rounds - len(s.challenges)
        if self.time is None and remaining <= self.threshold:
            f = s._materialize_folded(twisted=True)
            g = s._materialize_folded(twisted=False)
            # TimeProver pads to the shape bucket and builds the twist
            # powers for the current width from s.twist itself.
            t = TimeProver(f, g, s.twist)
            t.tot_rounds = s.tot_rounds
            t.round = len(s.challenges)
            self.time = t

    def rounds(self) -> int:
        return self.space.tot_rounds

    def fold(self, r: int) -> None:
        if self.time is not None:
            self.time.fold(r)
        else:
            self.space.fold(r)
            self._maybe_switch()

    def next_message(self, challenge: Optional[int]):
        if challenge is not None:
            self.fold(challenge)
        if self.time is not None:
            return self.time.next_message(None)
        msg = self.space.next_message(None)
        return msg

    def final_foldings(self):
        if self.time is not None:
            return self.time.final_foldings()
        return self.space.final_foldings()
