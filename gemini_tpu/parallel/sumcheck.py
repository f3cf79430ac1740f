"""Multi-chip sumcheck: sharded round messages and folds.

The round message (a, b) is a sum of per-pair terms
(time_prover.rs:96-122) — embarrassingly parallel.  With coefficient
vectors sharded in contiguous even-length lane blocks:

  * each chip computes its local deferred-carry lane sums of
    f_e g_e T_k and the cross term;
  * relaxed limb sums are `psum`ed over ICI (uint32 elementwise adds —
    valid because each relaxed limb < 2^28 and device counts < 2^4
    leave headroom);
  * the fold f <- f_e + r*f_o is shard-local (even block lengths), as
    is the twist-power subsample T_k <- T_2k.

Per round the only cross-chip traffic is one (L+2)-limb psum per side
of the claim — the TPU analogue of the reference's single-threaded
round loop, and the replacement for its space-prover re-streaming.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..fields import fp
from ..fields.fp import FR
from ..ops import poly
from ..params import R
from .mesh import AXIS


def _local_partial_sums(f, g, t_pow, twist):
    """Local (a, b) relaxed limb columns for this shard's block."""
    f_e, f_o = poly.eo_split(f)
    g_e, g_o = poly.eo_split(g)
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


def round_message_sharded(mesh: Mesh, f, g, t_pow, twist):
    """(a, b) relaxed (L+2,) columns; f, g, t_pow sharded on lanes."""

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, AXIS), P(None, AXIS), P(None, AXIS), P(None, None)),
        out_specs=(P(None), P(None)),
        check_vma=False,  # fp kernels create constants inside scan carries
    )
    def kern(f, g, t_pow, twist):
        a, b = _local_partial_sums(f, g, t_pow, twist)
        return (
            jax.lax.psum(a, AXIS),
            jax.lax.psum(b, AXIS),
        )

    return jax.jit(kern)(f, g, t_pow, twist)


def fold_sharded(mesh: Mesh, f, g, t_pow, r, r_twist):
    """Shard-local fold of both sides + twist-power subsample."""

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(None, AXIS), P(None, AXIS), P(None, AXIS),
            P(None, None), P(None, None),
        ),
        out_specs=(P(None, AXIS), P(None, AXIS), P(None, AXIS)),
        check_vma=False,
    )
    def kern(f, g, t_pow, r, r_twist):
        f2 = poly.fold_polynomial(FR, f, r_twist)
        g2 = poly.fold_polynomial(FR, g, r)
        return f2, g2, poly.eo_split(t_pow)[0]

    return jax.jit(kern)(f, g, t_pow, r, r_twist)


class ShardedTimeProver:
    """Drop-in sumcheck prover (same interface as
    subprotocols.sumcheck.TimeProver) running over a device mesh.

    Shards stay fold-local while the local block length is even; once a
    shard's block would drop below 2 lanes the vectors are gathered to
    a single device and the dense single-chip prover finishes the tail
    (log2(mesh) final rounds on O(mesh) elements — negligible).
    """

    def __init__(self, mesh: Mesh, f, g, twist: int):
        from ..subprotocols.sumcheck import required_rounds
        from .mesh import shard_vector

        self.mesh = mesh
        size = mesh.devices.size
        rounds = required_rounds(max(f.shape[1], g.shape[1]))
        n = max(1 << rounds, 2 * size)
        self.tot_rounds = rounds
        self.f = shard_vector(mesh, poly.pad_to(FR, f, n))
        self.g = shard_vector(mesh, poly.pad_to(FR, g, n))
        self.twist = twist % R
        t = poly.powers(FR, self.twist * self.twist % R, n // 2)
        if size * 2 <= n // 2:
            t = shard_vector(mesh, t)
        self.t_pow = t
        self.round = 0
        self._tail = None  # dense TimeProver once too small to shard

    def rounds(self) -> int:
        return self.tot_rounds

    def _to_tail(self):
        """Gather shards to one device; finish with the dense prover."""
        from ..subprotocols.sumcheck import TimeProver

        tail = TimeProver.__new__(TimeProver)
        tail.f = jnp.asarray(np.asarray(self.f))
        tail.g = jnp.asarray(np.asarray(self.g))
        tail.t_pow = jnp.asarray(np.asarray(self.t_pow))
        tail.twist = self.twist
        tail.tot_rounds = self.tot_rounds
        tail.round = self.round
        # logical length: shards stayed fold-local, so the physical
        # width equals the remaining instance size (a power of two)
        tail.n = tail.f.shape[1]
        return tail

    def fold(self, r: int) -> None:
        if self._tail is not None:
            self._tail.fold(r)
            return
        size = self.mesh.devices.size
        if self.f.shape[1] // (2 * size) < 2:
            self._tail = self._to_tail()
            self._tail.fold(r)
            return
        r_twist = poly.scalar(FR, r * self.twist % R)
        self.f, self.g, self.t_pow = fold_sharded(
            self.mesh, self.f, self.g, self.t_pow,
            poly.scalar(FR, r), r_twist,
        )
        self.twist = self.twist * self.twist % R

    def next_message(self, challenge: Optional[int]):
        if challenge is not None:
            self.fold(challenge)
        if self._tail is not None:
            msg = self._tail.next_message(None)
            self.round = self._tail.round
            return msg
        if self.round == self.tot_rounds:
            return None
        tw = poly.scalar(FR, self.twist)
        a, b = round_message_sharded(self.mesh, self.f, self.g, self.t_pow, tw)
        a_int = FR.decode_relaxed(np.asarray(a)[:, None])[0]
        b_int = FR.decode_relaxed(np.asarray(b)[:, None])[0]
        self.round += 1
        return (a_int, b_int)

    def final_foldings(self) -> Optional[Tuple[int, int]]:
        if self._tail is not None:
            return self._tail.final_foldings()
        if self.round != self.tot_rounds:
            return None
        f0 = FR.decode(jnp.asarray(np.asarray(self.f))[:, :1])[0]
        g0 = FR.decode(jnp.asarray(np.asarray(self.g))[:, :1])[0]
        return (f0, g0)
