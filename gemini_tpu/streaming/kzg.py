"""Space-efficient KZG committer (kzg/space.rs analogue).

The reference's `CommitterKeyStream` commits through bounded MSM
buffers (`msm_chunks`, 2^20 elements, kzg/space.rs:22-55) so that keys
and coefficient streams never fully materialize.  Here the SRS lives
on device (HBM) and the COEFFICIENTS stream from host RAM: commit is
a loop of partial MSMs over `max_msm_buffer`-sized chunks, accumulated
with single group additions — identical group elements to the dense
committer (tested), with device memory bounded by the chunk size.

`open` uses the two-pass streaming quotient: the suffix sums
S_i = sum_{j>=i} f_j a^j needed by the parallel synthetic division
(kzg/commit.py divide_linear) are computed per block in pass one and
offset-corrected in pass two — the rolling-quotient analogue of
kzg/space.rs:95-166.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..curve import g1
from ..fields import fp
from ..fields.fp import FR
from ..kzg.commit import CommitterKey, divide_linear, _apoint_slice
from ..ops.msm import msm_mont_scalars
from ..ops import poly
from ..params import R
from .host import HostVector

G1Host = Optional[Tuple[int, int]]

MAX_MSM_BUFFER_LOG = 20  # kzg/space.rs:41 analogue


class CommitterKeyStream:
    """Streaming flavour of CommitterKey (kzg/space.rs:59)."""

    def __init__(self, ck: CommitterKey,
                 max_msm_buffer: int = 1 << MAX_MSM_BUFFER_LOG):
        self.ck = ck
        self.max_msm_buffer = max_msm_buffer

    def bases(self, off: int, m: int):
        """SRS G1 window [off, off+m) — override point for synthetic
        key streams."""
        return _apoint_slice_off(self.ck.powers_of_g, off, m)

    def commit(self, hv: HostVector) -> G1Host:
        """Chunked MSM accumulation (kzg/space.rs:22-55)."""
        acc = None
        for off, block in hv.blocks(self.max_msm_buffer):
            bases = self.bases(off, block.shape[1])
            part = msm_mont_scalars(bases, block)
            pt = g1.decode_jacobian(part)[0]
            acc = _g1_add_host(acc, pt)
        return acc

    def batch_commit(self, hvs: Sequence[HostVector]) -> List[G1Host]:
        return [self.commit(v) for v in hvs]

    def evaluate(self, hv: HostVector, x: int) -> int:
        """Streaming f(x), little-endian blocks."""
        acc = 0
        for off, block in hv.blocks(self.max_msm_buffer):
            acc = (acc + pow(x, off, R) * poly.evaluate_le(FR, block, x)) % R
        return acc

    def open(self, hv: HostVector, x: int) -> Tuple[int, G1Host]:
        """(f(x), commitment to the quotient (f - f(x))/(X - x)) via
        two streaming passes with bounded buffers."""
        n = len(hv)
        blk = self.max_msm_buffer
        # pass 1: block totals T_b = sum_{j in b} f_j x^j
        totals = []
        for off, block in hv.blocks(blk):
            totals.append(
                pow(x, off, R) * poly.evaluate_le(FR, block, x) % R
            )
        suffix_after = [0] * len(totals)  # S at each block's END
        run = 0
        for i in reversed(range(len(totals))):
            suffix_after[i] = run
            run = (run + totals[i]) % R
        evaluation = run
        # pass 2: per-block quotient via local divide + offset fix:
        # q_i = x^{-(i+1)} (S_local_i + S_after_block)
        acc = None
        xinv = pow(x, -1, R) if x % R else 0
        for (off, block), s_after in zip(hv.blocks(blk), suffix_after):
            m = block.shape[1]
            if x % R == 0:
                qblock = block[:, 1:] if off == 0 else block
                base_off = max(off - 1, 0)
            else:
                # local suffix sums of f_j x^(j-off) within the block
                pw = poly.powers(FR, x, m)
                t = fp.mont_mul(FR, block, pw)
                from ..kzg.commit import _suffix_sums
                s_local = _suffix_sums(t)
                # S_global_i = x^off * s_local + s_after
                s_global = fp.add(
                    FR,
                    fp.mont_mul(FR, s_local, poly.scalar(FR, pow(x, off, R))),
                    jnp.broadcast_to(
                        poly.scalar(FR, s_after), s_local.shape
                    ),
                )
                # q_i = S_{i+1} x^{-(i+1)} for global i in [off, off+m):
                # within block: shift by one, append s_after for the tail
                s_next = jnp.concatenate(
                    [s_global[:, 1:],
                     jnp.broadcast_to(poly.scalar(FR, s_after), (FR.n_limbs, 1))],
                    axis=1,
                )
                inv_pows = fp.mont_mul(
                    FR,
                    poly.powers(FR, xinv, m),
                    poly.scalar(FR, pow(xinv, off + 1, R)),
                )
                qblock = fp.mont_mul(FR, s_next, inv_pows)
                base_off = off
            if qblock.shape[1] == 0:
                continue
            # quotient has degree n-2: drop the final (zero) slot
            if off + m >= n:
                qblock = qblock[:, : max(0, n - 1 - base_off)]
                if qblock.shape[1] == 0:
                    continue
            bases = self.bases(base_off, qblock.shape[1])
            part = msm_mont_scalars(bases, qblock)
            acc = _g1_add_host(acc, g1.decode_jacobian(part)[0])
        return evaluation, acc


    def commit_folding(self, hv: HostVector,
                       challenges: Sequence[int]
                       ) -> Tuple[List[G1Host], List[HostVector]]:
        """Commit to every folding f^(1..len-1) of hv, skipping the
        last challenge (kzg/space.rs:192-223 `commit_folding`).

        The reference does one pass with a stack automaton because its
        streams are expensive to restart; here each level is a
        streaming `hv_fold` over geometrically shrinking host data
        (2x total work), with the folded levels retained host-side for
        the later openings — device memory stays bounded by the MSM
        buffer.  Returns (commitments, foldings) with group elements
        identical to the dense `foldings_polynomial` + `batch_commit`.
        """
        from .ops import hv_fold

        cur = hv
        comms: List[G1Host] = []
        folds: List[HostVector] = []
        for ch in challenges[:-1]:
            cur = hv_fold(cur, ch, self.max_msm_buffer)
            comms.append(self.commit(cur))
            folds.append(cur)
        return comms, folds

    def open_multi_points(self, hv: HostVector,
                          points: Sequence[int]) -> G1Host:
        """Streaming multi-point open (kzg/space.rs:128-166): chained
        streaming synthetic divisions, one bounded-buffer MSM at the
        end."""
        q = hv
        for pt in points:
            _, q = divide_linear_stream(q, pt, self.max_msm_buffer)
        if len(q) == 0:
            return None
        return self.commit(q)

    def batch_open_multi_points(self, hvs: Sequence[HostVector],
                                points: Sequence[int],
                                eval_chal: int) -> G1Host:
        """Open sum_i eta^i f_i at every point — the streaming twin of
        CommitterKey.batch_open_multi_points (kzg/space.rs:229-285
        `open_folding` semantics when hvs are a fold tree)."""
        from .ops import hv_lincomb

        etas = poly.powers_host(eval_chal, len(hvs))
        batched = hv_lincomb(list(hvs), etas, self.max_msm_buffer)
        return self.open_multi_points(batched, points)


class FakeCommitterKeyStream(CommitterKeyStream):
    """Constant-base synthetic SRS stream: powers_of_g[i] = g for every
    i, i.e. a real SRS with trapdoor τ = 1 (insecure, benchmark-only).

    This is the `DummyStreamer` SRS of the reference's examples
    (examples/snark.rs:55-67), which lets instances far beyond any
    materializable key (2^30+) run: commitments need only one tiled
    device block of g regardless of degree.  Proofs remain internally
    consistent (τ = 1 is a valid trapdoor), so `verifier_key()` can
    still check them."""

    def __init__(self, max_eval_points: int = 4, seed: int = 0,
                 max_msm_buffer: int = 1 << MAX_MSM_BUFFER_LOG):
        import random
        from types import SimpleNamespace

        from ..refimpl import g1_generator, g1_mul, g2_generator, g2_mul

        rng = random.Random(seed)
        self.g = g1_mul(g1_generator(), rng.randrange(1, R))
        self.g2 = g2_mul(g2_generator(), rng.randrange(1, R))
        self.max_msm_buffer = max_msm_buffer
        ap = g1.encode_affine([self.g])
        self._tile = g1.APoint(
            jnp.tile(ap.x, (1, max_msm_buffer)),
            jnp.tile(ap.y, (1, max_msm_buffer)),
            jnp.tile(ap.inf, (max_msm_buffer,)),
        )
        self.powers_of_g2 = [self.g2] * (max_eval_points + 1)
        # Enough of the dense-key surface for the provers' transcript
        # appends (psnark `_append_index`).
        self.ck = SimpleNamespace(powers_of_g2=self.powers_of_g2)

    def bases(self, off: int, m: int):
        return g1.APoint(
            self._tile.x[:, :m], self._tile.y[:, :m], self._tile.inf[:m]
        )

    def verifier_key(self, max_eval_points: int | None = None):
        """VerifierKey consistent with τ = 1."""
        from ..kzg.commit import VerifierKey

        m = max_eval_points if max_eval_points is not None else \
            len(self.powers_of_g2) - 1
        return VerifierKey([self.g] * (m + 1), list(self.powers_of_g2))


def divide_linear_stream(hv: HostVector, x: int,
                         block_size: int = 1 << MAX_MSM_BUFFER_LOG
                         ) -> Tuple[int, HostVector]:
    """Streaming division of f by (X - x): (f(x), quotient HostVector).

    Same two-pass rolling-suffix scheme as CommitterKeyStream.open
    (kzg/space.rs:95-126 analogue) but materializes the quotient to
    host RAM so divisions chain for multi-point openings."""
    n = len(hv)
    L = FR.n_limbs
    if n == 0:
        return 0, hv
    if n == 1:
        return FR.decode(jnp.asarray(hv.slice(0, 1)))[0], \
            HostVector(np.zeros((L, 0), dtype=np.uint32), hv.spec)
    if x % R == 0:
        return FR.decode(jnp.asarray(hv.slice(0, 1)))[0], \
            HostVector(np.asarray(hv.slice(1, n)), hv.spec)
    # pass 1: block totals and suffix-after-block sums
    totals = []
    for off, block in hv.blocks(block_size):
        totals.append(pow(x, off, R) * poly.evaluate_le(FR, block, x) % R)
    suffix_after = [0] * len(totals)
    run = 0
    for i in reversed(range(len(totals))):
        suffix_after[i] = run
        run = (run + totals[i]) % R
    evaluation = run
    # pass 2: q_i = x^{-(i+1)} * S_{i+1} written back per block
    out = np.zeros((L, n - 1), dtype=np.uint32)
    xinv = pow(x, -1, R)
    from ..kzg.commit import _suffix_sums

    for (off, block), s_after in zip(hv.blocks(block_size), suffix_after):
        m = block.shape[1]
        pw = poly.powers(FR, x, m)
        t = fp.mont_mul(FR, block, pw)
        s_local = _suffix_sums(t)
        s_global = fp.add(
            FR,
            fp.mont_mul(FR, s_local, poly.scalar(FR, pow(x, off, R))),
            jnp.broadcast_to(poly.scalar(FR, s_after), s_local.shape),
        )
        s_next = jnp.concatenate(
            [s_global[:, 1:],
             jnp.broadcast_to(poly.scalar(FR, s_after), (L, 1))],
            axis=1,
        )
        inv_pows = fp.mont_mul(
            FR,
            poly.powers(FR, xinv, m),
            poly.scalar(FR, pow(xinv, off + 1, R)),
        )
        qblock = fp.mont_mul(FR, s_next, inv_pows)
        take = min(m, n - 1 - off)
        if take > 0:
            out[:, off: off + take] = np.asarray(qblock[:, :take])
    return evaluation, HostVector(out, hv.spec)


def _apoint_slice_off(a, off: int, m: int):
    return g1.APoint(
        a.x[:, off: off + m], a.y[:, off: off + m], a.inf[off: off + m]
    )


def _g1_add_host(a: G1Host, b: G1Host) -> G1Host:
    from ..refimpl import g1_add

    return g1_add(a, b)
