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

    def commit(self, hv: HostVector) -> G1Host:
        """Chunked MSM accumulation (kzg/space.rs:22-55)."""
        acc = None
        for off, block in hv.blocks(self.max_msm_buffer):
            bases = _apoint_slice_off(
                self.ck.powers_of_g, off, block.shape[1]
            )
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
            if off == 0 and x % R != 0:
                pass
            if qblock.shape[1] == 0:
                continue
            # quotient has degree n-2: drop the final (zero) slot
            if off + m >= n:
                qblock = qblock[:, : max(0, n - 1 - base_off)]
                if qblock.shape[1] == 0:
                    continue
            bases = _apoint_slice_off(
                self.ck.powers_of_g, base_off, qblock.shape[1]
            )
            part = msm_mont_scalars(bases, qblock)
            acc = _g1_add_host(acc, g1.decode_jacobian(part)[0])
        return evaluation, acc


def _apoint_slice_off(a, off: int, m: int):
    return g1.APoint(
        a.x[:, off: off + m], a.y[:, off: off + m], a.inf[off: off + m]
    )


def _g1_add_host(a: G1Host, b: G1Host) -> G1Host:
    from ..refimpl import g1_add

    return g1_add(a, b)
