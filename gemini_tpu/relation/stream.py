"""Streaming R1CS sources (circuit.rs:26-40 `R1csStream` +
iterable/dummy.rs:220-238 `dummy_r1cs_stream` analogues).

The elastic SNARK prover consumes relations through this interface so
that giant synthetic instances (the reference demonstrates 2^35,
README.md:38) never materialize: the dummy diagonal instance generates
every vector it needs as an O(1)-memory `VirtualHostVector`, and the
challenge-tensor contraction A^T r_a + η B^T r_b + η² C^T r_c
collapses to a closed form for diagonal matrices.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
import numpy as np

from ..fields import fp
from ..fields.fp import FR
from ..params import R
from ..streaming.host import HostVector, VirtualHostVector, \
    from_device_limbs, to_device_limbs
from .r1cs import R1cs


from dataclasses import dataclass


@dataclass
class JointStream:
    """Union-sparsity joint matrices through the stream interface (the
    JointVal/Row/ColStream family, psnark/streams/val_stream.rs:8-551):
    index vectors as host numpy int64 (O(nnz) ints — the streaming
    pSNARK's host-RAM budget), field-encoded row/col and per-matrix
    value vectors as (possibly virtual) HostVectors."""

    row_index: np.ndarray
    col_index: np.ndarray
    row: HostVector  # field-encoded row indices
    col: HostVector
    val_a: HostVector
    val_b: HostVector
    val_c: HostVector

    @property
    def num_non_zero(self) -> int:
        return len(self.row_index)


def _index_field_hv(idx: np.ndarray, block_size: int = 1 << 20
                    ) -> HostVector:
    """Host int64 indices -> field-encoded HostVector, blockwise."""
    from ..subprotocols.plookup import index_to_field

    out = np.zeros((FR.n_limbs, len(idx)), dtype=np.uint32)
    for off in range(0, len(idx), block_size):
        blk = idx[off: off + block_size]
        out[:, off: off + len(blk)] = from_device_limbs(index_to_field(blk))
    return HostVector(out)


class DenseR1csStream:
    """Adapter exposing a dense `R1cs` through the stream interface;
    the challenge contraction uses the device transposed spmv."""

    def __init__(self, r1cs: R1cs):
        self.r1cs = r1cs
        self.z_a = HostVector.from_device(r1cs.a.matvec(r1cs.z))
        self.z_b = HostVector.from_device(r1cs.b.matvec(r1cs.z))
        self.z_c = HostVector.from_device(r1cs.c.matvec(r1cs.z))
        self.z = HostVector.from_device(r1cs.z)
        self.w = HostVector.from_device(r1cs.w)
        self.x_int = r1cs.x_int

    def joint(self) -> JointStream:
        from .r1cs import joint_matrices

        jm = joint_matrices(self.r1cs)
        return JointStream(
            row_index=jm.row_index,
            col_index=jm.col_index,
            row=HostVector.from_device(jm.row),
            col=HostVector.from_device(jm.col),
            val_a=HostVector.from_device(jm.val_a),
            val_b=HostVector.from_device(jm.val_b),
            val_c=HostVector.from_device(jm.val_c),
        )

    def abc_tensored(self, challenges: List[int], alpha: int, eta: int,
                     block_size: int) -> HostVector:
        """A^T r_a + η B^T r_b + η² C^T r_c with r_b = ⊗(1,ρ),
        r_c = powers(α), r_a = r_b ∘ r_c (snark/time_prover.rs:63-81)."""
        from ..fields import fp
        from ..fields.fp import FR
        from ..ops import poly

        r1cs = self.r1cs
        eta2 = eta * eta % R
        b_challenges = poly.tensor_device(FR, challenges)
        c_challenges = poly.powers(FR, alpha, b_challenges.shape[1])
        a_challenges = fp.mont_mul(FR, b_challenges, c_challenges)
        part_a = r1cs.a.rmatvec(a_challenges)
        part_b = r1cs.b.rmatvec(b_challenges)
        part_c = r1cs.c.rmatvec(c_challenges)
        abc = fp.add(
            FR,
            part_a,
            fp.add(
                FR,
                fp.mont_mul(FR, part_b, poly.scalar(FR, eta)),
                fp.mont_mul(FR, part_c, poly.scalar(FR, eta2)),
            ),
        )
        return HostVector.from_device(abc)


class DummyR1csStream:
    """O(1)-memory diagonal instance: z = (e, ..., e),
    A = B = C = diag(1/e) (circuit.rs:349-365 `dummy_r1cs` as a stream,
    iterable/dummy.rs:220-238 `dummy_r1cs_stream`).

    Satisfiability: (Az)_i (Bz)_i = 1·1 = (Cz)_i.  All vectors are
    `VirtualHostVector`s, so a 2^30 instance costs no host RAM until
    blocks are generated."""

    def __init__(self, n: int, e: int):
        assert e % R not in (0,)
        self.n = n
        self.e = e % R
        ones = VirtualHostVector.constant(1, n)
        self.z_a = ones
        self.z_b = ones
        self.z_c = ones
        self.z = VirtualHostVector.constant(self.e, n)
        self.w = VirtualHostVector.constant(self.e, n - 1)
        self.x_int = [self.e]

    def joint(self) -> JointStream:
        """Diagonal union sparsity: nnz = n entries at (i, i), every
        value 1/e (dummy_r1cs, circuit.rs:349-365).  Row/col field
        vectors generate lazily; index vectors are O(n) host ints."""
        n = self.n
        inv_e = pow(self.e, -1, R)
        idx = np.arange(n, dtype=np.int64)

        import jax.numpy as jnp

        def gen_dev(start: int, end: int):
            # iota -> 16-bit limb planes -> Montgomery, all on device
            # (n < 2^31 — two limbs suffice)
            i = jnp.arange(start, end, dtype=jnp.int32)
            limbs = jnp.zeros((FR.n_limbs, end - start), jnp.uint32)
            limbs = limbs.at[0].set(
                (i & 0xFFFF).astype(jnp.uint32))
            limbs = limbs.at[1].set(
                ((i >> 16) & 0xFFFF).astype(jnp.uint32))
            return fp.to_mont(FR, limbs)

        def gen(start: int, end: int) -> np.ndarray:
            return from_device_limbs(gen_dev(start, end))

        diag_field = VirtualHostVector(n, gen, device_fn=gen_dev)
        val = VirtualHostVector.constant(inv_e, n)
        return JointStream(
            row_index=idx, col_index=idx,
            row=diag_field, col=diag_field,
            val_a=val, val_b=val, val_c=val,
        )

    def to_dense(self) -> R1cs:
        """Materialize (small n only; for verification in tests)."""
        from .r1cs import dummy_r1cs
        import random

        class _Fixed(random.Random):
            def __init__(self, e):
                super().__init__(0)
                self._e = e

            def randrange(self, *a, **k):
                return self._e

        return dummy_r1cs(_Fixed(self.e), self.n)

    def abc_tensored(self, challenges: List[int], alpha: int, eta: int,
                     block_size: int):
        """diag(1/e)^T r = (1/e)·r for each matrix, so the combination
        is (1/e)(r_a + η r_b + η² r_c) truncated to n — generated lazily
        per block from the tensor/power closed forms (O(1) host memory,
        O(block) device memory; re-generated each streaming pass like
        the reference's re-streamed MatrixTensor)."""
        from ..fields import fp
        from ..fields.fp import FR
        from ..ops import poly
        from ..streaming.ops import powers_block_dev, tensor_block_dev

        eta2 = eta * eta % R
        inv_e = pow(self.e, -1, R)
        c0 = poly.scalar(FR, inv_e)
        c1 = poly.scalar(FR, eta * inv_e % R)
        c2 = poly.scalar(FR, eta2 * inv_e % R)

        def device_fn(start: int, end: int):
            t = tensor_block_dev(challenges, start, end)
            p = powers_block_dev(alpha, start, end)
            a = fp.mont_mul(FR, t, p)
            return fp.add(
                FR,
                fp.mont_mul(FR, a, c0),
                fp.add(
                    FR,
                    fp.mont_mul(FR, t, c1),
                    fp.mont_mul(FR, p, c2),
                ),
            )

        def fn(start: int, end: int):
            return from_device_limbs(device_fn(start, end))

        return VirtualHostVector(self.n, fn, device_fn=device_fn)


class HostR1csStream:
    """Host-RAM sparse relation: COO triples and z live in host memory;
    every device interaction is a bounded block.  The TPU reformulation
    of the reference's Iterable-backed `R1csStream` + `MatrixTensor`
    (circuit.rs:26-40, snark/streams.rs:11-103): where the reference
    re-streams col-major matrices against partially-expanded tensors,
    blocks of COO triples visit the device, multiply against tensor/
    power values generated AT their row indices (streaming/ops
    tensor_at/powers_at — log(n) masked multiplies each), and
    segment-sum into per-matrix host outputs.

    Use for relations beyond HBM but within host RAM; the elastic
    SNARK consumes it through the same interface as `DenseR1csStream`.
    """

    def __init__(self, a, b, c, z_limbs: np.ndarray, x_int: List[int],
                 block_size: int = 1 << 20):
        """a, b, c: (n_rows, n_cols, rows, cols, vals_limbs) host COO
        tuples, rows/cols int64 numpy, vals (L, nnz) uint32 Montgomery."""
        self._mats = [a, b, c]
        self.block_size = block_size
        self.z = HostVector(z_limbs)
        self.x_int = list(x_int)
        self.w = HostVector(
            np.ascontiguousarray(z_limbs[:, len(x_int):]))
        self.z_a = self._matvec(a)
        self.z_b = self._matvec(b)
        self.z_c = self._matvec(c)

    @classmethod
    def from_r1cs(cls, r1cs: R1cs,
                  block_size: int = 1 << 20) -> "HostR1csStream":
        def coo(m):
            return (m.n_rows, m.n_cols,
                    m.rows.astype(np.int64), m.cols.astype(np.int64),
                    np.asarray(m.vals))

        from ..fields.fp import FR

        return cls(coo(r1cs.a), coo(r1cs.b), coo(r1cs.c),
                   np.asarray(FR.encode(r1cs.z_int)), r1cs.x_int,
                   block_size)

    @staticmethod
    def _row_aligned_cuts(keys: np.ndarray, block: int) -> List[int]:
        """nnz cut points ~block apart, moved back to key boundaries so
        no segment spans two blocks."""
        cuts = [0]
        nnz = len(keys)
        while cuts[-1] < nnz:
            t = min(cuts[-1] + block, nnz)
            if t < nnz:
                t = int(np.searchsorted(keys, keys[t], side="left"))
                if t <= cuts[-1]:  # one giant segment: take it whole
                    t = int(np.searchsorted(keys, keys[t], side="right"))
            cuts.append(t)
        return cuts

    def _matvec(self, m) -> HostVector:
        """M z blockwise: host-gather z at the block's columns, device
        Montgomery products + segment sum, write back per row range."""
        from ..ops import scan as scan_util
        from ..ops.sparse import segment_sum_field

        n_rows, n_cols, rows, cols, vals = m
        L = FR.n_limbs
        out = np.zeros((L, n_rows), dtype=np.uint32)
        cuts = self._row_aligned_cuts(rows, self.block_size)
        for lo, hi in zip(cuts[:-1], cuts[1:]):
            r_lo, r_hi = int(rows[lo]), int(rows[hi - 1]) + 1
            span = r_hi - r_lo
            npad = scan_util.bucket4(hi - lo, floor=256)
            spad = scan_util.bucket4(span, floor=256)
            seg = np.full((npad,), spad - 1, dtype=np.int32)
            seg[: hi - lo] = rows[lo:hi] - r_lo
            v = np.zeros((L, npad), dtype=np.uint32)
            v[:, : hi - lo] = vals[:, lo:hi]
            zg = np.zeros((L, npad), dtype=np.uint32)
            zg[:, : hi - lo] = self.z.limbs[:, cols[lo:hi]]
            prods = fp.mont_mul(FR, to_device_limbs(v), to_device_limbs(zg))
            sums = segment_sum_field(FR, prods, jnp.asarray(seg), spad)
            out[:, r_lo:r_hi] = from_device_limbs(sums[:, :span])
        return HostVector(out)

    def joint(self) -> JointStream:
        """Union sparsity from the host COO triples (misc.rs:269-366
        semantics, numpy instead of merge iterators): packed (col, row)
        keys -> unique -> per-matrix value scatter.  O(nnz) host RAM,
        no dense relation ever built."""
        n_rows = max(m[0] for m in self._mats)
        keys = [
            m[3].astype(np.int64) * n_rows + m[2].astype(np.int64)
            for m in self._mats
        ]
        union = np.unique(np.concatenate(keys))
        row_index = union % n_rows
        col_index = union // n_rows

        def vals_on_union(m, key) -> HostVector:
            limbs = np.zeros((FR.n_limbs, len(union)), dtype=np.uint32)
            if len(key):
                pos = np.searchsorted(union, key)
                limbs[:, pos] = m[4]
            return HostVector(limbs)

        return JointStream(
            row_index=row_index,
            col_index=col_index,
            row=_index_field_hv(row_index, self.block_size),
            col=_index_field_hv(col_index, self.block_size),
            val_a=vals_on_union(self._mats[0], keys[0]),
            val_b=vals_on_union(self._mats[1], keys[1]),
            val_c=vals_on_union(self._mats[2], keys[2]),
        )

    def abc_tensored(self, challenges: List[int], alpha: int, eta: int,
                     block_size: int) -> HostVector:
        """A^T r_a + η B^T r_b + η² C^T r_c, blockwise: per matrix, COO
        blocks sorted col-major multiply against r values generated at
        their row indices and segment-sum by column; the three host
        outputs combine with one streaming lincomb."""
        from ..ops import scan as scan_util
        from ..ops.sparse import segment_sum_field
        from ..streaming.ops import hv_lincomb, powers_at, tensor_at

        eta2 = eta * eta % R
        k = len(challenges)
        L = FR.n_limbs

        def rvals(kind, idx):
            if kind == "b":
                return tensor_at(challenges, idx)
            if kind == "c":
                return powers_at(alpha, idx, max(k, 1))
            return fp.mont_mul(
                FR, tensor_at(challenges, idx),
                powers_at(alpha, idx, max(k, 1)),
            )

        outs = []
        for m, kind in zip(self._mats, ("a", "b", "c")):
            n_rows, n_cols, rows, cols, vals = m
            order = np.argsort(cols, kind="stable")
            rs, cs = rows[order], cols[order]
            vs = vals[:, order]
            out = np.zeros((L, n_cols), dtype=np.uint32)
            cuts = self._row_aligned_cuts(cs, block_size)
            for lo, hi in zip(cuts[:-1], cuts[1:]):
                c_lo, c_hi = int(cs[lo]), int(cs[hi - 1]) + 1
                span = c_hi - c_lo
                npad = scan_util.bucket4(hi - lo, floor=256)
                spad = scan_util.bucket4(span, floor=256)
                seg = np.full((npad,), spad - 1, dtype=np.int32)
                seg[: hi - lo] = cs[lo:hi] - c_lo
                v = np.zeros((L, npad), dtype=np.uint32)
                v[:, : hi - lo] = vs[:, lo:hi]
                ridx = np.zeros((npad,), dtype=np.int64)
                ridx[: hi - lo] = rs[lo:hi]
                rv = rvals(kind, ridx)
                # zero the padding lanes so they contribute nothing
                live = np.zeros((npad,), dtype=bool)
                live[: hi - lo] = True
                rv = jnp.where(jnp.asarray(live)[None, :], rv, 0)
                prods = fp.mont_mul(FR, to_device_limbs(v), rv)
                sums = segment_sum_field(FR, prods, jnp.asarray(seg), spad)
                out[:, c_lo:c_hi] = from_device_limbs(sums[:, :span])
            outs.append(HostVector(out))
        return hv_lincomb(outs, [1, eta, eta2], block_size)


def as_stream(r1cs):
    """R1cs -> DenseR1csStream; stream objects pass through."""
    if isinstance(r1cs, R1cs):
        return DenseR1csStream(r1cs)
    return r1cs
