"""Pallas TPU kernels for the G1 group law — the speed-of-light path.

Why this exists: the XLA-level paths (ops/tape.py VM, flat unrolled
graphs) bottom out ~1 µs/lane-add because intermediates live in HBM
(tape register file) or XLA declines to fuse ~100K-op graphs.  Here
each group-law formula is ONE Pallas kernel: the grid tiles the lane
axis, every intermediate lives in VMEM, and HBM traffic is exactly the
kernel inputs and outputs.

Montgomery multiply design (the measured hot spot — see
benches/vpubench.py for the VPU ceiling):

  * absolute-indexed CIOS, fully unrolled over the 24 limbs — no
    `fori_loop`, no `pltpu.roll` in the hot loop, no dynamic indexing;
  * the partial products land in THREE (32, T) accumulator pairs
    (lo/hi), one per group of 8 outer iterations, so every bulk
    update is a full-array op — no sublane shifts, no misaligned
    (L+1)-row concats (the v1 kernel's pathology);
  * the serial Montgomery m-chain runs on single (1, T) rows
    (position i is read out of the group accumulators with static
    indices), which costs ~1/32 of the bulk work;
  * one Kogge-Stone carry-lookahead pass (log-depth, vectorized)
    normalizes the result at the end of each field op.

Formulas are EFD add-2007-bl / dbl-2009-l with completeness selects,
exactly as curve/g1.py (bit-identical, asserted by tests/test_curve.py
TPU gates).  Reference spec: ark-ff Montgomery backend semantics
(SURVEY.md L0); /root/reference/src has no kernel counterpart — this
file is TPU-native design.

Kernels may not capture array constants: field constants travel as one
(32, 128) uint32 input (rows 0..23 = modulus limbs, row 24 lane 0 =
n0inv).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.fp import FQ

L = FQ.n_limbs  # 24
MASK = 0xFFFF  # Python int: in-kernel use without becoming a captured const


def _tile() -> int:
    # 1024 measured fastest (benches/mmprof.py: padd 150 ns/add vs 174
    # at 256) — deeper VMEM pipelines beat smaller grid steps.
    return int(os.environ.get("GEMINI_TPU_PTILE", "1024"))


def _int_limbs(x: int, n: int) -> np.ndarray:
    return np.array([(x >> (16 * i)) & 0xFFFF for i in range(n)], np.uint32)


# N' = -p^{-1} mod 2^384 — the separated-Montgomery reduction constant.
_NPRIME = pow(-FQ.modulus, -1, 1 << (16 * L))

_R384 = (1 << (16 * L)) % FQ.modulus  # Montgomery one
_CONSTS = np.zeros((128, 128), dtype=np.uint32)
_CONSTS[:L, :] = FQ.mod_limbs.reshape(L, 1)
_CONSTS[L, :] = FQ.n0inv
_CONSTS[32: 32 + L, :] = _int_limbs(_NPRIME, L).reshape(L, 1)
_CONSTS[64: 64 + L, :] = _int_limbs(2 * FQ.modulus, L).reshape(L, 1)
# rows 96..119: lane 0 = 1 (Montgomery), lane 1 = 12 (Montgomery).
_CONSTS[96: 96 + L, 0] = _int_limbs(_R384, L)
_CONSTS[96: 96 + L, 1] = _int_limbs(12 * _R384 % FQ.modulus, L)


# ---------------------------------------------------------------------------
# MXU constant-convolution matrices (redc_mxu).  In REDC both inner
# products are by CONSTANTS (m = P_lo * N' mod 2^384, MP = m * q), so
# each becomes one exact bf16 matmul on the MXU over 8-bit limbs:
# bytes < 2^8 are exact in bf16, and a 48-term dot of 16-bit products
# is < 2^22 — exact in the f32 accumulator.  Row/column orders are
# permuted ON THE MATRIX (it's constant) so the kernel needs no
# sublane interleaves:
#   columns: input layout [lo bytes of 16-bit rows 0..23 | hi bytes]
#            (one mask + one shift + one concat in-kernel);
#   rows:    output layout [even byte positions | odd byte positions]
#            (combine16 = lo_half + (hi_half << 8), full-array ops).
# ---------------------------------------------------------------------------

_NBYTES = 2 * L  # 48 8-bit limbs


def _int_bytes(x: int, n: int) -> np.ndarray:
    return np.array([(x >> (8 * i)) & 0xFF for i in range(n)], np.int64)


def _conv_matrix(const_bytes: np.ndarray, out_rows: int) -> np.ndarray:
    """Byte-convolution matrix M[k, i] = const_bytes[k - i] with the
    kernel's column (lo|hi) and row (even|odd) permutations applied."""
    nb = _NBYTES
    m = np.zeros((out_rows, nb), np.float32)
    for k in range(out_rows):
        for i in range(nb):
            d = k - i
            if 0 <= d < nb:
                m[k, i] = float(const_bytes[d])
    col_perm = [2 * j for j in range(L)] + [2 * j + 1 for j in range(L)]
    row_perm = ([2 * j for j in range(out_rows // 2)]
                + [2 * j + 1 for j in range(out_rows // 2)])
    return m[np.ix_(row_perm, col_perm)]


# Stacked (48 + 96, 48) bf16: rows 0..47 = N' matrix (product mod
# 2^384), rows 48..143 = q matrix (full 96-byte product).
_MXMAT = np.concatenate(
    [
        _conv_matrix(_int_bytes(_NPRIME, _NBYTES), _NBYTES),
        _conv_matrix(_int_bytes(FQ.modulus, _NBYTES), 2 * _NBYTES),
    ],
    axis=0,
).astype(jnp.bfloat16)


def _shift_up(t, d):
    """Value shift: row j -> row j+d (low rows zero-filled)."""
    zero = jnp.zeros((d, t.shape[1]), jnp.uint32)
    return jnp.concatenate([zero, t[:-d]], axis=0)


def _ckla(s):
    """Exact carry resolution for rows s with s < 2^17 (at most one
    outgoing carry per row): Kogge-Stone over (generate, propagate)
    pairs.  Returns (16-bit rows, carry-out row (1, T))."""
    k = s.shape[0]
    low = s & MASK
    g = s >> 16  # 0/1 generate
    p = (low == MASK).astype(jnp.uint32)  # propagate
    G, P = g, p
    d = 1
    while d < k:
        G = G | (P & _shift_up(G, d))
        P = P & _shift_up(P, d)
        d *= 2
    c = _shift_up(G, 1)  # carry INTO each row
    return (low + c) & MASK, G[k - 1: k]


class _F:
    """In-kernel field helpers on (24, T) uint32 normalized values."""

    def __init__(self, consts_ref, mx_ref=None):
        c = consts_ref[:]
        self.q = c[:L, :1]  # (24, 1) value
        self.n0 = c[L, 0]
        self.q0 = c[0, 0]
        self.nprime = c[32: 32 + L, :1]  # (24, 1)
        self.q2 = c[64: 64 + L, :1]  # (24, 1) rows of 2p
        self.one_m = c[96: 96 + L, :1]  # (24, 1) Montgomery 1
        self.twelve_m = c[96: 96 + L, 1:2]  # (24, 1) Montgomery 12
        self.mx = None if mx_ref is None else mx_ref[:]
        self._q8 = None
        self._n8 = None

    def _skew8(self, x24):
        """(24, T) -> list of 8 (32, T): copy r has x at rows r..r+23."""
        T = x24.shape[1]
        z8 = jnp.zeros((8, T), jnp.uint32)
        base = jnp.concatenate([x24, z8], axis=0)
        return [base] + [pltpu.roll(base, r, 0) for r in range(1, 8)]

    def q8(self, T):
        if self._q8 is None:
            qb = jnp.broadcast_to(self.q, (L, T)).astype(jnp.uint32)
            self._q8 = self._skew8(qb)
        return self._q8

    def n8(self, T):
        if self._n8 is None:
            nb = jnp.broadcast_to(self.nprime, (L, T)).astype(jnp.uint32)
            self._n8 = self._skew8(nb)
        return self._n8

    # -- separated Montgomery multiply (mm2): no serial m-chain ------------

    def _conv(self, a, B8):
        """Full 48-limb product of a (24, T) against pre-skewed B8.
        Returns group accumulators (A, H): A[g] holds raw u32 wrapped
        sums at offset 8g; H[g] the per-product carries (position
        8g+j+1).  True lo-sum of a row = (A - (H << 16)) mod 2^32."""
        T = a.shape[1]
        zero32 = jnp.zeros((32, T), jnp.uint32)
        A = [zero32, zero32, zero32]
        H = [zero32, zero32, zero32]
        for i in range(L):
            r, g = i & 7, i >> 3
            p = a[i: i + 1] * B8[r]
            A[g] = A[g] + p
            H[g] = H[g] + (p >> 16)
        return A, H

    @staticmethod
    def _assemble48(A, H):
        """Group accumulators -> relaxed 48-row product (rows < 2^21)."""
        T = A[0].shape[1]
        z = lambda k: jnp.zeros((k, T), jnp.uint32)
        AL = [Ag - (Hg << 16) for Ag, Hg in zip(A, H)]
        P = jnp.concatenate([AL[0], z(16)], 0)
        P = P + jnp.concatenate([z(8), AL[1], z(8)], 0)
        P = P + jnp.concatenate([z(16), AL[2]], 0)
        P = P + jnp.concatenate([z(1), H[0], z(15)], 0)
        P = P + jnp.concatenate([z(9), H[1], z(7)], 0)
        P = P + jnp.concatenate([z(17), H[2][:31]], 0)
        return P

    @staticmethod
    def _norm_mod(t):
        """Relaxed rows (< 2^22) -> exact 16-bit rows, mod 2^(16*rows)
        (carries off the top are dropped)."""
        s = (t & MASK) + _shift_up(t >> 16, 1)
        rows, _ = _ckla(s)
        return rows

    def conv48(self, a, b):
        """Relaxed 48-row product of two normalized-row operands."""
        return self._assemble48(*self._conv(a, self._skew8(b)))

    def redc(self, P):
        """Montgomery-reduce a relaxed 48-row value (rows < 2^23,
        value < 2^384 * 2p): returns val * 2^-384 + (m*p)/2^384 in
        normalized rows, < value/2^384 + p.  NO conditional subtract —
        the relaxed-domain core keeps everything in [0, 2p).

        Dispatches to the MXU form when the matrix input is wired in
        (both REDC inner products are by constants — see _MXMAT)."""
        if self.mx is not None and os.environ.get("GEMINI_TPU_MXU", "1") == "1":
            return self.redc_mxu(P)
        return self.redc_vpu(P)

    def redc_vpu(self, P):
        T = P.shape[1]
        p_lo = self._norm_mod(P[:L])
        # NB: a low-24-rows-only conv for m was tried (the upper half is
        # unneeded) and measured SLOWER (154 vs 138 ns/add): Mosaic
        # handles the truncated mixed-shape (24/16/8, T) multiplies
        # worse than the uniform (32, T) form.
        m = self._norm_mod(self._assemble48(*self._conv(p_lo, self.n8(T)))[:L])
        MP = self._assemble48(*self._conv(m, self.q8(T)))
        return self._redc_tail(P, MP)

    def _split8cat(self, x):
        """(24, T) 16-bit rows -> (48, T) bf16 bytes, [lo | hi] layout
        (matching _conv_matrix's column permutation).  Mosaic has no
        u32->bf16 cast; hop through i32/f32 (bytes are exact in all)."""
        cat = jnp.concatenate([x & 0xFF, x >> 8], axis=0)
        return cat.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)

    def _mxdot(self, mat, x8):
        """Exact bf16 MXU matmul: bytes x bytes summed over 48 -> < 2^22,
        exact in the f32 accumulator; convert back to u32."""
        o = jax.lax.dot_general(
            mat, x8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return o.astype(jnp.int32).astype(jnp.uint32)

    def redc_mxu(self, P):
        """REDC with both constant inner products on the MXU.

        m-matmul: (48, 48) @ bytes(P_lo) -> byte positions of
        P_lo * N' mod 2^384, rows [even | odd] so combine16 is two
        contiguous halves.  q-matmul: (96, 48) @ bytes(m) -> all 96
        byte positions of m * q, rows < 2^22 so the 16-bit-position
        combination stays < 2^31 (u32-safe; the tail's shift-add pass
        keeps _ckla inputs < 2^17)."""
        nmat = self.mx[:_NBYTES]
        qmat = self.mx[_NBYTES:]
        p_lo = self._norm_mod(P[:L])
        mo = self._mxdot(nmat, self._split8cat(p_lo))
        m = self._norm_mod(mo[:L] + (mo[L:] << 8))
        qo = self._mxdot(qmat, self._split8cat(m))
        MP = qo[: 2 * L] + (qo[2 * L:] << 8)  # (48, T) rows < 2^31
        return self._redc_tail(P, MP)

    def _redc_tail(self, P, MP):
        T = P.shape[1]
        S = P + MP  # rows < 2^31 + 2^23; value = P + m*p ≡ 0 mod 2^384
        # Exact carry-out of the low half (its normalized rows are 0).
        s_lo = (S[:L] & MASK) + _shift_up(S[:L] >> 16, 1)
        low, co_top = _ckla(s_lo)
        # carry into position 24 = carry-out of row 23 = co_top plus the
        # dropped (>> 16) of row 23 from the shift-add pass.
        co = co_top + (S[L - 1: L] >> 16)
        t = S[L:] + jnp.concatenate(
            [co, jnp.zeros((L - 1, T), jnp.uint32)], 0)
        s = (t & MASK) + _shift_up(t >> 16, 1)
        rows, _ = _ckla(s)
        return rows

    def mm2(self, a, b):
        """a * b * 2^-384 mod p via separated conv + one reduction.

        Bit-identical to `mm`; ~40% more bulk ops but ZERO serial
        single-row dependencies (the CIOS m-chain) — on TPU the m-chain
        latency dominates mm, so this form is the fast one."""
        return self._cond_sub(self.redc(self.conv48(a, b)))

    # -- Montgomery multiply ------------------------------------------------

    def mm(self, a, b):
        """a * b * 2^-384 mod p; inputs/outputs normalized (24, T).

        Dispatches to the separated form (mm2) unless GEMINI_TPU_MM2=0;
        the CIOS form (mm_cios) is kept for A/B benchmarking."""
        if os.environ.get("GEMINI_TPU_MM2", "1") == "1":
            return self.mm2(a, b)
        return self.mm_cios(a, b)

    def mm_cios(self, a, b):
        """Interleaved CIOS form (latency-bound on the serial m-chain)."""
        T = a.shape[1]
        B8 = self._skew8(b)
        Q8 = self.q8(T)
        zero32 = jnp.zeros((32, T), jnp.uint32)
        # Group accumulators: A[g]/H[g] hold lo/hi partial products for
        # outer iterations i in [8g, 8g+8), at position offset 8g
        # (H[g][j] belongs to position 8g + j + 1).
        A = [zero32, zero32, zero32]
        H = [zero32, zero32, zero32]
        carry = jnp.zeros((1, T), jnp.uint32)

        for i in range(L):
            r, g = i & 7, i >> 3
            # Wraparound accumulation: A gets the RAW u32 products
            # (wrapping mod 2^32); the true lo-sum of a row is
            # (A - (H << 16)) mod 2^32, exact because it is < 2^20.
            p = a[i: i + 1] * B8[r]
            A[g] = A[g] + p
            H[g] = H[g] + (p >> 16)
            # v = relaxed value at position i (all contributions so far
            # + retired carry); static single-row reads.
            v = A[0][i: i + 1] - (H[0][i: i + 1] << 16) + carry
            if i >= 1:
                v = v + H[0][i - 1: i]
            if i >= 8:
                v = v + A[1][i - 8: i - 7] - (H[1][i - 8: i - 7] << 16)
            if i >= 9:
                v = v + H[1][i - 9: i - 8]
            if i >= 16:
                v = v + A[2][i - 16: i - 15] - (H[2][i - 16: i - 15] << 16)
            if i >= 17:
                v = v + H[2][i - 17: i - 16]
            m = (v * self.n0) & MASK
            carry = (v + ((m * self.q0) & MASK)) >> 16
            p2 = m * Q8[r]
            A[g] = A[g] + p2
            H[g] = H[g] + (p2 >> 16)

        # Positions 24..47 -> result rows 0..23.  All A slices aligned;
        # H slices are misaligned by one but touched once per mm.
        AL = [Ag - (Hg << 16) for Ag, Hg in zip(A, H)]
        t = jnp.concatenate([AL[0][24:32], jnp.zeros((16, T), jnp.uint32)], 0)
        t = t + jnp.concatenate([AL[1][16:32], jnp.zeros((8, T), jnp.uint32)], 0)
        t = t + AL[2][8:32]
        t = t + jnp.concatenate([H[0][23:32], jnp.zeros((15, T), jnp.uint32)], 0)
        t = t + jnp.concatenate([H[1][15:32], jnp.zeros((7, T), jnp.uint32)], 0)
        t = t + H[2][7:31]
        t = t + jnp.concatenate([carry, jnp.zeros((23, T), jnp.uint32)], 0)
        # Normalize: rows < 2^23 -> one shift-add pass -> < 2^16 + 2^7,
        # then exact lookahead.  Value < 2p < 2^384: carry-out is 0.
        s = (t & MASK) + _shift_up(t >> 16, 1)
        rows, _ = _ckla(s)
        return self._cond_sub(rows)

    # -- add / sub ----------------------------------------------------------

    def _sub(self, a, b):
        """a - b mod 2^384 via complement-add; returns (rows, borrow)."""
        t = a + (MASK - b)
        one = jnp.concatenate(
            [jnp.ones((1, a.shape[1]), jnp.uint32),
             jnp.zeros((L - 1, a.shape[1]), jnp.uint32)], axis=0)
        rows, cout = _ckla(t + one)
        return rows, jnp.uint32(1) - cout

    def _cond_sub(self, rows, force=None):
        """Reduce value < 2p into [0, p)."""
        diff, borrow = self._sub(rows, self.q)
        take = borrow == 0  # (1, T)
        if force is not None:
            take = jnp.logical_or(take, force)
        return jnp.where(take, diff, rows)

    def fadd(self, a, b):
        rows, cout = _ckla(a + b)
        return self._cond_sub(rows, force=cout > 0)

    def fdbl(self, a):
        return self.fadd(a, a)

    def fsub(self, a, b):
        diff, borrow = self._sub(a, b)
        qfix = jnp.where(borrow > 0, jnp.broadcast_to(self.q, a.shape), 0)
        rows, _ = _ckla(diff + qfix.astype(jnp.uint32))
        return rows

    # -- relaxed domain [0, 2p) ---------------------------------------------
    # The padd hot path keeps every value as a representative < 2p:
    # Montgomery outputs skip the conditional subtract ((4p^2 +
    # 2^384*p)/2^384 < 1.5p for operands < 2p), add/sub reduce mod 2p,
    # and fused product-pairs share ONE reduction.  Saves ~20% of the
    # kernel's u32 ops; callers canonicalize final outputs off-kernel.

    def _cond_sub_2p(self, rows):
        """Reduce value < 4p into [0, 2p)."""
        diff, borrow = self._sub(rows, self.q2)
        return jnp.where(borrow == 0, diff, rows)

    def radd(self, a, b):
        """a + b mod 2p for a, b < 2p (sum < 4p < 2^384: no carry-out)."""
        rows, _ = _ckla(a + b)
        return self._cond_sub_2p(rows)

    def rdbl(self, a):
        return self.radd(a, a)

    def rsub(self, a, b):
        """a - b mod 2p, in [0, 2p), for a, b < 2p."""
        diff, borrow = self._sub(a, b)
        qfix = jnp.where(borrow > 0, jnp.broadcast_to(self.q2, a.shape), 0)
        rows, _ = _ckla(diff + qfix.astype(jnp.uint32))
        return rows

    def rneg(self, a):
        """2p - a, in [0, 2p] (2p when a == 0: fine, ≡ 0 mod p)."""
        rows, _ = self._sub(jnp.broadcast_to(self.q2, a.shape), a)
        return rows

    def rmm(self, a, b):
        """Relaxed Montgomery multiply: operands < 2p, output < 1.5p."""
        return self.redc(self.conv48(a, b))

    def rmm_add(self, a, b, c, d):
        """a*b + c*d (Montgomery), one shared reduction; output < 2p."""
        return self.redc(self.conv48(a, b) + self.conv48(c, d))

    def rmm_sub(self, a, b, c, d):
        """a*b - c*d (Montgomery) via c*d's negated operand; < 2p."""
        return self.redc(self.conv48(a, b) + self.conv48(c, self.rneg(d)))


def _is_zero(a):
    return jnp.all(a == 0, axis=0, keepdims=True)  # (1, T)


def _sel(mask, a, b):
    return jnp.where(mask, a, b)


def _mul12(F, x):
    """12*x mod p (b3 = 3b = 12 for BLS12-381) via 8x + 4x."""
    x2 = F.fdbl(x)
    x4 = F.fdbl(x2)
    x8 = F.fdbl(x4)
    return F.fadd(x8, x4)


def _rmul12(F, x):
    """12*x mod 2p (relaxed domain)."""
    x2 = F.rdbl(x)
    x4 = F.rdbl(x2)
    x8 = F.rdbl(x4)
    return F.radd(x8, x4)


def _padd_core(F, x1, y1, z1, x2, y2, z2):
    """Complete projective addition for a=0 short-Weierstrass curves
    (Renes-Costello-Batina 2015, Algorithm 7; validated against the
    host refimpl incl. doubling/identity/negation cases).  No branches,
    identity = (0 : y : 0).

    Complete for every point of E(Fq): BLS12-381's curve order h*r is
    odd, so there is no 2-torsion to except.

    Runs in the RELAXED domain: every value is a representative in
    [0, 2p); Montgomery outputs skip the conditional subtract, and the
    three final product-pair sums (x3 = t3*t1 - t4*y3 etc.) share one
    reduction each (rmm_add/rmm_sub) — together ~20% fewer u32 ops
    than the canonical form.  Outputs are < 2p; the pipeline
    canonicalizes only the final window totals (ops/msm.py)."""
    t0 = F.rmm(x1, x2)
    t1 = F.rmm(y1, y2)
    t2 = F.rmm(z1, z2)
    t3 = F.rmm(F.radd(x1, y1), F.radd(x2, y2))
    t3 = F.rsub(F.rsub(t3, t0), t1)  # x1y2 + x2y1
    t4 = F.rmm(F.radd(y1, z1), F.radd(y2, z2))
    t4 = F.rsub(F.rsub(t4, t1), t2)  # y1z2 + y2z1
    x3 = F.rmm(F.radd(x1, z1), F.radd(x2, z2))
    y3 = F.rsub(F.rsub(x3, t0), t2)  # x1z2 + x2z1
    t0 = F.radd(F.rdbl(t0), t0)      # 3 x1x2
    t2 = _rmul12(F, t2)              # b3 z1z2
    z3 = F.radd(t1, t2)
    t1 = F.rsub(t1, t2)
    y3 = _rmul12(F, y3)              # b3 (x1z2 + x2z1)
    x3, y3, z3 = (
        F.rmm_sub(t3, t1, t4, y3),
        F.rmm_add(t1, z3, y3, t0),
        F.rmm_add(z3, t4, t0, t3),
    )
    return x3, y3, z3


def _padd01_core(F, x1, y1, m1, x2, y2, m2):
    """RCB complete add specialized to z1, z2 ∈ {0, 1}: the MSM scan's
    level-0 operands (sorted affine points with dead lanes as
    (0 : y : 0)).  m1/m2 are (1, T) uint32 masks (1 = live).  The three
    z-involving products collapse to selects and the b3·z1z2 chain to a
    constant — 9 Montgomery mults instead of 12.  Relaxed domain as
    `_padd_core`; outputs < 2p with z3 ∈ general form."""
    live1 = m1 > 0
    live2 = m2 > 0
    both = jnp.logical_and(live1, live2)
    t0 = F.rmm(x1, x2)
    t1 = F.rmm(y1, y2)
    t3 = F.rmm(F.radd(x1, y1), F.radd(x2, y2))
    t3 = F.rsub(F.rsub(t3, t0), t1)            # x1y2 + x2y1
    t4 = F.radd(jnp.where(live2, y1, 0), jnp.where(live1, y2, 0))
    y3 = F.radd(jnp.where(live2, x1, 0), jnp.where(live1, x2, 0))
    t0 = F.radd(F.rdbl(t0), t0)                # 3 x1x2
    t2 = jnp.where(both, jnp.broadcast_to(F.twelve_m, x1.shape), 0)
    z3 = F.radd(t1, t2)
    t1 = F.rsub(t1, t2)
    y3 = _rmul12(F, y3)                        # b3 (x1z2 + x2z1)
    x3, y3, z3 = (
        F.rmm_sub(t3, t1, t4, y3),
        F.rmm_add(t1, z3, y3, t0),
        F.rmm_add(z3, t4, t0, t3),
    )
    return x3, y3, z3


def _dbl_core(F, x, y, z):
    a = F.mm(x, x)
    b = F.mm(y, y)
    c = F.mm(b, b)
    xb = F.fadd(x, b)
    d = F.fdbl(F.fsub(F.mm(xb, xb), F.fadd(a, c)))
    e = F.fadd(F.fdbl(a), a)
    f = F.mm(e, e)
    x3 = F.fsub(f, F.fdbl(d))
    c8 = F.fdbl(F.fdbl(F.fdbl(c)))
    y3 = F.fsub(F.mm(e, F.fsub(d, x3)), c8)
    z3 = F.fdbl(F.mm(y, z))
    return x3, y3, z3


def _add_core(F, x1, y1, z1, x2, y2, z2):
    """add-2007-bl + completeness selects; returns (x3, y3, z3)."""
    z1z1 = F.mm(z1, z1)
    z2z2 = F.mm(z2, z2)
    u1 = F.mm(x1, z2z2)
    u2 = F.mm(x2, z1z1)
    s1 = F.mm(F.mm(y1, z2), z2z2)
    s2 = F.mm(F.mm(y2, z1), z1z1)
    h = F.fsub(u2, u1)
    h2 = F.fdbl(h)
    i = F.mm(h2, h2)
    j = F.mm(h, i)
    r = F.fdbl(F.fsub(s2, s1))
    v = F.mm(u1, i)
    x3 = F.fsub(F.fsub(F.mm(r, r), j), F.fdbl(v))
    y3 = F.fsub(F.mm(r, F.fsub(v, x3)), F.fdbl(F.mm(s1, j)))
    zs = F.fadd(z1, z2)
    z3 = F.mm(F.fsub(F.mm(zs, zs), F.fadd(z1z1, z2z2)), h)

    xd, yd, zd = _dbl_core(F, x1, y1, z1)
    same = jnp.logical_and(_is_zero(h), _is_zero(r))
    x3 = _sel(same, xd, x3)
    y3 = _sel(same, yd, y3)
    z3 = _sel(same, zd, z3)
    p_inf = _is_zero(z1)
    q_inf = _is_zero(z2)
    x3 = _sel(p_inf, x2, x3)
    y3 = _sel(p_inf, y2, y3)
    z3 = _sel(p_inf, z2, z3)
    x3 = _sel(q_inf, x1, x3)
    y3 = _sel(q_inf, y1, y3)
    z3 = _sel(q_inf, z1, z3)
    return x3, y3, z3


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _add_kernel(k, mx, x1, y1, z1, x2, y2, z2, ox, oy, oz):
    F = _F(k, mx)
    x3, y3, z3 = _add_core(F, x1[:], y1[:], z1[:], x2[:], y2[:], z2[:])
    ox[:] = x3
    oy[:] = y3
    oz[:] = z3


def _dbl_kernel(k, mx, x1, y1, z1, ox, oy, oz):
    F = _F(k, mx)
    x3, y3, z3 = _dbl_core(F, x1[:], y1[:], z1[:])
    ox[:] = x3
    oy[:] = y3
    oz[:] = z3


def _mm_kernel(k, mx, a, b, o):
    o[:] = _F(k, mx).mm(a[:], b[:])


def _padd_kernel(k, mx, x1, y1, z1, x2, y2, z2, ox, oy, oz):
    F = _F(k, mx)
    x3, y3, z3 = _padd_core(F, x1[:], y1[:], z1[:], x2[:], y2[:], z2[:])
    ox[:] = x3
    oy[:] = y3
    oz[:] = z3


def _padd01_kernel(k, mx, x1, y1, m1, x2, y2, m2, ox, oy, oz):
    F = _F(k, mx)
    x3, y3, z3 = _padd01_core(
        F, x1[:], y1[:], m1[:], x2[:], y2[:], m2[:])
    ox[:] = x3
    oy[:] = y3
    oz[:] = z3


def _coord_spec(tile):
    return pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.VMEM)


def _const_spec():
    return pl.BlockSpec((128, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)


def _mx_spec():
    return pl.BlockSpec((3 * _NBYTES, _NBYTES), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)


def _consts():
    return jnp.asarray(_CONSTS)


def _mx():
    return jnp.asarray(_MXMAT)


def _coord_out(n):
    return jax.ShapeDtypeStruct((L, n), jnp.uint32)


def _pad_lanes(a, n_pad):
    if a.shape[-1] == n_pad:
        return a
    pad = [(0, 0)] * (a.ndim - 1) + [(0, n_pad - a.shape[-1])]
    return jnp.pad(a, pad)


def _flatten(a):
    return a.reshape(a.shape[0], -1), a.shape[1:]


@partial(jax.jit, static_argnums=(0,))
def _add_call(tile, x1, y1, z1, x2, y2, z2):
    n = x1.shape[1]
    npad = -(-n // tile) * tile
    ins = [_pad_lanes(a, npad) for a in (x1, y1, z1, x2, y2, z2)]
    return pl.pallas_call(
        _add_kernel,
        grid=(npad // tile,),
        in_specs=[_const_spec(), _mx_spec()] + [_coord_spec(tile)] * 6,
        out_specs=[_coord_spec(tile)] * 3,
        out_shape=[_coord_out(npad)] * 3,
    )(_consts(), _mx(), *ins)


@partial(jax.jit, static_argnums=(0,))
def _dbl_call(tile, x1, y1, z1):
    n = x1.shape[1]
    npad = -(-n // tile) * tile
    ins = [_pad_lanes(a, npad) for a in (x1, y1, z1)]
    return pl.pallas_call(
        _dbl_kernel,
        grid=(npad // tile,),
        in_specs=[_const_spec(), _mx_spec()] + [_coord_spec(tile)] * 3,
        out_specs=[_coord_spec(tile)] * 3,
        out_shape=[_coord_out(npad)] * 3,
    )(_consts(), _mx(), *ins)


@partial(jax.jit, static_argnums=(0,))
def _padd_call(tile, x1, y1, z1, x2, y2, z2):
    n = x1.shape[1]
    npad = -(-n // tile) * tile
    ins = [_pad_lanes(a, npad) for a in (x1, y1, z1, x2, y2, z2)]
    return pl.pallas_call(
        _padd_kernel,
        grid=(npad // tile,),
        in_specs=[_const_spec(), _mx_spec()] + [_coord_spec(tile)] * 6,
        out_specs=[_coord_spec(tile)] * 3,
        out_shape=[_coord_out(npad)] * 3,
    )(_consts(), _mx(), *ins)


def _mask_spec(tile):
    return pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM)


@partial(jax.jit, static_argnums=(0,))
def _padd01_call(tile, x1, y1, m1, x2, y2, m2):
    n = x1.shape[1]
    npad = -(-n // tile) * tile
    ins = [_pad_lanes(a, npad) for a in (x1, y1, m1, x2, y2, m2)]
    return pl.pallas_call(
        _padd01_kernel,
        grid=(npad // tile,),
        in_specs=[_const_spec(), _mx_spec()] + [
            _coord_spec(tile), _coord_spec(tile), _mask_spec(tile),
            _coord_spec(tile), _coord_spec(tile), _mask_spec(tile),
        ],
        out_specs=[_coord_spec(tile)] * 3,
        out_shape=[_coord_out(npad)] * 3,
    )(_consts(), _mx(), *ins)


def padd01(p, q):
    """Complete projective add for operands with z ∈ {0, 1}: p, q are
    (x, y, mask) tuples — coords (L, *batch), mask (*batch) uint32/bool
    (1 = live, 0 = the identity (0 : y : 0)).  One fused kernel, ~25%
    cheaper than `padd` (9 vs 12 Montgomery mults)."""
    x1, batch = _flatten(p[0])
    y1, _ = _flatten(p[1])
    m1 = jnp.asarray(p[2], jnp.uint32).reshape(1, -1)
    x2, _ = _flatten(q[0])
    y2, _ = _flatten(q[1])
    m2 = jnp.asarray(q[2], jnp.uint32).reshape(1, -1)
    n = x1.shape[1]
    ox, oy, oz = _padd01_call(_tile(), x1, y1, m1, x2, y2, m2)
    shape = (L, *batch)
    return (
        ox[:, :n].reshape(shape),
        oy[:, :n].reshape(shape),
        oz[:, :n].reshape(shape),
    )


@partial(jax.jit, static_argnums=(0,))
def _mm_call(tile, a, b):
    n = a.shape[1]
    npad = -(-n // tile) * tile
    ins = [_pad_lanes(x, npad) for x in (a, b)]
    return pl.pallas_call(
        _mm_kernel,
        grid=(npad // tile,),
        in_specs=[_const_spec(), _mx_spec()] + [_coord_spec(tile)] * 2,
        out_specs=_coord_spec(tile),
        out_shape=_coord_out(npad),
    )(_consts(), _mx(), *ins)


def padd(p, q):
    """Complete projective add: p, q are (x, y, z) tuples of
    (L, *batch) coords; identity is (0 : 1 : 0).  One fused kernel."""
    x1, batch = _flatten(p[0])
    y1, _ = _flatten(p[1])
    z1, _ = _flatten(p[2])
    x2, _ = _flatten(q[0])
    y2, _ = _flatten(q[1])
    z2, _ = _flatten(q[2])
    n = x1.shape[1]
    ox, oy, oz = _padd_call(_tile(), x1, y1, z1, x2, y2, z2)
    shape = (L, *batch)
    return (
        ox[:, :n].reshape(shape),
        oy[:, :n].reshape(shape),
        oz[:, :n].reshape(shape),
    )


def mont_mul(a, b):
    """Standalone Montgomery multiply (test/validation entry point)."""
    af, batch = _flatten(a)
    bf, _ = _flatten(b)
    n = af.shape[1]
    tile = min(_tile(), max(128, 1 << (n - 1).bit_length()))
    out = _mm_call(tile, af, bf)
    return out[:, :n].reshape(L, *batch)


def add(p, q):
    """Complete Jacobian add on (L, *batch) coords via one kernel."""
    x1, batch = _flatten(p.x)
    y1, _ = _flatten(p.y)
    z1, _ = _flatten(p.z)
    x2, _ = _flatten(q.x)
    y2, _ = _flatten(q.y)
    z2, _ = _flatten(q.z)
    n = x1.shape[1]
    tile = _tile()
    ox, oy, oz = _add_call(tile, x1, y1, z1, x2, y2, z2)
    shape = (L, *batch)
    return (
        ox[:, :n].reshape(shape),
        oy[:, :n].reshape(shape),
        oz[:, :n].reshape(shape),
    )


def double(p):
    x1, batch = _flatten(p.x)
    y1, _ = _flatten(p.y)
    z1, _ = _flatten(p.z)
    n = x1.shape[1]
    tile = _tile()
    ox, oy, oz = _dbl_call(tile, x1, y1, z1)
    shape = (L, *batch)
    return (
        ox[:, :n].reshape(shape),
        oy[:, :n].reshape(shape),
        oz[:, :n].reshape(shape),
    )
