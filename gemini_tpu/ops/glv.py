"""GLV endomorphism decomposition for BLS12-381 G1 MSM.

BLS12-381's G1 carries the cube-root endomorphism phi(x, y) =
(beta*x, y) with phi(P) = lambda*P, lambda = z^2 - 1 (z the BLS
parameter), lambda^2 + lambda + 1 = 0 mod r.  Splitting every scalar
k = k1 + k2*lambda with |k1|, |k2| <= ~2^126.43 halves the Pippenger
window count (8 windows of c=16 over 128-bit components instead of 16
over the full 255 bits): the points double (P and phi(P)) so the
n-adds-per-window reduce chain is unchanged, but the per-window bucket
overhead, sort count, digit extraction and Horner chain all halve.

Decomposition (one exact rounded division; all vectorized on device):

    c1 = round(k * z^2 / r)            # Barrett + exact correction
    k2 = c1,  k1 = k - c1*(z^2 - 1)    # k1 + k2*lambda == k  (exactly)
    if k2 > z^2/2:  k2 -= z^2, k1 -= 1 # balance: z^2*lambda == -1 mod r

yielding |k1|, |k2| <= (z^2+1)/2 ~ 0.673 * 2^127, comfortably inside
the signed-digit capacity 1.0003 * 2^127 of 8 x 16-bit windows.
Component signs fold into the per-digit negation flags the MSM sort
already consumes.

The reference (Rust arkworks) relies on `ark-ec`'s GLV-less Pippenger
(/root/reference/src/kzg/msm/variable_base.rs spec); this file is
TPU-native design: limb convolutions against compile-time constants,
carries resolved by short `lax.scan` chains — a one-time O(n) cost per
MSM, ~0.1% of the bucket phase.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import fp
from ..fields.fp import FQ, FR
from ..params import R

LIMB_BITS = 16
MASK = jnp.uint32(0xFFFF)

Z = -0xD201000000010000  # BLS12-381 parameter
Z2 = Z * Z  # 127.43 bits
LAMBDA = (Z2 - 1) % R  # cube root of unity mod r (== Z2 - 1, < r)
# beta: the cube root of unity in Fq with (beta*x, y) == lambda * (x, y)
# (validated against the host refimpl in tests/test_msm.py).
BETA = 0x1A0111EA397FE699EC02408663D4DE85AA0D857D89759AD4897D29650FB85F9B409427EB4F49FFFD8BFD00000000AAAC

# Barrett reciprocal: mu = floor(2^S / r).  t = k*z^2 + r//2 < 2^383;
# S = 512 makes the approximation error < t/2^S + 1 < 2, so one
# conditional correction pair is exact.
_S = 512
_MU = (1 << _S) // R

# Per-component magnitude bound (used by tests): (z^2+1)/2 + 1.
COMPONENT_BOUND = (Z2 + 1) // 2 + 1
GLV_BITS = 128  # signed 8x16-bit windows cover +-1.0003*2^127


def _limbs(x: int, n: int) -> np.ndarray:
    return np.array([(x >> (LIMB_BITS * i)) & 0xFFFF for i in range(n)],
                    np.uint32)


def _carry_norm(rows, out_limbs: int):
    """(L, n) u32 rows (arbitrary < 2^32) -> exact 16-bit limbs of the
    represented value  sum_i rows[i] 2^(16 i)  mod 2^(16*out_limbs),
    via a sequential carry scan (L steps; one-time per-MSM cost)."""
    L = rows.shape[0]
    if L < out_limbs:
        rows = jnp.concatenate(
            [rows, jnp.zeros((out_limbs - L, rows.shape[1]), jnp.uint32)],
            axis=0)
    elif L > out_limbs:
        rows = rows[:out_limbs]

    def step(carry, r):
        v = r + carry
        return v >> LIMB_BITS, v & MASK

    _, out = jax.lax.scan(step, jnp.zeros((rows.shape[1],), jnp.uint32), rows)
    return out


def _const_mul(a, const: int, const_limbs: int, out_limbs: int):
    """(L, n) 16-bit limbs x compile-time constant -> (out_limbs, n)
    u32 relaxed rows (lo-sums + shifted hi-sums,每 row < 2^22ish).
    Exact: per-position lo/hi sums have < 2^6 terms of < 2^16."""
    cl = _limbs(const, const_limbs)
    L = a.shape[0]
    n = a.shape[1]
    lo = [jnp.zeros((n,), jnp.uint32) for _ in range(out_limbs)]
    hi = [jnp.zeros((n,), jnp.uint32) for _ in range(out_limbs)]
    for j in range(const_limbs):
        c = jnp.uint32(int(cl[j]))
        if int(cl[j]) == 0:
            continue
        for i in range(L):
            p = i + j
            if p >= out_limbs:
                break
            prod = a[i] * c
            lo[p] = lo[p] + (prod & MASK)
            if p + 1 < out_limbs:
                hi[p + 1] = hi[p + 1] + (prod >> LIMB_BITS)
    rows = jnp.stack([lo[p] + hi[p] for p in range(out_limbs)], axis=0)
    return rows


def _mul_norm(a, const: int, const_limbs: int, out_limbs: int):
    return _carry_norm(_const_mul(a, const, const_limbs, out_limbs),
                       out_limbs)


def _add_const(a, const: int):
    """a + const, exact, same limb count (no overflow past the top by
    construction at call sites)."""
    cl = _limbs(const, a.shape[0])
    rows = a + jnp.asarray(cl)[:, None]
    return _carry_norm(rows, a.shape[0])


def _sub(a, b_rows):
    """a - b (equal limb counts) via complement add; returns
    (16-bit limbs of a - b mod 2^(16L), borrow (n,) uint32)."""
    L = a.shape[0]
    rows = a + (MASK - b_rows)
    one = jnp.concatenate(
        [jnp.ones((1, a.shape[1]), jnp.uint32),
         jnp.zeros((L - 1, a.shape[1]), jnp.uint32)], axis=0)
    rows = rows + one

    def step(carry, r):
        v = r + carry
        return v >> LIMB_BITS, v & MASK

    carry, out = jax.lax.scan(
        step, jnp.zeros((a.shape[1],), jnp.uint32), rows)
    return out, jnp.uint32(1) - carry  # borrow = 1 - carry_out


def _sub_const(a, const: int):
    cl = jnp.asarray(_limbs(const, a.shape[0]))[:, None]
    return _sub(a, jnp.broadcast_to(cl, a.shape))


def _neg(a):
    """2^(16L) - a (two's complement), exact 16-bit limbs."""
    zero = jnp.zeros_like(a)
    out, _ = _sub(zero, a)
    return out


def _ge_const(a, const: int):
    """a >= const, vectorized lexicographic compare. (n,) bool."""
    _, borrow = _sub_const(a, const)
    return borrow == 0


@jax.jit
def decompose(scalars):
    """(16, n) canonical Fr limbs (k < r) ->
    (k1_mags (8, n), k1_neg (n,), k2_mags (8, n), k2_neg (n,)) with
    k == (-1)^k1_neg * k1 + (-1)^k2_neg * k2 * LAMBDA  (mod r) and
    both magnitudes < COMPONENT_BOUND < 2^126.43 + 1."""
    n = scalars.shape[1]
    # t = k*z^2 + r//2  (383 bits -> 24 limbs)
    t = _mul_norm(scalars, Z2, 8, 24)
    t = _add_const(t, R // 2)
    # Barrett quotient estimate: (t * mu) >> 512, mu 258 bits -> 17 limbs.
    # Full product 24+17 limbs; we need exact limbs 32.. so normalize all.
    q_full = _mul_norm(t, _MU, 17, 41)
    q = q_full[32:]  # (9, n) candidate floor((t + eps)/r), error in {0,1,2}
    # Exact correction: rem = t - q*r; while rem >= r: q += 1, rem -= r.
    qr = _mul_norm(q, R, 16, 24)
    rem, _ = _sub(t, qr)  # exact: t >= q*r by Barrett underestimate
    for _ in range(2):
        ge = _ge_const(rem, R)
        rem2, _ = _sub_const(rem, R)
        rem = jnp.where(ge[None, :], rem2, rem)
        q = _carry_norm(
            q + jnp.concatenate(
                [ge.astype(jnp.uint32)[None, :],
                 jnp.zeros((q.shape[0] - 1, n), jnp.uint32)], axis=0),
            q.shape[0])
    # k2 = q (in [0, z^2)); balance: if k2 > z^2/2 then k2 -= z^2, k1 -= 1
    bal = _ge_const(q, Z2 // 2 + 1)
    k2_alt, _ = _sub_const(q, Z2)      # negative branch: |k2| = z^2 - q
    k2_mag = jnp.where(bal[None, :], _neg(k2_alt), q)[:8]
    k2_neg = bal
    # k1 = k - q*lambda - bal  (17-limb two's complement)
    k17 = jnp.concatenate(
        [scalars, jnp.zeros((1, n), jnp.uint32)], axis=0)
    ql = _mul_norm(q, LAMBDA, 8, 17)
    k1_rows, borrow = _sub(k17, ql)
    balrow = jnp.concatenate(
        [bal.astype(jnp.uint32)[None, :],
         jnp.zeros((16, n), jnp.uint32)], axis=0)
    k1_rows, borrow2 = _sub(k1_rows, balrow)
    k1_negf = (borrow + borrow2) == 1  # exactly one borrow => negative
    k1_mag = jnp.where(k1_negf[None, :], _neg(k1_rows), k1_rows)[:8]
    return k1_mag, k1_negf, k2_mag, k2_neg


def beta_mont():
    """beta in FQ Montgomery form, (24, 1)."""
    return jnp.asarray(FQ.encode([BETA]))


def endo_x(x):
    """x-coordinates (24, n) Montgomery -> beta * x (the phi map)."""
    return fp.mont_mul(FQ, x, jnp.broadcast_to(beta_mont(), x.shape))
