"""Batched prime-field arithmetic on 16-bit limb vectors (JAX).

This is the TPU-native replacement for the reference's `ark-ff`
Montgomery backend (SURVEY.md L0; asm CIOS mul).  Design:

  * A field vector of N elements is a uint32 array of shape
    (n_limbs, N) — "limbs-first" so the batch axis N lands on TPU
    vector lanes and every limb op is an (L, N) elementwise op.
    Arbitrary trailing batch shapes are allowed: (n_limbs, *batch).
  * Limbs are 16-bit, little-endian, held in uint32.  Elements are in
    Montgomery form (value * 2^(16L) mod p) and normalized (< p,
    limbs < 2^16) at API boundaries.
  * Montgomery multiplication is CIOS with *deferred carries*: the
    16x16 products are split hi/lo and accumulated into uint32 relaxed
    limbs; with L <= 24 the accumulators stay below 24 * 4 * 2^16 ~
    2^22.6, so no carry propagation is needed inside the L-iteration
    loop — one normalization pass at the end.  The whole multiply is a
    static chain of elementwise uint32 mul/add/shift ops that XLA fuses
    into a single VPU kernel.

Scalars (single field elements) are shape (n_limbs, 1) and broadcast.
Host <-> device conversion helpers are numpy-based.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .. import params

MASK = np.uint32(params.LIMB_MASK)
LIMB_BITS = params.LIMB_BITS


def _int_to_limbs(x: int, n: int) -> np.ndarray:
    return np.array(
        [(x >> (LIMB_BITS * i)) & params.LIMB_MASK for i in range(n)],
        dtype=np.uint32,
    )


@dataclass(frozen=True, eq=False)  # eq=False: identity hash for jit static args
class FieldSpec:
    """Static per-field constants, precomputed on host."""

    name: str
    modulus: int
    n_limbs: int
    mont_r: int
    mont_r2: int
    n0inv: int
    # derived numpy constants (limb columns)
    mod_limbs: np.ndarray = field(init=False, repr=False)
    r2_limbs: np.ndarray = field(init=False, repr=False)
    one_mont_limbs: np.ndarray = field(init=False, repr=False)

    def __post_init__(self):
        object.__setattr__(
            self, "mod_limbs", _int_to_limbs(self.modulus, self.n_limbs)
        )
        object.__setattr__(
            self, "r2_limbs", _int_to_limbs(self.mont_r2, self.n_limbs)
        )
        object.__setattr__(
            self, "one_mont_limbs", _int_to_limbs(self.mont_r, self.n_limbs)
        )

    # -- host-side encode/decode ------------------------------------------

    def encode(self, values: Sequence[int] | int, mont: bool = True) -> np.ndarray:
        """ints -> (L, N) uint32 limb array (Montgomery form by default).

        Limb extraction is vectorized through a byte buffer — the
        per-limb Python loop was the prover's input bottleneck at
        2^18+ elements."""
        if isinstance(values, (int, np.integer)):
            values = [int(values)]
        m = self.modulus
        r = self.mont_r if mont else 1
        nbytes = self.n_limbs * LIMB_BITS // 8
        buf = b"".join(
            ((v % m) * r % m).to_bytes(nbytes, "little") for v in values
        )
        arr = np.frombuffer(buf, dtype="<u2").reshape(
            len(values), self.n_limbs
        )
        return np.ascontiguousarray(arr.T).astype(np.uint32)

    def decode(self, arr, mont: bool = True) -> list[int]:
        """(L, *batch) limb array -> flat list of canonical ints."""
        a = np.asarray(arr, dtype=np.uint16).reshape(self.n_limbs, -1)
        buf = np.ascontiguousarray(a.T.astype("<u2")).tobytes()
        nbytes = self.n_limbs * LIMB_BITS // 8
        rinv = pow(self.mont_r, -1, self.modulus) if mont else 1
        m = self.modulus
        return [
            int.from_bytes(buf[j * nbytes:(j + 1) * nbytes], "little")
            * rinv % m
            for j in range(a.shape[1])
        ]

    def decode_relaxed(self, arr, mont: bool = True) -> list[int]:
        """Decode limbs that may exceed 16 bits / the modulus
        (e.g. lane-sum outputs): full-precision recombination mod p."""
        a = np.asarray(arr, dtype=np.uint64).reshape(arr.shape[0], -1)
        rinv = pow(self.mont_r, -1, self.modulus) if mont else 1
        vals = []
        for j in range(a.shape[1]):
            v = sum(int(a[i, j]) << (LIMB_BITS * i) for i in range(a.shape[0]))
            vals.append(v % self.modulus * rinv % self.modulus)
        return vals

    # -- constants on device ----------------------------------------------

    def zeros(self, batch_shape) -> jnp.ndarray:
        if isinstance(batch_shape, int):
            batch_shape = (batch_shape,)
        return jnp.zeros((self.n_limbs, *batch_shape), dtype=jnp.uint32)

    def ones_mont(self, batch_shape) -> jnp.ndarray:
        if isinstance(batch_shape, int):
            batch_shape = (batch_shape,)
        one = self.one_mont_limbs.reshape(
            (self.n_limbs,) + (1,) * len(batch_shape)
        )
        return jnp.broadcast_to(
            jnp.asarray(one), (self.n_limbs, *batch_shape)
        ).astype(jnp.uint32)


FQ = FieldSpec(
    "Fq", params.Q, params.FQ_LIMBS, params.FQ_MONT_R, params.FQ_MONT_R2,
    params.FQ_N0INV,
)
FR = FieldSpec(
    "Fr", params.R, params.FR_LIMBS, params.FR_MONT_R, params.FR_MONT_R2,
    params.FR_N0INV,
)


# ---------------------------------------------------------------------------
# Normalization primitives
# ---------------------------------------------------------------------------


def _carry_propagate(limbs):
    """Propagate carries through a list of uint32 relaxed limbs
    (little-endian).  Returns (normalized list, overflow carry)."""
    out = []
    carry = None
    for x in limbs:
        if carry is not None:
            x = x + carry
        out.append(x & MASK)
        carry = x >> LIMB_BITS
    return out, carry


def _sub_with_borrow(a_limbs, b_limbs):
    """a - b over n limbs; returns (limbs, borrow) with borrow in {0,1}."""
    out = []
    borrow = jnp.zeros_like(a_limbs[0])
    top = jnp.uint32(1 << LIMB_BITS)
    for x, y in zip(a_limbs, b_limbs):
        d = x + top - y - borrow
        out.append(d & MASK)
        borrow = jnp.uint32(1) - (d >> LIMB_BITS)
    return out, borrow


def _cond_sub_modulus(spec: FieldSpec, limbs):
    """Reduce a normalized (< 2p) value into [0, p)."""
    q = [jnp.uint32(v) for v in spec.mod_limbs]
    diff, borrow = _sub_with_borrow(limbs, q)
    keep = borrow.astype(jnp.bool_)
    return [jnp.where(keep, x, d) for x, d in zip(limbs, diff)]


def _stack(limbs):
    return jnp.stack(limbs, axis=0)


def _unstack(arr):
    return [arr[i] for i in range(arr.shape[0])]


# ---------------------------------------------------------------------------
# Public ops.  All take/return (L, *batch) uint32 normalized Montgomery
# arrays; `spec` is static under jit.
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=0)
def add(spec: FieldSpec, a, b):
    s = _unstack(a + b)  # limbs < 2^17
    s, _ = _carry_propagate(s)
    return _stack(_cond_sub_modulus(spec, s))


@partial(jax.jit, static_argnums=0)
def sub(spec: FieldSpec, a, b):
    q = jnp.asarray(
        spec.mod_limbs.reshape((spec.n_limbs,) + (1,) * (a.ndim - 1))
    )
    # a + p first (limbs < 2^17, value < 2p), normalize, then a borrow
    # subtract of b (no final borrow since a + p - b > 0), then reduce.
    s, _ = _carry_propagate(_unstack(a + q))
    s = jnp.broadcast_arrays(*s, b[0])[:-1]
    d, _ = _sub_with_borrow(s, _unstack(b))
    return _stack(_cond_sub_modulus(spec, d))


@partial(jax.jit, static_argnums=0)
def neg(spec: FieldSpec, a):
    return sub(spec, jnp.zeros_like(a), a)


def _cios(spec: FieldSpec, a, b):
    """Montgomery CIOS core: a (E, *batch) normalized limbs (E may
    exceed L), b (L, *batch) normalized < p.  Returns
    a * b * 2^(-LIMB_BITS*E) mod p, normalized (L, *batch).

    Deferred carries; accumulator bound (L+1 relaxed uint32 limbs):
    each outer iteration adds 4 16-bit terms per position plus a
    shifted-out carry, so max < E*(4*2^16 + 2^8) << 2^32 for E <= 26.
    """
    L = spec.n_limbs
    n0inv = jnp.uint32(spec.n0inv)

    bshape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    q = jnp.asarray(spec.mod_limbs.reshape((L,) + (1,) * len(bshape)))
    zero_row = jnp.zeros((1, *bshape), dtype=jnp.uint32)
    t0 = jnp.zeros((L + 1, *bshape), dtype=jnp.uint32)

    # The outer CIOS loop runs as lax.scan over a's limbs: identical
    # bodies, so the compiled graph is one iteration (compile time was
    # 13s+ unrolled on the CPU backend; runtime cost is equivalent).
    def body(t, ai):
        p = ai[None] * b  # (L, *bshape) exact 16x16 products
        t = t.at[:L].add(p & MASK)
        t = t.at[1:].add(p >> LIMB_BITS)
        # m = (t[0] * n0inv) mod 2^16 — exact: nothing carries into limb 0.
        m = (t[0] * n0inv) & MASK
        p2 = m[None] * q
        t = t.at[:L].add(p2 & MASK)
        t = t.at[1:].add(p2 >> LIMB_BITS)
        # shift right one limb; t[0] is now divisible by 2^16.
        carry0 = t[0] >> LIMB_BITS
        t = jnp.concatenate([t[1:], zero_row], axis=0)
        t = t.at[0].add(carry0)
        return t, None

    t, _ = jax.lax.scan(body, t0, a)
    t, overflow = _carry_propagate(_unstack(t))
    # Result fits in L limbs + tiny overflow limb t[L] (< 2): value < 2p.
    # Fold the overflow into the conditional subtract by subtracting q
    # with the overflow limb appended.
    hi = t[L] + overflow
    diff, borrow = _sub_with_borrow(t[:L], q)
    # if hi > 0 the value is >= 2^(16L) > p, so subtraction must apply;
    # else apply when no borrow.
    take_diff = jnp.logical_or(hi > 0, borrow == 0)
    out = [jnp.where(take_diff, d, x) for x, d in zip(t[:L], diff)]
    return _stack(out)


@partial(jax.jit, static_argnums=0)
def mont_mul(spec: FieldSpec, a, b):
    """Montgomery product a*b*R^{-1} mod p, elementwise over the batch
    (broadcasting between a and b batch shapes is supported)."""
    return _cios(spec, a, b)


def mont_mul_unrolled(spec: FieldSpec, a, b):
    """CIOS with the limb loop fully unrolled (no lax.scan).

    Bit-identical to `mont_mul`.  ~40x more HLO ops, so compile is
    slower — but with no sequential scan the whole multiply is one
    fusible elementwise graph: XLA keeps every intermediate in
    VMEM/registers and sequential-step overhead disappears.  This is
    the hot-path form (used by the tape VM); the scan form remains for
    compile-cheap cold paths.
    """
    L = spec.n_limbs
    n0inv = jnp.uint32(spec.n0inv)
    bshape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    q = jnp.asarray(spec.mod_limbs.reshape((L,) + (1,) * len(bshape)))
    b = jnp.broadcast_to(b, (L, *bshape)).astype(jnp.uint32)
    zero = jnp.zeros(bshape, dtype=jnp.uint32)

    # accumulator as L+2 relaxed rows, index-offset (no shifting):
    # t[k] accumulates products at weight 2^(16(k+i)) after i drops.
    t = [zero] * (L + 2)
    for i in range(L):
        ai = a[i]
        p = ai[None] * b
        plo = p & MASK
        phi = p >> LIMB_BITS
        for j in range(L):
            t[j] = t[j] + plo[j]
            t[j + 1] = t[j + 1] + phi[j]
        m = (t[0] * n0inv) & MASK
        p2 = m[None] * q
        p2lo = p2 & MASK
        p2hi = p2 >> LIMB_BITS
        for j in range(L):
            t[j] = t[j] + p2lo[j]
            t[j + 1] = t[j + 1] + p2hi[j]
        carry0 = t[0] >> LIMB_BITS
        t = t[1:] + [zero]
        t[0] = t[0] + carry0

    t, overflow = _carry_propagate(t)
    hi = t[L] + t[L + 1] + overflow
    diff, borrow = _sub_with_borrow(t[:L], _unstack(q))
    take_diff = jnp.logical_or(hi > 0, borrow == 0)
    out = [jnp.where(take_diff, d, x) for x, d in zip(t[:L], diff)]
    return _stack(out)


@partial(jax.jit, static_argnums=0)
def reduce_relaxed(spec: FieldSpec, v):
    """Reduce relaxed uint32 limbs (E rows, E >= L allowed, any limb
    < 2^32 - 2^16) into a normalized element of [0, p).

    Value-preserving mod p: if the relaxed limbs are a sum of
    Montgomery-form elements, the result is the Montgomery form of the
    field sum.  This is the device-side companion of
    `decode_relaxed` — use it where lane/segment sums must stay on
    device (sparse matvec, scatter accumulation).

    Method: carry-propagate to E+1 16-bit limbs, then one CIOS pass
    against the constant K = 2^(16*(E+1)) mod p, which computes
    V * K * 2^(-16*(E+1)) = V mod p.
    """
    limbs, carry = _carry_propagate(_unstack(v))
    limbs.append(carry)
    a = _stack(limbs)
    E = a.shape[0]
    K = pow(2, LIMB_BITS * E, spec.modulus)
    k = jnp.asarray(
        _int_to_limbs(K, spec.n_limbs).reshape(
            (spec.n_limbs,) + (1,) * (v.ndim - 1)
        )
    )
    return _cios(spec, a, k)


@partial(jax.jit, static_argnums=0)
def mont_sqr(spec: FieldSpec, a):
    return mont_mul(spec, a, a)


@partial(jax.jit, static_argnums=0)
def to_mont(spec: FieldSpec, a):
    r2 = jnp.asarray(
        spec.r2_limbs.reshape((spec.n_limbs,) + (1,) * (a.ndim - 1))
    )
    return mont_mul(spec, a, r2)


@partial(jax.jit, static_argnums=0)
def from_mont(spec: FieldSpec, a):
    one = jnp.concatenate(
        [
            jnp.ones((1, *a.shape[1:]), dtype=jnp.uint32),
            jnp.zeros((spec.n_limbs - 1, *a.shape[1:]), dtype=jnp.uint32),
        ]
    )
    return mont_mul(spec, a, one)


@partial(jax.jit, static_argnums=(0, 2))
def pow_fixed(spec: FieldSpec, a, exponent: int):
    """a^exponent (Montgomery in/out) for a static Python-int exponent.

    Square-and-multiply via `lax.scan` over the exponent bits
    (LSB-first), so the compiled graph contains one multiply body
    regardless of exponent size (vs ~2*bits if unrolled — XLA-hostile
    for 381-bit Fermat exponents).
    """
    if exponent == 0:
        return spec.ones_mont(a.shape[1:])
    nbits = exponent.bit_length()
    bits = jnp.array(
        [(exponent >> i) & 1 for i in range(nbits)], dtype=jnp.bool_
    )
    one = spec.ones_mont(a.shape[1:])

    def body(carry, bit):
        result, base = carry
        mul = mont_mul(spec, result, base)
        result = jnp.where(bit, mul, result)
        base = mont_sqr(spec, base)
        return (result, base), None

    (result, _), _ = jax.lax.scan(body, (one, a), bits)
    return result


def inv(spec: FieldSpec, a):
    """Batched inversion via Fermat (a^(p-2)); inverse of 0 is 0."""
    return pow_fixed(spec, a, spec.modulus - 2)


@partial(jax.jit, static_argnums=(0, 2))
def lane_sum(spec: FieldSpec, a, axis: int = 1):
    """Sum of field elements along a batch axis WITHOUT modular
    reduction: returns relaxed uint32 limbs of shape (L+2, *rest).

    Chunked so accumulators never overflow uint32: limbs < 2^16, so up
    to 2^14 values can be summed before a normalization pass; the
    normalization keeps limbs < 2^16 and pushes overflow into two extra
    limbs.  Decode on host with `decode_relaxed` (values stay Montgomery
    encoded).  Total extra headroom 32 bits => safe for batches < 2^32.
    """
    assert axis >= 1
    ext = jnp.concatenate(
        [a, jnp.zeros((2, *a.shape[1:]), dtype=jnp.uint32)], axis=0
    )

    def normalize(x):
        limbs = _unstack(x)
        out, carry = _carry_propagate(limbs)
        return _stack(out)

    cur = ext
    CHUNK = 1 << 13
    while cur.shape[axis] > 1:
        n = cur.shape[axis]
        take = min(CHUNK, n)
        pad = (-n) % take
        if pad:
            padding = [(0, 0)] * cur.ndim
            padding[axis] = (0, pad)
            cur = jnp.pad(cur, padding)
            n += pad
        new_shape = (
            cur.shape[:axis] + (n // take, take) + cur.shape[axis + 1:]
        )
        cur = cur.reshape(new_shape).sum(axis=axis + 1, dtype=jnp.uint32)
        cur = normalize(cur)
    return jnp.squeeze(cur, axis=axis)


def is_zero(spec: FieldSpec, a):
    """Boolean mask over the batch: element == 0 (normalized input)."""
    return jnp.all(a == 0, axis=0)


def eq(spec: FieldSpec, a, b):
    return jnp.all(a == b, axis=0)


def select(mask, a, b):
    """Elementwise select over the batch: mask ? a : b (mask: batch-shaped)."""
    return jnp.where(mask[None, ...], a, b)
