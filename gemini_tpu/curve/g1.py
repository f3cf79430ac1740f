"""Batched G1 arithmetic over limb vectors (JAX).

TPU-native replacement for `ark-ec` short-Weierstrass ops (SURVEY.md
L0).  Points are structure-of-arrays: Jacobian (X, Y, Z) with each
coordinate an (L, N) Fq Montgomery limb array; infinity iff Z == 0.
Affine points carry an explicit infinity mask.

The group law is made *complete* (any inputs, including P == Q,
P == -Q, identities) by computing both the dedicated-addition and
doubling formulas and selecting — the standard branchless form for
SIMD/accelerator backends.  Completeness is what lets `add` serve as
the combiner of associative scans in the MSM (ops/msm.py).

Formulas: Jacobian dbl-2009-l / add-2007-bl / madd-2007-bl
(Explicit-Formulas Database), a = 0.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import fp
from ..fields.fp import FQ
from ..ops import tape

S = FQ  # field spec for coordinates


# ---------------------------------------------------------------------------
# Group-law tape programs (recorded once at import; executed by the
# ops/tape.py VM so each batch shape compiles one small kernel instead
# of a ~45-field-op flat graph).  Formulas: EFD dbl-2009-l /
# add-2007-bl / madd-2007-bl, a = 0.
# ---------------------------------------------------------------------------


def _record_dbl_core(p: tape.TapeProgram, x, y, z):
    """Append dbl-2009-l to program `p`; returns (x3, y3, z3) values."""
    a = p.sqr(x)
    b = p.sqr(y)
    c = p.sqr(b)
    d = p.dbl(p.sub(p.sqr(p.add(x, b)), p.add(a, c)))
    e = p.add(p.dbl(a), a)
    f = p.sqr(e)
    x3 = p.sub(f, p.dbl(d))
    c8 = p.dbl(p.dbl(p.dbl(c)))
    y3 = p.sub(p.mul(e, p.sub(d, x3)), c8)
    z3 = p.dbl(p.mul(y, z))
    return x3, y3, z3


def _build_dbl_prog() -> tape.TapeProgram:
    p = tape.TapeProgram(3)
    x, y, z = p.inputs
    p.set_outputs(_record_dbl_core(p, x, y, z))
    p.finalize()
    return p


def _build_add_prog() -> tape.TapeProgram:
    """Full Jacobian add; also emits h, r and double(P) for the
    complete-addition epilogue selects."""
    p = tape.TapeProgram(6)
    x1, y1, z1, x2, y2, z2 = p.inputs
    z1z1 = p.sqr(z1)
    z2z2 = p.sqr(z2)
    u1 = p.mul(x1, z2z2)
    u2 = p.mul(x2, z1z1)
    s1 = p.mul(p.mul(y1, z2), z2z2)
    s2 = p.mul(p.mul(y2, z1), z1z1)
    h = p.sub(u2, u1)
    i = p.sqr(p.dbl(h))
    j = p.mul(h, i)
    r = p.dbl(p.sub(s2, s1))
    v = p.mul(u1, i)
    x3 = p.sub(p.sub(p.sqr(r), j), p.dbl(v))
    y3 = p.sub(p.mul(r, p.sub(v, x3)), p.dbl(p.mul(s1, j)))
    z3 = p.mul(p.sub(p.sqr(p.add(z1, z2)), p.add(z1z1, z2z2)), h)
    xd, yd, zd = _record_dbl_core(p, x1, y1, z1)
    p.set_outputs([x3, y3, z3, h, r, xd, yd, zd])
    p.finalize()
    return p


def _build_madd_prog() -> tape.TapeProgram:
    """Mixed add (Z2 = 1); also emits h, r, double(P) for epilogue."""
    p = tape.TapeProgram(5)
    x1, y1, z1, x2, y2 = p.inputs
    z1z1 = p.sqr(z1)
    u2 = p.mul(x2, z1z1)
    s2 = p.mul(p.mul(y2, z1), z1z1)
    h = p.sub(u2, x1)
    hh = p.sqr(h)
    i = p.dbl(p.dbl(hh))
    j = p.mul(h, i)
    r = p.dbl(p.sub(s2, y1))
    v = p.mul(x1, i)
    x3 = p.sub(p.sub(p.sqr(r), j), p.dbl(v))
    y3 = p.sub(p.mul(r, p.sub(v, x3)), p.dbl(p.mul(y1, j)))
    z3 = p.mul(p.dbl(z1), h)
    xd, yd, zd = _record_dbl_core(p, x1, y1, z1)
    p.set_outputs([x3, y3, z3, h, r, xd, yd, zd])
    p.finalize()
    return p


_DBL_PROG = _build_dbl_prog()
_ADD_PROG = _build_add_prog()
_MADD_PROG = _build_madd_prog()


class JPoint(NamedTuple):
    """Jacobian point batch; coords (L, *batch) uint32 Montgomery."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray


class APoint(NamedTuple):
    """Affine point batch with explicit infinity mask (*batch,) bool."""

    x: jnp.ndarray
    y: jnp.ndarray
    inf: jnp.ndarray


def _mul(a, b):
    return fp.mont_mul(S, a, b)


def _sqr(a):
    return fp.mont_mul(S, a, a)


def _add(a, b):
    return fp.add(S, a, b)


def _sub(a, b):
    return fp.sub(S, a, b)


def _dbl(a):
    return fp.add(S, a, a)


def infinity(batch_shape) -> JPoint:
    z = S.zeros(batch_shape)
    return JPoint(S.ones_mont(batch_shape), S.ones_mont(batch_shape), z)


def is_infinity(p: JPoint):
    return fp.is_zero(S, p.z)


def select_point(mask, a: JPoint | APoint, b: JPoint | APoint):
    """mask ? a : b, elementwise over the batch."""
    if isinstance(a, JPoint):
        return JPoint(
            fp.select(mask, a.x, b.x),
            fp.select(mask, a.y, b.y),
            fp.select(mask, a.z, b.z),
        )
    return APoint(
        fp.select(mask, a.x, b.x),
        fp.select(mask, a.y, b.y),
        jnp.where(mask, a.inf, b.inf),
    )


def _use_pallas() -> bool:
    """Fused Pallas kernels (curve/pallas_g1.py) are EXPERIMENTAL and
    currently disabled: on this hardware the lane-tiled XLA tape path
    (ops/tape.py TAPE_TILE) matches their throughput without the
    minutes-long Mosaic compiles.  Flip via GEMINI_TPU_PALLAS=1."""
    import os

    if os.environ.get("GEMINI_TPU_PALLAS") != "1":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


# Below this many lanes the sequential tape VM costs more than it
# saves: use the flat formula (compiled per tiny shape, cached).  The
# Horner loop and tree-reduction tails live here.
SMALL_BATCH = 64


def _nlanes(p: JPoint) -> int:
    n = 1
    for d in p.x.shape[1:]:
        n *= d
    return n


def _use_flat_small(p: JPoint) -> bool:
    """Flat formulas for tiny batches only on TPU: there the tape VM's
    ~1000 sequential micro-steps cost ~3 ms per op, while the flat
    graph compiles in ~10 s (cached).  On the CPU backend the flat
    compile is ~90 s per shape and the tape runs fine — keep the tape."""
    if _nlanes(p) > SMALL_BATCH:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _double_flat(p: JPoint) -> JPoint:
    """dbl-2009-l with fused unrolled muls (small batches)."""
    mul = lambda a, b: fp.mont_mul_unrolled(S, a, b)
    a = mul(p.x, p.x)
    b = mul(p.y, p.y)
    c = mul(b, b)
    d = _dbl(_sub(mul(_add(p.x, b), _add(p.x, b)), _add(a, c)))
    e = _add(_dbl(a), a)
    f = mul(e, e)
    x3 = _sub(f, _dbl(d))
    c8 = _dbl(_dbl(_dbl(c)))
    y3 = _sub(mul(e, _sub(d, x3)), c8)
    z3 = _dbl(mul(p.y, p.z))
    return JPoint(x3, y3, z3)


def _add_flat(p: JPoint, q: JPoint) -> JPoint:
    """Complete add with fused unrolled muls (small batches)."""
    mul = lambda a, b: fp.mont_mul_unrolled(S, a, b)
    z1z1 = mul(p.z, p.z)
    z2z2 = mul(q.z, q.z)
    u1 = mul(p.x, z2z2)
    u2 = mul(q.x, z1z1)
    s1 = mul(mul(p.y, q.z), z2z2)
    s2 = mul(mul(q.y, p.z), z1z1)
    h = _sub(u2, u1)
    h2 = _dbl(h)
    i = mul(h2, h2)
    j = mul(h, i)
    r = _dbl(_sub(s2, s1))
    v = mul(u1, i)
    x3 = _sub(_sub(mul(r, r), j), _dbl(v))
    y3 = _sub(mul(r, _sub(v, x3)), _dbl(mul(s1, j)))
    zs = _add(p.z, q.z)
    z3 = mul(_sub(mul(zs, zs), _add(z1z1, z2z2)), h)
    out = JPoint(x3, y3, z3)
    same = jnp.logical_and(fp.is_zero(S, h), fp.is_zero(S, r))
    out = select_point(same, _double_flat(p), out)
    out = select_point(is_infinity(p), q, out)
    out = select_point(is_infinity(q), p, out)
    return out


def double(p: JPoint) -> JPoint:
    """dbl-2009-l (2M + 5S).  Maps infinity to infinity and 2-torsion
    (y = 0) to infinity via z3 = 2 y z."""
    if _use_flat_small(p):
        return _double_flat(p)
    if _use_pallas():
        from . import pallas_g1

        return JPoint(*pallas_g1.double(p))
    x3, y3, z3 = tape.run(S, _DBL_PROG, [p.x, p.y, p.z])
    return JPoint(x3, y3, z3)


def add(p: JPoint, q: JPoint) -> JPoint:
    """Complete Jacobian addition (add-2007-bl + doubling fallback +
    identity selects)."""
    if _use_flat_small(p):
        return _add_flat(p, q)
    if _use_pallas():
        from . import pallas_g1

        return JPoint(*pallas_g1.add(p, q))
    x3, y3, z3, h, r, xd, yd, zd = tape.run(
        S, _ADD_PROG, [p.x, p.y, p.z, q.x, q.y, q.z]
    )
    out = JPoint(x3, y3, z3)
    # P == Q (same affine point): h == 0 and r == 0 -> must double.
    same = jnp.logical_and(fp.is_zero(S, h), fp.is_zero(S, r))
    out = select_point(same, JPoint(xd, yd, zd), out)
    # Identity fallbacks.
    out = select_point(is_infinity(p), q, out)
    out = select_point(is_infinity(q), p, out)
    return out


def add_mixed(p: JPoint, q: APoint) -> JPoint:
    """Complete mixed addition (madd-2007-bl, 7M + 4S + selects)."""
    if _use_pallas():
        return add(p, from_affine(q))
    x3, y3, z3, h, r, xd, yd, zd = tape.run(
        S, _MADD_PROG, [p.x, p.y, p.z, q.x, q.y]
    )
    out = JPoint(x3, y3, z3)
    same = jnp.logical_and(fp.is_zero(S, h), fp.is_zero(S, r))
    out = select_point(same, JPoint(xd, yd, zd), out)
    out = select_point(
        is_infinity(p), JPoint(q.x, q.y, S.ones_mont(q.x.shape[1:])), out
    )
    out = select_point(q.inf, p, out)
    return out


def neg(p: JPoint) -> JPoint:
    return JPoint(p.x, fp.neg(S, p.y), p.z)


def to_affine(p: JPoint) -> APoint:
    """Batch normalization: x = X/Z^2, y = Y/Z^3 (Fermat inversion)."""
    zinv = fp.inv(S, p.z)
    zinv2 = _sqr(zinv)
    zinv3 = _mul(zinv2, zinv)
    return APoint(_mul(p.x, zinv2), _mul(p.y, zinv3), is_infinity(p))


def from_affine(a: APoint) -> JPoint:
    one = S.ones_mont(a.x.shape[1:])
    z = fp.select(a.inf, S.zeros(a.x.shape[1:]), one)
    return JPoint(a.x, a.y, z)


def scalar_mul(p: JPoint, k_bits) -> JPoint:
    """Per-element scalar multiplication; k_bits is a (nbits, *batch)
    bool array, LSB first.  Double-and-add via lax.scan."""

    def body(carry, bits):
        acc, base = carry
        added = add(acc, base)
        acc = select_point(bits, added, acc)
        base = double(base)
        return (acc, base), None

    init = (infinity(p.x.shape[1:]), p)
    (acc, _), _ = jax.lax.scan(body, init, k_bits)
    return acc


# ---------------------------------------------------------------------------
# Host <-> device conversion (test/setup paths)
# ---------------------------------------------------------------------------


def encode_affine(points) -> APoint:
    """List of refimpl affine points (or None) -> device APoint batch."""
    xs, ys, infs = [], [], []
    for pt in points:
        if pt is None:
            xs.append(0)
            ys.append(0)
            infs.append(True)
        else:
            xs.append(pt[0])
            ys.append(pt[1])
            infs.append(False)
    return APoint(
        jnp.asarray(S.encode(xs)),
        jnp.asarray(S.encode(ys)),
        jnp.asarray(np.array(infs, dtype=bool)),
    )


def decode_affine(a: APoint):
    """Device APoint batch -> list of refimpl affine points."""
    xs = S.decode(a.x)
    ys = S.decode(a.y)
    infs = np.asarray(a.inf).reshape(-1)
    return [None if i else (x, y) for x, y, i in zip(xs, ys, infs)]


def decode_jacobian(p: JPoint):
    return decode_affine(to_affine(p))
