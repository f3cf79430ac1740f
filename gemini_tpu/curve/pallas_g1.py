"""Pallas TPU kernels for the G1 group law — the speed-of-light path.

Why this exists: the XLA-level field ops in fields/fp.py express the
Montgomery CIOS multiply as a `lax.scan`, whose (L+1, batch) carry is
materialized in HBM once the batch exceeds VMEM — 24 HBM round trips
of the whole accumulator per multiply, which made large MSMs bandwidth-
bound (~40 s at 2^20).  Here each group-law formula is ONE Pallas
kernel: the grid tiles the lane axis, every intermediate lives in
VMEM, and HBM traffic is exactly the kernel inputs and outputs.

Kernel bodies are kept COMPACT (important: Mosaic compile time scales
with op count — a fully unrolled formula was ~8k ops and 200 s of
compile): the CIOS multiply, carry propagation, and borrow chains all
run as `fori_loop`s whose dynamic row indexing goes through small VMEM
scratch refs (values can't be dynamically sliced in Mosaic, refs can).

Kernels are complete (identity/equal/negative inputs handled by
in-kernel selects) so they can serve as associative-scan combiners.

Used automatically by curve/g1.py when the default backend is TPU;
the XLA tape path (ops/tape.py) remains the CPU/test path, and the two
are asserted bit-identical on the TPU gate test (run on real hardware).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.fp import FQ

L = FQ.n_limbs  # 24
TILE = 512
MASK = 0xFFFF  # Python int: in-kernel use without becoming a captured const

# Field constants travel as one (L+1, 128) uint32 kernel input (Pallas
# kernels may not capture array constants): rows 0..L-1 = modulus
# limbs, row L lane 0 = n0inv.
_CONSTS = np.zeros((L + 1, 128), dtype=np.uint32)
_CONSTS[:L, :] = FQ.mod_limbs.reshape(L, 1)
_CONSTS[L, :] = FQ.n0inv


def _shift_down(t, k=1):
    """Drop k leading rows, append k zero rows (value >> 16k limbs)."""
    zero = jnp.zeros((k, t.shape[1]), jnp.uint32)
    return jnp.concatenate([t[k:], zero], axis=0)


def _shift_up(t, k=1):
    zero = jnp.zeros((k, t.shape[1]), jnp.uint32)
    return jnp.concatenate([zero, t[:-k]], axis=0)


def _ckla(s):
    """Exact carry resolution for rows s with s < 2^17 (at most one
    outgoing carry per row): Kogge-Stone over (generate, propagate)
    pairs, log2(rows) rounds, fully vectorized — no sequential chains.

    Returns rows < 2^16 of the same count; the final carry-out is
    folded into an appended row by callers that need it.
    """
    k = s.shape[0]
    low = s & MASK
    g = s >> 16  # 0/1 generate
    p = (low == MASK).astype(jnp.uint32)  # propagate
    # carry into row i+1 = g_i | (p_i & c_i); prefix with Kogge-Stone
    # over the (g, p) semigroup: (g2, p2) . (g1, p1) = (g2|p2&g1, p2&p1)
    G, P = g, p
    d = 1
    while d < k:
        Gs = _shift_up(G, d)
        Ps = _shift_up(P, d)
        G = G | (P & Gs)
        P = P & Ps
        d *= 2
    c = _shift_up(G, 1)  # carry INTO each row
    return (low + c) & MASK, G[k - 1: k] | 0  # (rows, carry-out row)


class _F:
    """In-kernel field helpers on (L, TILE) uint32 values; everything
    vectorized (rotates + log-depth carry lookahead), no scratch, no
    dynamic indexing — the Mosaic-fast subset."""

    def __init__(self, consts_ref):
        self.q = consts_ref[:L, :1]  # (L, 1) value
        self.n0 = consts_ref[L, 0]

    # -- Montgomery multiply ------------------------------------------------

    def mm(self, a, b):
        q, n0 = self.q, self.n0
        zero_row = jnp.zeros((1, a.shape[1]), jnp.uint32)

        def body(i, carry):
            a_rot, t = carry
            ai = a_rot[:1]  # current limb of a (row 0 after rotation)
            a_rot = pltpu.roll(a_rot, L - 1, 0)  # == roll by -1 on L rows
            p = ai * b
            t = (
                t
                + jnp.concatenate([p & MASK, zero_row], axis=0)
                + jnp.concatenate([zero_row, p >> 16], axis=0)
            )
            m = (t[0] * n0) & MASK
            p2 = m[None, :] * q
            t = (
                t
                + jnp.concatenate([p2 & MASK, zero_row], axis=0)
                + jnp.concatenate([zero_row, p2 >> 16], axis=0)
            )
            carry0 = t[:1] >> 16
            t = jnp.concatenate([t[1:2] + carry0, t[2:], zero_row], axis=0)
            return (a_rot, t)

        t0 = jnp.zeros((L + 1, a.shape[1]), jnp.uint32)
        _, t = jax.lax.fori_loop(0, L, body, (a, t0), unroll=False)
        # rows < 2^23: two-step exact normalization.  First shift-add
        # (rows -> < 2^16 + 2^7), then carry-lookahead.  Value < 2p, so
        # the >= 2^(16L) part lands entirely in normalized row L.
        s = (t & MASK) + _shift_up(t >> 16, 1)
        rows, _cout = _ckla(s)  # L+1 rows; row L in {0, 1}
        return self._cond_sub(rows[:L], force=rows[L] > 0)

    def _cond_sub(self, rows, force=None):
        """Reduce value < 2p into [0, p): subtract q unless it borrows
        (or unconditionally where `force` (TILE,) is set)."""
        diff, borrow = self._sub(rows, self.q)
        take = borrow == 0  # (TILE,)
        if force is not None:
            take = jnp.logical_or(take, force)
        return jnp.where(take[None, :], diff, rows)

    def _sub(self, a, b):
        """a - b mod 2^(16L) via complement-add + lookahead; returns
        (diff rows, borrow (TILE,) in {0,1})."""
        t = a + (MASK - b)  # rows < 2^17
        one = jnp.concatenate(
            [jnp.ones((1, a.shape[1]), jnp.uint32),
             jnp.zeros((L - 1, a.shape[1]), jnp.uint32)], axis=0
        )
        t = t + one
        rows, cout = _ckla(t)
        return rows, jnp.uint32(1) - cout[0]

    # -- add / sub ----------------------------------------------------------

    def fadd(self, a, b):
        rows, cout = _ckla(a + b)
        return self._cond_sub(rows, force=cout[0] > 0)

    def fdbl(self, a):
        return self.fadd(a, a)

    def fsub(self, a, b):
        diff, borrow = self._sub(a, b)
        # if borrowed, add q back (a < b case)
        qfix = jnp.where((borrow > 0)[None, :], self.q * jnp.uint32(1), 0)
        rows, cout = _ckla(diff + qfix.astype(jnp.uint32))
        return rows


def _is_zero(a):
    return jnp.all(a == 0, axis=0)  # (TILE,)


def _sel(mask, a, b):
    return jnp.where(mask[None, :], a, b)


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


def _add_kernel(k, x1, y1, z1, x2, y2, z2, ox, oy, oz):
    F = _F(k)
    x3, y3, z3 = _add_core(F, x1[:], y1[:], z1[:], x2[:], y2[:], z2[:])
    ox[:] = x3
    oy[:] = y3
    oz[:] = z3


def _dbl_kernel(k, x1, y1, z1, ox, oy, oz):
    F = _F(k)
    x3, y3, z3 = _dbl_core(F, x1[:], y1[:], z1[:])
    ox[:] = x3
    oy[:] = y3
    oz[:] = z3


def _seg_kernel(k, x1, y1, z1, f1, x2, y2, z2, f2, ox, oy, oz, of):
    """Segmented-sum combiner: (v1,f1).(v2,f2) =
    (f2 ? v2 : v1+v2, f1|f2); flags are (8, TILE) u32 0/1 planes."""
    F = _F(k)
    x3, y3, z3 = _add_core(F, x1[:], y1[:], z1[:], x2[:], y2[:], z2[:])
    start_b = f2[0] != 0  # (TILE,)
    ox[:] = _sel(start_b, x2[:], x3)
    oy[:] = _sel(start_b, y2[:], y3)
    oz[:] = _sel(start_b, z2[:], z3)
    of[:] = f1[:] | f2[:]


def _coord_spec():
    return pl.BlockSpec((L, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)


def _const_spec():
    return pl.BlockSpec((L + 1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)


def _flag_spec():
    return pl.BlockSpec((8, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)


def _consts():
    return jnp.asarray(_CONSTS)


def _coord_out(n):
    return jax.ShapeDtypeStruct((L, n), jnp.uint32)


def _pad_lanes(a, n_pad):
    if a.shape[-1] == n_pad:
        return a
    pad = [(0, 0)] * (a.ndim - 1) + [(0, n_pad - a.shape[-1])]
    return jnp.pad(a, pad)


def _flatten(a):
    """(L, *batch) -> (L, prod(batch)); returns array and batch shape."""
    return a.reshape(a.shape[0], -1), a.shape[1:]


def add(p, q):
    """Complete Jacobian add on (L, *batch) coords via one kernel."""
    x1, batch = _flatten(p.x)
    y1, _ = _flatten(p.y)
    z1, _ = _flatten(p.z)
    x2, _ = _flatten(q.x)
    y2, _ = _flatten(q.y)
    z2, _ = _flatten(q.z)
    n = x1.shape[1]
    npad = -(-n // TILE) * TILE
    ins = [_pad_lanes(a, npad) for a in (x1, y1, z1, x2, y2, z2)]
    grid = npad // TILE
    ox, oy, oz = pl.pallas_call(
        _add_kernel,
        grid=(grid,),
        in_specs=[_const_spec()] + [_coord_spec()] * 6,
        out_specs=[_coord_spec()] * 3,
        out_shape=[_coord_out(npad)] * 3,
    )(_consts(), *ins)
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
    npad = -(-n // TILE) * TILE
    ins = [_pad_lanes(a, npad) for a in (x1, y1, z1)]
    grid = npad // TILE
    ox, oy, oz = pl.pallas_call(
        _dbl_kernel,
        grid=(grid,),
        in_specs=[_const_spec()] + [_coord_spec()] * 3,
        out_specs=[_coord_spec()] * 3,
        out_shape=[_coord_out(npad)] * 3,
    )(_consts(), *ins)
    shape = (L, *batch)
    return (
        ox[:, :n].reshape(shape),
        oy[:, :n].reshape(shape),
        oz[:, :n].reshape(shape),
    )


def seg_combine(a: dict, b: dict):
    """Pallas version of the MSM segmented-scan combiner.  Dicts carry
    x/y/z (L, *batch) and flag (1, *batch) bool."""
    x1, batch = _flatten(a["x"])
    n = x1.shape[1]
    npad = -(-n // TILE) * TILE

    def prep_flag(f):
        fl = f.reshape(1, -1).astype(jnp.uint32)
        fl = jnp.broadcast_to(fl, (8, fl.shape[1]))
        return _pad_lanes(fl, npad)

    ins = [
        _pad_lanes(_flatten(a["x"])[0], npad),
        _pad_lanes(_flatten(a["y"])[0], npad),
        _pad_lanes(_flatten(a["z"])[0], npad),
        prep_flag(a["flag"]),
        _pad_lanes(_flatten(b["x"])[0], npad),
        _pad_lanes(_flatten(b["y"])[0], npad),
        _pad_lanes(_flatten(b["z"])[0], npad),
        prep_flag(b["flag"]),
    ]
    grid = npad // TILE
    ox, oy, oz, of = pl.pallas_call(
        _seg_kernel,
        grid=(grid,),
        in_specs=[_const_spec()]
        + [_coord_spec(), _coord_spec(), _coord_spec(), _flag_spec()] * 2,
        out_specs=[_coord_spec(), _coord_spec(), _coord_spec(), _flag_spec()],
        out_shape=[_coord_out(npad)] * 3
        + [jax.ShapeDtypeStruct((8, npad), jnp.uint32)],
    )(_consts(), *ins)
    shape = (L, *batch)
    return dict(
        x=ox[:, :n].reshape(shape),
        y=oy[:, :n].reshape(shape),
        z=oz[:, :n].reshape(shape),
        flag=(of[0, :n] != 0).reshape((1, *batch)),
    )
