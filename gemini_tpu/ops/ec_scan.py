"""Dispatched EC scans for the MSM pipeline.

Compile-cost architecture: the expensive object is the fused EC-add
body (~5k HLO with the unrolled Montgomery multiplies).  Everything
here is arranged so that body compiles ONCE per tile-count T (a few
powers of two, persistently cached) and is *reused* by every scan
level, every window, every MSM size:

  * `mapped_add` — the shared jit: (T, L, TILE) coordinate tuples
    through `lax.map` of the complete Jacobian add.
  * per-level glue (even/odd split, shift, interleave, flip) lives in
    tiny separately-jitted helpers whose compiles are trivial.
  * `inclusive_scan_ec` — the work-efficient odd-even recursion as a
    sequence of top-level dispatches (NOT nested in an outer jit, so
    the shared compiles actually get reused).

Dispatch count is ~2 per level (~45 per scan); dispatches are async
and pipeline behind the compute.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..curve import g1
from ..curve.g1 import JPoint
from ..fields.fp import FQ
from . import tape

TILE = tape.TAPE_TILE
L = FQ.n_limbs


@jax.jit
def _mapped_add_impl(ax, ay, az, bx, by, bz):
    """(T, L, TILE) each -> elementwise complete Jacobian add.

    Body = the tape VM (one compiled Montgomery-multiply step).  A
    fully-unrolled flat body was tried: ~110K HLO ops, >9 min of TPU
    compile per tile shape.  Larger TILEs were tried: HBM register-file
    traffic scales with tile size, so 2^14 lanes (measured ~720 ns/add)
    beats 2^16 (~1.9 us/add).  The remaining ~13x to the compute bound
    needs the Pallas fused path (PERF.md roadmap)."""
    def body(xs):
        p = JPoint(xs[0], xs[1], xs[2])
        q = JPoint(xs[3], xs[4], xs[5])
        o = g1.add(p, q)
        return (o.x, o.y, o.z)

    return jax.lax.map(body, (ax, ay, az, bx, by, bz))


def _tile_for(n: int) -> int:
    """On TPU always TAPE_TILE (one compiled body for everything); on
    CPU (tests) shrink to the batch so tiny combines don't pad out to
    16k wasted lanes."""
    try:
        if jax.default_backend() == "tpu":
            return TILE
    except Exception:
        pass
    m = 1
    while m < n and m < TILE:
        m *= 2
    return m


def _to_tiles(a, npad, tile):
    """(L, *batch) -> (T, L, tile), zero-padded (zeros = infinity:
    inert under the complete add)."""
    a = a.reshape(L, -1)
    n = a.shape[1]
    if npad != n:
        a = jnp.concatenate(
            [a, jnp.zeros((L, npad - n), jnp.uint32)], axis=1
        )
    return a.reshape(L, npad // tile, tile).transpose(1, 0, 2)


def _from_tiles(t, n):
    return t.transpose(1, 0, 2).reshape(L, -1)[:, :n]


def add_points(a, b):
    """Complete add of two (x, y, z) tuples of (L, *batch) arrays via
    the shared tiled kernel; any batch shape."""
    shape = a[0].shape
    n = 1
    for d in shape[1:]:
        n *= d
    tile = _tile_for(n)
    npad = -(-n // tile) * tile
    at = [_to_tiles(v, npad, tile) for v in a]
    bt = [_to_tiles(v, npad, tile) for v in b]
    ox, oy, oz = _mapped_add_impl(*at, *bt)
    return (
        _from_tiles(ox, n).reshape(shape),
        _from_tiles(oy, n).reshape(shape),
        _from_tiles(oz, n).reshape(shape),
    )


@jax.jit
def _eo_split(x, y, z):
    # reshape+transpose instead of stride-2 slices (the stride-2
    # cliff, PERF.md r5) — bit-identical outputs.
    def eo(a):
        *lead, n = a.shape
        t = a.reshape(*lead, n // 2, 2)
        perm = list(range(len(lead))) + [len(lead) + 1, len(lead)]
        t = t.transpose(perm)
        return t[..., 0, :], t[..., 1, :]

    xe, xo = eo(x)
    ye, yo = eo(y)
    ze, zo = eo(z)
    return xe, ye, ze, xo, yo, zo


@jax.jit
def _shift_right(x, y, z):
    """[s0..s_{m-1}] -> [junk, s0..s_{m-2}] (slot 0 discarded later)."""
    f = lambda a: jnp.concatenate([a[..., :1], a[..., :-1]], axis=-1)
    return f(x), f(y), f(z)


@jax.jit
def _interleave_first(evens_first, combined, scanned):
    """out[0::2] = [e0, combined[1:]]; out[1::2] = scanned."""
    ex, ey, ez = evens_first
    cx, cy, cz = combined
    sx, sy, sz = scanned

    def mix(e0, c, s):
        even_out = jnp.concatenate([e0[..., :1], c[..., 1:]], axis=-1)
        st = jnp.stack([even_out, s], axis=-1)
        return st.reshape(*st.shape[:-2], -1)

    return mix(ex, cx, sx), mix(ey, cy, sy), mix(ez, cz, sz)


@jax.jit
def _flip(x, y, z):
    return x[..., ::-1], y[..., ::-1], z[..., ::-1]


def inclusive_scan_ec(elems, reverse: bool = False, combiner=None):
    """Inclusive scan of points (x, y, z) (L, *batch, n) along the
    LAST axis under point addition; n a power of two.  `combiner`
    defaults to the tape-VM Jacobian add; pass
    `pallas_padd_points` for the fused projective TPU path."""
    if combiner is None:
        combiner = add_points
    n = elems[0].shape[-1]
    assert n & (n - 1) == 0
    if reverse:
        elems = _flip(*elems)
        out = inclusive_scan_ec(elems, combiner=combiner)
        return _flip(*out)
    if n == 1:
        return elems
    ex, ey, ez, ox, oy, oz = _eo_split(*elems)
    evens = (ex, ey, ez)
    odds = (ox, oy, oz)
    reduced = combiner(evens, odds)  # scan values at odd positions
    scanned = inclusive_scan_ec(reduced, combiner=combiner)
    if n == 2:
        return _interleave_first(evens, evens, scanned)
    shifted = _shift_right(*scanned)
    combined = combiner(shifted, evens)
    return _interleave_first(evens, combined, scanned)


@jax.jit
def _halves(x, y, z):
    h = x.shape[-1] // 2
    return (
        x[..., :h], y[..., :h], z[..., :h],
        x[..., h:], y[..., h:], z[..., h:],
    )


def tree_reduce(elems, combiner=None):
    """Sum (x, y, z) along the LAST axis -> size 1; power-of-two n."""
    if combiner is None:
        combiner = add_points
    x, y, z = elems
    while x.shape[-1] > 1:
        ax, ay, az, bx, by, bz = _halves(x, y, z)
        x, y, z = combiner((ax, ay, az), (bx, by, bz))
    return x, y, z


def pallas_padd_points(a, b):
    """Complete projective add (RCB) via the fused Pallas kernel —
    the TPU fast path (curve/pallas_g1.py).  Identity is (0 : y : 0),
    y nonzero."""
    from ..curve import pallas_g1

    return pallas_g1.padd(a, b)


def pallas_padd01_points(a, b):
    """Level-0 specialization: both operands (x, y, mask) with
    z ∈ {0, 1} — 9 Montgomery mults instead of 12."""
    from ..curve import pallas_g1

    return pallas_g1.padd01(a, b)


@jax.jit
def _lift01(x, y, m):
    """(x, y, mask) -> projective (x, y, z) with z = mask * 1_mont."""
    live = (m > 0)[None, ...] if m.ndim == x.ndim - 1 else m > 0
    one = FQ.ones_mont(x.shape[1:])
    return x, y, jnp.where(live, one, jnp.zeros_like(one))


def bitrev_levels(n: int, m: int) -> int:
    """Number of reduce-chain levels prefix_sums_at runs from n lanes
    to its stop level for m positions = the bit count the partial
    bit-reversed layout must reverse (callers of rev_bits≠0 MUST
    compute it with this)."""
    s_stop = 1
    while s_stop < m and s_stop < n:
        s_stop *= 2
    lv = 0
    while (n >> lv) > s_stop:
        lv += 1
    return lv


def partial_bitrev_last(a, rb: int):
    """Permute the last axis into the partial bit-reversed layout:
    logical index p = (hi, b_{rb-1}..b_0) lands at storage index
    j = (b_0..b_{rb-1}, hi).  ONE XLA transpose (cheap relayout) —
    applied to the int32 order/key arrays before the coordinate
    gather, never to the 100 MB coordinate planes."""
    if rb <= 0:
        return a
    *batch, n = a.shape
    a = a.reshape(*batch, n >> rb, *([2] * rb))
    nb = len(batch)
    perm = list(range(nb)) + [nb + k for k in range(rb, 0, -1)] + [nb]
    a = a.transpose(perm)
    return a.reshape(*batch, n)


def _stored_index(p, n_k: int, r_k: int):
    """Storage index of logical position p at a reduce-chain level of
    size n_k whose layout still has r_k reversed low bits."""
    if r_k <= 0:
        return p
    shift = n_k.bit_length() - 1 - r_k
    low = p & ((1 << r_k) - 1)
    rev = jnp.zeros_like(p)
    for i in range(r_k):
        rev = rev | (((low >> jnp.int32(i)) & 1) << jnp.int32(r_k - 1 - i))
    return (rev << jnp.int32(shift)) | (p >> jnp.int32(r_k))


def prefix_sums_at(x, y, mask, pos, combiner=None, combiner01=None,
                   rev_bits: int = 0):
    """Inclusive PREFIX sums of points at given positions only.

    x, y: (L, *batch, n); mask: (*batch, n) with z ∈ {0, 1} per lane
    (1 = live, 0 = identity (0 : y : 0)); pos: (*batch, m) int32 in
    [-1, n-1] (-1 ⇒ identity).  Returns (x, y, z) of shape
    (L, *batch, m) where out[..., j] = Σ_{i ≤ pos[j]} P_i.

    The MSM bucket phase needs suffix sums at only 2^(c-1) boundary
    positions, not everywhere: a full scan costs 2n adds, while this
    costs n (reduce chain) + 2s (full scan at the stop level s ≈ m)
    + m per level (walk-down fix-ups) ≈ n + m·log2(n/m) — ~35% fewer
    adds at n = 2^20, m = 2^16.  Level 0 reduces with the cheaper
    z∈{0,1} kernel.

    `rev_bits`: when nonzero, the INPUT lanes are in the partial
    bit-reversed layout (partial_bitrev_last with rb =
    bitrev_levels(n, m) — the caller must use exactly that).  Every
    even/odd level split then becomes a CONTIGUOUS halves split:
    measured 3.9x/8.3x faster than the stride-2 split at 2^20/2^21
    lanes (benches/scancliff.py) — stride-2 slicing was the whole
    "scan-phase cliff" of PERF.md round 4.  After the chain the stop
    level is back in positional order; walk-down gathers translate
    positions with `_stored_index`.

    Walk-down identity: with reduced[k] = P[2k] ⊕ P[2k+1],
      S(p) = S_reduced((p-1)>>1) ⊕ (P[p] if p even else identity),
    and (p-1)>>1 maps -1 to -1 (arithmetic shift), so out-of-range
    stays out-of-range up the chain.
    """
    if combiner is None:
        combiner = pallas_padd_points
    if combiner01 is None:
        combiner01 = pallas_padd01_points
    n = x.shape[-1]
    assert n & (n - 1) == 0
    m = pos.shape[-1]
    s_stop = 1
    while s_stop < m and s_stop < n:
        s_stop *= 2
    if rev_bits:
        assert rev_bits == bitrev_levels(n, m), (rev_bits, n, m)

    # Reduce chain (keeping each level for the walk-down).
    levels = []  # (x, y, z-or-mask, is01)
    cx, cy, cz = x, y, mask
    is01 = True
    while cx.shape[-1] > s_stop:
        levels.append((cx, cy, cz, is01))
        if rev_bits:
            h = cx.shape[-1] // 2
            ex, ox_ = cx[..., :h], cx[..., h:]
            ey, oy_ = cy[..., :h], cy[..., h:]
            ez, oz_ = cz[..., :h], cz[..., h:]
        else:
            ex, ox_ = cx[..., 0::2], cx[..., 1::2]
            ey, oy_ = cy[..., 0::2], cy[..., 1::2]
            ez, oz_ = cz[..., 0::2], cz[..., 1::2]
        if is01:
            cx, cy, cz = combiner01((ex, ey, ez), (ox_, oy_, oz_))
        else:
            cx, cy, cz = combiner((ex, ey, ez), (ox_, oy_, oz_))
        is01 = False

    # Full inclusive prefix scan at the stop level.
    if is01:
        cx, cy, cz = _lift01(cx, cy, cz)
    sx, sy, sz = inclusive_scan_ec((cx, cy, cz), combiner=combiner)

    # Positions per level.
    poss = [pos]
    for _ in levels:
        poss.append((poss[-1] - 1) >> 1)

    # Advanced-indexing gather (same lowering family as the original
    # boundary gather): a (L, *batch, n)[:, w, idx[w]] -> (L, *batch, m).
    batch_shape = pos.shape[:-1]

    def gather_last(a, idx):
        if not batch_shape:
            return a[:, idx]
        assert len(batch_shape) == 1
        warr = jnp.arange(batch_shape[0])[:, None]
        return a[:, warr, idx]

    top = poss[-1]
    topc = jnp.maximum(top, 0)
    live = top >= 0
    rx = jnp.where(live, gather_last(sx, topc), 0)
    ry = jnp.where(live, gather_last(sy, topc), FQ.ones_mont(top.shape))
    rz = jnp.where(live, gather_last(sz, topc), 0)

    # Walk down: add P_level[p] where p is even and the lane is live.
    # Positions are logical; under the partial bit-reversed layout the
    # gather index is translated per level (level k of the `levels`
    # list has r_k = rev_bits - k reversed bits left).
    one = FQ.ones_mont(pos.shape)
    for k, ((lx, ly, lz, l01), p) in enumerate(
            zip(reversed(levels), reversed(poss[:-1]))):
        pc = jnp.maximum(p, 0)
        even = jnp.logical_and(p >= 0, p % 2 == 0)
        lev_idx = len(levels) - 1 - k  # index into the original chain
        sidx = _stored_index(pc, lx.shape[-1],
                             rev_bits - lev_idx if rev_bits else 0)
        gxv = gather_last(lx, sidx)
        gyv = gather_last(ly, sidx)
        if l01:
            if batch_shape:
                gl = lz[jnp.arange(batch_shape[0])[:, None], sidx]
            else:
                gl = lz[sidx]
            gzv = jnp.where(jnp.logical_and(gl, even)[None], one, 0)
        else:
            gzv = jnp.where(even[None], gather_last(lz, sidx), 0)
        opx = jnp.where(even[None], gxv, 0)
        rx, ry, rz = combiner((rx, ry, rz), (opx, gyv, gzv))
    return rx, ry, rz
