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
    return (
        x[..., 0::2], y[..., 0::2], z[..., 0::2],
        x[..., 1::2], y[..., 1::2], z[..., 1::2],
    )


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
