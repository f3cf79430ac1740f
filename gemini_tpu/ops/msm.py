"""Multi-scalar multiplication (Pippenger) as a TPU-native pipeline.

The reference's MSM is bucket-scatter Pippenger on CPU threads
(algorithm documented at /root/reference/src/kzg/msm/variable_base.rs,
superseded upstream; SURVEY.md §3.5).  Data-dependent scatter-adds
serialize badly on vector hardware, so this implementation reformulates
bucket accumulation as fully-parallel primitives:

  per window:
    1. digit extraction         (elementwise bit slicing on limb vectors)
    2. argsort by digit         (XLA sort, N log N on int keys)
    3. gather points            (one (L, N) gather)
    4. segmented inclusive scan (jax.lax.associative_scan with the
                                 *complete* Jacobian add as combiner and
                                 segment-reset flags -> bucket totals at
                                 segment ends; ~2N point-adds, log depth)
    5. boundary scatter         (pure data movement into the 2^c table)
    6. suffix scan + tree sum   (sum_j j * bucket_j via reverse
                                 associative scan; ~3 * 2^c point-adds)
  then a Horner combine over windows (c doublings per window).

Total ~2N + 3*2^c point-adds per window, all in (L, lanes) layout.
Scalars enter in canonical (non-Montgomery) limb form; points as affine
with infinity masks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import fp
from ..fields.fp import FQ, FR
from ..curve import g1
from ..curve.g1 import APoint, JPoint
from . import scan as scan_util

LIMB_BITS = fp.LIMB_BITS


def default_window(n: int) -> int:
    """Pick the window size c: 2^c buckets should stay well under the
    point count so bucket-phase work doesn't dominate."""
    if n <= 32:
        return 3
    c = max(3, int(np.log2(max(n, 2))) - 3)
    return min(16, c)


def extract_digits(scalars: jnp.ndarray, c: int, n_bits: int = 255):
    """(L, N) canonical limbs -> (W, N) uint32 window digits, W windows
    of c bits, little-endian windows."""
    L = scalars.shape[0]
    n_windows = -(-n_bits // c)
    digits = []
    mask = jnp.uint32((1 << c) - 1)
    for w in range(n_windows):
        bit0 = w * c
        limb, off = divmod(bit0, LIMB_BITS)
        d = scalars[limb] >> jnp.uint32(off)
        rem = LIMB_BITS - off  # bits obtained from this limb
        if rem < c and limb + 1 < L:
            d = d | (scalars[limb + 1] << jnp.uint32(rem))
        digits.append(d & mask)
    return jnp.stack(digits, axis=0)


@jax.jit
def _seg_scan_combine(a, b):
    """Segmented-sum monoid: (v1,f1) . (v2,f2) =
    (f2 ? v2 : v1+v2, f1|f2)."""
    pa = JPoint(a["x"], a["y"], a["z"])
    pb = JPoint(b["x"], b["y"], b["z"])
    s = g1.add(pa, pb)
    start_b = b["flag"][0]
    out = g1.select_point(start_b, pb, s)
    return dict(
        x=out.x, y=out.y, z=out.z, flag=a["flag"] | b["flag"]
    )


_add_jit = jax.jit(lambda a, b: tuple(g1.add(JPoint(*a), JPoint(*b))))
_double_jit = jax.jit(lambda p: tuple(g1.double(JPoint(*p))))


def _tree_reduce_add(p: JPoint) -> JPoint:
    """Sum a (L, N) batch of Jacobian points to a single (L, 1) point
    by halving; N need not be a power of two."""
    while p.x.shape[1] > 1:
        n = p.x.shape[1]
        half = (n + 1) // 2
        if n % 2:
            inf = g1.infinity((1,))
            p = JPoint(
                jnp.concatenate([p.x, inf.x], axis=1),
                jnp.concatenate([p.y, inf.y], axis=1),
                jnp.concatenate([p.z, inf.z], axis=1),
            )
        lo = (p.x[:, :half], p.y[:, :half], p.z[:, :half])
        hi = (p.x[:, half:], p.y[:, half:], p.z[:, half:])
        p = JPoint(*_add_jit(lo, hi))
    return p


@partial(jax.jit, static_argnums=(2,))
def _prepare_window(points: APoint, dig, c: int):
    """Sort by digit, build segment flags, and compute the scan input
    plus the segment-end scatter indices (all data movement)."""
    n = points.x.shape[1]
    n_buckets = 1 << c
    order = jnp.argsort(dig)
    sd = dig[order]
    px = points.x[:, order]
    py = points.y[:, order]
    pz_one = FQ.ones_mont((n,))
    pz = fp.select(points.inf[order], FQ.zeros((n,)), pz_one)
    # zero digits contribute nothing: treat as infinity so the segment
    # machinery never adds them (bucket 0 is discarded anyway).
    pz = fp.select(sd == 0, FQ.zeros((n,)), pz)
    head = jnp.concatenate([jnp.ones((1,), jnp.bool_), sd[1:] != sd[:-1]])
    is_end = jnp.concatenate([sd[1:] != sd[:-1], jnp.ones((1,), jnp.bool_)])
    idx = jnp.where(is_end, sd, n_buckets)
    return dict(x=px, y=py, z=pz, flag=head[None, :]), idx


@partial(jax.jit, static_argnums=(2,))
def _scatter_buckets(scanned, idx, c: int):
    """Segment totals -> dense (2^c - 1)-entry bucket table (drops
    bucket 0 and the overflow slot); empty buckets stay at infinity."""
    n_buckets = 1 << c
    tbl = [
        jnp.zeros((FQ.n_limbs, n_buckets + 1), jnp.uint32).at[:, idx]
        .set(scanned[k], mode="drop")[:, 1:n_buckets]
        for k in ("x", "y", "z")
    ]
    return JPoint(*tbl)


def _one_window(points: APoint, dig, c: int) -> JPoint:
    elems, idx = _prepare_window(points, dig, c)
    scanned = scan_util.inclusive_scan(_seg_scan_combine, elems, axis=1)
    buckets = _scatter_buckets(scanned, idx, c)
    # pad the (2^c - 1)-entry table with one infinity so the suffix
    # scan runs at power-of-two shapes (identity at the tail is a
    # no-op for suffix sums).
    inf = g1.infinity((1,))
    padded = (
        jnp.concatenate([buckets.x, inf.x], axis=1),
        jnp.concatenate([buckets.y, inf.y], axis=1),
        jnp.concatenate([buckets.z, inf.z], axis=1),
    )
    # suffix sums S_k = sum_{j>=k} bucket_j; window total =
    # sum_k S_k = sum_j j*bucket_j.
    suffix = scan_util.inclusive_scan(_add_jit, padded, axis=1, reverse=True)
    return _tree_reduce_add(JPoint(*suffix))


def _horner_combine(window_totals: list[JPoint], c: int) -> JPoint:
    """acc = 2^c * acc + window, from the top window down; (L, 1)
    batches, cached jitted double/add kernels."""
    acc = tuple(window_totals[-1])
    for wpt in reversed(window_totals[:-1]):
        for _ in range(c):
            acc = _double_jit(acc)
        acc = _add_jit(acc, tuple(wpt))
    return JPoint(*acc)


def msm(points: APoint, scalars: jnp.ndarray, c: int | None = None,
        n_bits: int = 255) -> JPoint:
    """MSM over G1: sum_i scalars[i] * points[i].

    points: APoint batch (N,); scalars: (FR_LIMBS, N) canonical
    (non-Montgomery) limbs.  Returns a JPoint with batch shape (1,).
    """
    n = points.x.shape[1]
    if c is None:
        c = default_window(n)
    # Pad to a power of two with (infinity, 0) pairs — a mathematical
    # no-op that keeps every scan level at a power-of-two shape (one
    # combiner compile per size, ever; see ops/scan.py).
    npad = scan_util.next_pow2(n)
    if npad != n:
        pad = npad - n
        points = APoint(
            jnp.concatenate(
                [points.x, jnp.zeros((FQ.n_limbs, pad), jnp.uint32)], axis=1),
            jnp.concatenate(
                [points.y, jnp.zeros((FQ.n_limbs, pad), jnp.uint32)], axis=1),
            jnp.concatenate([points.inf, jnp.ones((pad,), bool)]),
        )
        scalars = jnp.concatenate(
            [scalars, jnp.zeros((FR.n_limbs, pad), jnp.uint32)], axis=1
        )
    digits = extract_digits(scalars, c, n_bits)
    windows = [
        _one_window(points, digits[w], c) for w in range(digits.shape[0])
    ]
    return _horner_combine(windows, c)


def msm_mont_scalars(points: APoint, scalars_mont: jnp.ndarray,
                     c: int | None = None) -> JPoint:
    """MSM taking Montgomery-form Fr scalars (the prover's native form)."""
    return msm(points, fp.from_mont(FR, scalars_mont), c)
