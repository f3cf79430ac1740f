"""Multi-scalar multiplication (Pippenger) as a TPU-native pipeline.

The reference's MSM is bucket-scatter Pippenger on CPU threads
(algorithm documented at /root/reference/src/kzg/msm/variable_base.rs,
superseded upstream; SURVEY.md §3.5).  Data-dependent scatter-adds
serialize badly on vector hardware, so bucket accumulation uses the
threshold-suffix identity instead:

    sum_i d_i P_i = sum_{k=1}^{2^c-1} ( sum_{i: d_i >= k} P_i )

With points sorted by digit, each inner sum is one entry of the
suffix-sum array, so per window the bucket phase is one plain-add
suffix scan over sorted points (~2N complete Jacobian adds) + a
2^c-entry gather + a tree reduction — no segment flags, no scatter.

Orchestration (see ops/ec_scan.py for the compile-cost rationale):
windows are processed in chunks of WINDOW_CHUNK as a batch axis; the
scan/reduction phases are top-level dispatches reusing ONE compiled
tiled-add kernel; the final Horner combine

    result = sum_w 2^(c*w) T_w

runs as a single 255-step `fori_loop` kernel of flat double+add
(batch-1 EC ops use the fused flat formulas, curve/g1.py SMALL_BATCH).

Scalars enter in canonical (non-Montgomery) limb form; points as
affine with infinity masks.
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
from . import ec_scan
from . import scan as scan_util

LIMB_BITS = fp.LIMB_BITS

# Windows per batch: bounds peak memory (suffix scan holds ~6x
# (L, Wc, N) uint32 live: ~2.4 GB at Wc=4, N=2^20).
WINDOW_CHUNK = 4


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
def _sort_gather(px, py, pinf, digits):
    """Sort each window's points by digit.

    px/py: (L, N); pinf: (N,); digits: (Wc, N).
    Returns gx, gy, gz (L, Wc, N) Jacobian coords (z = 0 for infinity
    or digit-0 points) and sd (Wc, N) sorted digits.
    """
    Wc, n = digits.shape
    order = jnp.argsort(digits, axis=1)
    sd = jnp.take_along_axis(digits, order, axis=1)
    gx = px[:, order]
    gy = py[:, order]
    ginf = pinf[order]
    z_one = FQ.ones_mont((Wc, n))
    gz = fp.select(ginf, FQ.zeros((Wc, n)), z_one)
    gz = fp.select(sd == 0, FQ.zeros((Wc, n)), gz)
    return gx, gy, gz, sd


@partial(jax.jit, static_argnums=(4,))
def _gather_boundaries(sx, sy, sz, sd, c: int):
    """Suffix sums at threshold boundaries: entry k-1 holds
    sum_{d_i >= k} P_i for k = 1..2^c-1, padded to 2^c with infinity."""
    Wc, n = sd.shape
    n_buckets = 1 << c
    # append empty-suffix (infinity) at index n
    inf_col = jnp.zeros((FQ.n_limbs, Wc, 1), jnp.uint32)
    sx = jnp.concatenate([sx, inf_col], axis=2)
    sy = jnp.concatenate([sy, inf_col], axis=2)
    sz = jnp.concatenate([sz, inf_col], axis=2)
    ks = jnp.arange(1, n_buckets, dtype=jnp.uint32)
    boundaries = jax.vmap(
        lambda row: jnp.searchsorted(row, ks, side="left")
    )(sd)  # (Wc, 2^c - 1)
    warr = jnp.arange(Wc)[:, None]
    bx = sx[:, warr, boundaries]
    by = sy[:, warr, boundaries]
    bz = sz[:, warr, boundaries]
    inf1 = jnp.zeros((FQ.n_limbs, Wc, 1), jnp.uint32)
    return (
        jnp.concatenate([bx, inf1], axis=2),
        jnp.concatenate([by, inf1], axis=2),
        jnp.concatenate([bz, inf1], axis=2),
    )


@partial(jax.jit, static_argnums=(1, 2))
def _horner_kernel(totals, c: int, n_bits: int):
    """result = sum_w 2^(c*w) * T_w via one fori_loop of
    double + (conditional) add; totals: (L, W) x/y/z tuple."""
    tx, ty, tz = totals
    W = tx.shape[1]
    top_bit = c * (W - 1)

    # acc starts at T_{W-1}; for bit b from top_bit-1 down to 0:
    # acc = 2*acc; if b % c == 0: acc += T_{b//c}.
    acc = (tx[:, -1:], ty[:, -1:], tz[:, -1:])

    def loop_body(i, acc):
        b = top_bit - 1 - i
        d = g1.double(JPoint(*acc))
        w = b // c
        is_window = (b % c) == 0
        tw = (
            jax.lax.dynamic_slice_in_dim(tx, w, 1, axis=1),
            jax.lax.dynamic_slice_in_dim(ty, w, 1, axis=1),
            jax.lax.dynamic_slice_in_dim(tz, w, 1, axis=1),
        )
        # identity when not at a window boundary
        tw = JPoint(
            tw[0], tw[1],
            jnp.where(is_window, tw[2], jnp.zeros_like(tw[2])),
        )
        out = g1.add(d, tw)
        return (out.x, out.y, out.z)

    acc = jax.lax.fori_loop(0, top_bit, loop_body, acc)
    return acc


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
    # no-op that keeps every scan level at a power-of-two shape.
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
            [scalars, jnp.zeros((scalars.shape[0], pad), jnp.uint32)], axis=1
        )
    digits = extract_digits(scalars, c, n_bits)
    W = digits.shape[0]
    tx, ty, tz = [], [], []
    for w0 in range(0, W, WINDOW_CHUNK):
        chunk = digits[w0: w0 + WINDOW_CHUNK]
        if chunk.shape[0] < WINDOW_CHUNK:  # keep one compiled shape
            fill = jnp.zeros(
                (WINDOW_CHUNK - chunk.shape[0], chunk.shape[1]), jnp.uint32
            )
            chunk = jnp.concatenate([chunk, fill], axis=0)
        gx, gy, gz, sd = _sort_gather(
            points.x, points.y, points.inf, chunk
        )
        suffix = ec_scan.inclusive_scan_ec((gx, gy, gz), reverse=True)
        bx, by, bz = _gather_boundaries(*suffix, sd, c)
        x, y, z = ec_scan.tree_reduce((bx, by, bz))
        tx.append(x[..., 0])
        ty.append(y[..., 0])
        tz.append(z[..., 0])
    totals = (
        jnp.concatenate(tx, axis=1)[:, :W],
        jnp.concatenate(ty, axis=1)[:, :W],
        jnp.concatenate(tz, axis=1)[:, :W],
    )
    acc = _horner_kernel(totals, c, n_bits)
    return JPoint(*acc)


def msm_mont_scalars(points: APoint, scalars_mont: jnp.ndarray,
                     c: int | None = None) -> JPoint:
    """MSM taking Montgomery-form Fr scalars (the prover's native form)."""
    return msm(points, fp.from_mont(FR, scalars_mont), c)
