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


def default_window(n: int, n_bits: int = 255) -> int:
    """Pick the window size c minimizing the pipeline's add count.

    Per window-chunk the suffix scan costs ~2·Wc·n adds and the bucket
    tree-reduce ~2·Wc·2^c, and chunks = ceil(W / Wc) with
    W = ceil(n_bits / c) — so minimize ceil(W/Wc)·(n + 2^c).  Computed
    per padded bucket size, so each bucket compiles one pipeline."""
    if n <= 32:
        return 3
    best_c, best_cost = 3, float("inf")
    for c in range(4, 21):
        w = -(-n_bits // c)
        cost = -(-w // WINDOW_CHUNK) * (n + (1 << c))
        if cost < best_cost:
            best_c, best_cost = c, cost
    return best_c


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


def _horner_host(totals_jac, c: int) -> JPoint:
    """result = sum_w 2^(c*w) * T_w, combined on HOST.

    The window totals are O(W) points — reading them back costs ~3 KB
    while the device Horner alternative (a fori_loop of ~255 tape-VM
    double+adds) was the single worst compile in the whole MSM (tens of
    minutes cold on TPU, per distinct W).  Host cost: c*(W-1) affine
    doublings ≈ sub-millisecond, overlapped with nothing — the rest of
    the pipeline has already drained by the time totals are real."""
    from ..refimpl import g1_add, g1_double

    pts = g1.decode_jacobian(JPoint(*totals_jac))
    acc = None
    for w in reversed(range(len(pts))):
        if acc is not None:
            for _ in range(c):
                acc = g1_double(acc)
        acc = g1_add(acc, pts[w])
    one = FQ.ones_mont((1,))
    if acc is None:
        return JPoint(FQ.zeros((1,)), one, FQ.zeros((1,)))
    ap = g1.encode_affine([acc])
    return JPoint(jnp.asarray(ap.x), jnp.asarray(ap.y), one)


@jax.jit
def _sort_gather_proj(px, py, pinf, digits):
    """Sort each window's points by digit, emitting PROJECTIVE coords
    for the RCB pipeline: dead lanes (infinity or digit 0) become the
    identity (0 : y : 0) with y nonzero (projective scaling makes any
    nonzero y valid)."""
    Wc, n = digits.shape
    order = jnp.argsort(digits, axis=1)
    sd = jnp.take_along_axis(digits, order, axis=1)
    gx = px[:, order]
    gy = py[:, order]
    ginf = pinf[order]
    one = FQ.ones_mont((Wc, n))
    dead = jnp.logical_or(ginf, sd == 0)
    x = fp.select(dead, FQ.zeros((Wc, n)), gx)
    y = fp.select(ginf, one, gy)
    z = fp.select(dead, FQ.zeros((Wc, n)), one)
    return x, y, z, sd


@partial(jax.jit, static_argnums=(4,))
def _gather_boundaries_proj(sx, sy, sz, sd, c: int):
    """Suffix sums at threshold boundaries (projective): empty-suffix
    padding is the identity (0 : 1 : 0)."""
    Wc, n = sd.shape
    n_buckets = 1 << c
    zero_col = jnp.zeros((FQ.n_limbs, Wc, 1), jnp.uint32)
    one_col = FQ.ones_mont((Wc, 1))
    sx = jnp.concatenate([sx, zero_col], axis=2)
    sy = jnp.concatenate([sy, one_col], axis=2)
    sz = jnp.concatenate([sz, zero_col], axis=2)
    ks = jnp.arange(1, n_buckets, dtype=jnp.uint32)
    boundaries = jax.vmap(
        lambda row: jnp.searchsorted(row, ks, side="left")
    )(sd)
    warr = jnp.arange(Wc)[:, None]
    bx = sx[:, warr, boundaries]
    by = sy[:, warr, boundaries]
    bz = sz[:, warr, boundaries]
    return (
        jnp.concatenate([bx, zero_col], axis=2),
        jnp.concatenate([by, one_col], axis=2),
        jnp.concatenate([bz, zero_col], axis=2),
    )


@jax.jit
def _proj_to_jacobian(x, y, z):
    """(X : Y : Z) -> Jacobian (XZ, YZ^2, Z) (agree whenever Z != 0;
    both encode infinity as Z == 0)."""
    xz = fp.mont_mul(FQ, x, z)
    z2 = fp.mont_mul(FQ, z, z)
    yz2 = fp.mont_mul(FQ, y, z2)
    return xz, yz2, z


def _use_proj() -> bool:
    """Fused Pallas projective pipeline: default on TPU, off elsewhere
    (the Mosaic kernels only build for TPU)."""
    import os

    if os.environ.get("GEMINI_TPU_PROJ") == "0":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


@partial(jax.jit, static_argnums=(4, 5))
def _window_chunk(px, py, pinf, chunk, c: int, use_proj: bool):
    """One window-chunk of the Pippenger pipeline as a SINGLE jitted
    computation: sort-by-digit, suffix scan, boundary gather, bucket
    tree-reduce.  Fusing the whole chunk keeps the scan's glue ops
    (splits/concats/interleaves) out of the per-op dispatch path — at
    2^20 the unfused pipeline was ~10^3 tunnel dispatches per MSM and
    dispatch-bound, not compute-bound."""
    if use_proj:
        combiner = ec_scan.pallas_padd_points
        gx, gy, gz, sd = _sort_gather_proj(px, py, pinf, chunk)
        suffix = ec_scan.inclusive_scan_ec(
            (gx, gy, gz), reverse=True, combiner=combiner
        )
        bx, by, bz = _gather_boundaries_proj(*suffix, sd, c)
        x, y, z = ec_scan.tree_reduce((bx, by, bz), combiner=combiner)
    else:
        gx, gy, gz, sd = _sort_gather(px, py, pinf, chunk)
        suffix = ec_scan.inclusive_scan_ec((gx, gy, gz), reverse=True)
        bx, by, bz = _gather_boundaries(*suffix, sd, c)
        x, y, z = ec_scan.tree_reduce((bx, by, bz))
    return x[..., 0], y[..., 0], z[..., 0]


def msm(points: APoint, scalars: jnp.ndarray, c: int | None = None,
        n_bits: int = 255) -> JPoint:
    """MSM over G1: sum_i scalars[i] * points[i].

    points: APoint batch (N,); scalars: (FR_LIMBS, N) canonical
    (non-Montgomery) limbs.  Returns a JPoint with batch shape (1,).
    """
    n = points.x.shape[1]
    # Pad to a power-of-4 shape bucket with (infinity, 0) pairs — a
    # mathematical no-op that keeps every scan level at a power-of-two
    # shape AND collapses the distinct compiled pipelines across all
    # commit sizes in a proof to O(log4 N) (PERF.md roadmap 6).  The
    # window size is derived from the bucket so each bucket compiles
    # exactly one digit/horner pipeline.
    npad = scan_util.bucket4(n, floor=256)
    if c is None:
        c = default_window(npad)
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
    use_proj = _use_proj()
    tx, ty, tz = [], [], []
    for w0 in range(0, W, WINDOW_CHUNK):
        chunk = digits[w0: w0 + WINDOW_CHUNK]
        if chunk.shape[0] < WINDOW_CHUNK:  # keep one compiled shape
            fill = jnp.zeros(
                (WINDOW_CHUNK - chunk.shape[0], chunk.shape[1]), jnp.uint32
            )
            chunk = jnp.concatenate([chunk, fill], axis=0)
        x, y, z = _window_chunk(
            points.x, points.y, points.inf, chunk, c, use_proj
        )
        tx.append(x)
        ty.append(y)
        tz.append(z)
    totals = (
        jnp.concatenate(tx, axis=1)[:, :W],
        jnp.concatenate(ty, axis=1)[:, :W],
        jnp.concatenate(tz, axis=1)[:, :W],
    )
    if use_proj:
        totals = _proj_to_jacobian(*totals)
    return _horner_host(totals, c)


def msm_mont_scalars(points: APoint, scalars_mont: jnp.ndarray,
                     c: int | None = None) -> JPoint:
    """MSM taking Montgomery-form Fr scalars (the prover's native form)."""
    return msm(points, fp.from_mont(FR, scalars_mont), c)
