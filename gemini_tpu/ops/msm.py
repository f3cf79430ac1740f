"""Multi-scalar multiplication (Pippenger) as a TPU-native pipeline.

The reference's MSM is bucket-scatter Pippenger on CPU threads
(algorithm documented at /root/reference/src/kzg/msm/variable_base.rs,
superseded upstream; SURVEY.md §3.5).  Data-dependent scatter-adds
serialize badly on vector hardware, so bucket accumulation is
reformulated as fully-parallel primitives, and — critically for a
remote-dispatch TPU — the whole pipeline compiles to THREE kernels:

  1. `_window_chunk` (one dispatch per window chunk, windows batched):
     digit extraction, per-window argsort, point gather, segmented
     inclusive scan with the complete Jacobian add as combiner
     (~2N adds, log depth), boundary scatter into the 2^c bucket
     table, suffix scan + tree reduction -> per-window totals.
  2. `_horner_kernel` (one dispatch): result = sum_w 2^(c*w) T_w as a
     255-step `lax.fori_loop` of double + conditional add.

Inside each jit the odd-even scans unroll into log(N) tape-VM
subgraphs (ops/tape.py), so compile stays minutes-bounded and cached
while runtime is a handful of dispatches instead of hundreds (the
axon tunnel charges ~10ms per dispatch).

Total ~2N + 3*2^c point-adds per window.  Scalars enter in canonical
(non-Montgomery) limb form; points as affine with infinity masks.
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

# Windows processed per dispatch: bounds peak memory (the scan holds
# ~4x (L, Wc, N) uint32 live) while amortizing dispatch latency.
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


def _seg_combine(a, b):
    """Segmented-sum monoid over dict pytrees with batch (Wc, n):
    (v1,f1) . (v2,f2) = (f2 ? v2 : v1+v2, f1|f2)."""
    pa = JPoint(a["x"], a["y"], a["z"])
    pb = JPoint(b["x"], b["y"], b["z"])
    s = g1.add(pa, pb)
    start_b = b["flag"][0]
    out = g1.select_point(start_b, pb, s)
    return dict(x=out.x, y=out.y, z=out.z, flag=a["flag"] | b["flag"])


def _add_tuple(a, b):
    return tuple(g1.add(JPoint(*a), JPoint(*b)))


def _tree_reduce_last(p: JPoint) -> JPoint:
    """Sum a (L, ..., n) batch of Jacobian points along the last axis
    (power-of-two n) by halving inside the current trace."""
    while p.x.shape[-1] > 1:
        h = p.x.shape[-1] // 2
        lo = (p.x[..., :h], p.y[..., :h], p.z[..., :h])
        hi = (p.x[..., h:], p.y[..., h:], p.z[..., h:])
        p = JPoint(*_add_tuple(lo, hi))
    return p


@partial(jax.jit, static_argnums=(4,))
def _window_chunk(px, py, pinf, digits, c: int):
    """Bucket-accumulate a chunk of windows in one kernel.

    px/py: (L, N) affine coords; pinf: (N,); digits: (Wc, N).
    Returns window totals (L, Wc) x/y/z.
    """
    Wc, n = digits.shape
    n_buckets = 1 << c

    order = jnp.argsort(digits, axis=1)  # (Wc, N)
    sd = jnp.take_along_axis(digits, order, axis=1)
    gx = px[:, order]  # (L, Wc, N)
    gy = py[:, order]
    ginf = pinf[order]  # (Wc, N)
    z_one = FQ.ones_mont((Wc, n))
    gz = fp.select(ginf, FQ.zeros((Wc, n)), z_one)
    # zero digits contribute nothing: treat as infinity so the segment
    # machinery never adds them (bucket 0 is discarded anyway).
    gz = fp.select(sd == 0, FQ.zeros((Wc, n)), gz)

    ones = jnp.ones((Wc, 1), jnp.bool_)
    head = jnp.concatenate([ones, sd[:, 1:] != sd[:, :-1]], axis=1)
    is_end = jnp.concatenate([sd[:, 1:] != sd[:, :-1], ones], axis=1)
    idx = jnp.where(is_end, sd, n_buckets)  # overflow slot for non-ends

    elems = dict(x=gx, y=gy, z=gz, flag=head[None])
    scanned = scan_util.inclusive_scan(_seg_combine, elems, axis=-1)

    # scatter segment totals into the dense bucket table (drop bucket 0
    # and the overflow slot; empty buckets stay at infinity z=0)
    warr = jnp.arange(Wc)[:, None]
    tbl = [
        jnp.zeros((FQ.n_limbs, Wc, n_buckets + 1), jnp.uint32)
        .at[:, warr, idx].set(scanned[k], mode="drop")[:, :, 1:n_buckets]
        for k in ("x", "y", "z")
    ]
    # pad to power-of-two bucket count with one infinity (identity at
    # the tail is a no-op for suffix sums)
    inf_col = jnp.zeros((FQ.n_limbs, Wc, 1), jnp.uint32)
    one_col = jnp.broadcast_to(
        jnp.asarray(FQ.one_mont_limbs).reshape(-1, 1, 1),
        (FQ.n_limbs, Wc, 1),
    ).astype(jnp.uint32)
    padded = (
        jnp.concatenate([tbl[0], one_col], axis=2),
        jnp.concatenate([tbl[1], one_col], axis=2),
        jnp.concatenate([tbl[2], inf_col], axis=2),
    )
    # suffix sums S_k = sum_{j>=k} bucket_j; window total = sum_k S_k
    # = sum_j j * bucket_j.
    suffix = scan_util.inclusive_scan(
        _add_tuple, padded, axis=-1, reverse=True
    )
    total = _tree_reduce_last(JPoint(*suffix))
    return total.x[..., 0], total.y[..., 0], total.z[..., 0]  # (L, Wc)


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
        x, y, z = _window_chunk(points.x, points.y, points.inf, chunk, c)
        tx.append(x)
        ty.append(y)
        tz.append(z)
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
