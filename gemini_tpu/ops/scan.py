"""Associative-scan utilities composed from cached jitted kernels.

`jax.lax.associative_scan` inlines its combiner at every recursion
level into one monolithic XLA program; with field-arithmetic combiners
(hundreds of uint32 ops each, or ~25 Montgomery muls for an EC add)
that produces multi-minute compiles.  These helpers run the same
work-efficient odd-even recursion in *Python*, dispatching an
already-compiled combine kernel.

Shape discipline: scan lengths must be powers of two, and both combine
calls per level use the same (n/2) shape — so a combiner compiles at
most log2(N) distinct shapes EVER, shared across all call sites and
cached persistently.  Callers pad with the monoid identity (zero limbs
/ infinity points); padding at the tail never changes inclusive-scan
prefixes.

Elements are pytrees of arrays scanned along `axis` (default 1, the
lane axis of (L, N) limb arrays).  Work ~2N combines, depth 2 log N.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp


def _take(tree, sl, axis):
    def f(a):
        idx = [slice(None)] * a.ndim
        idx[axis] = sl
        return a[tuple(idx)]

    return jax.tree.map(f, tree)


def _concat(trees, axis):
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=axis), *trees)


def _interleave(a, b, axis):
    """Interleave two equal-size pytrees along axis: a0 b0 a1 b1 ..."""

    def f(x, y):
        st = jnp.stack([x, y], axis=axis + 1)
        shape = list(x.shape)
        shape[axis] = 2 * x.shape[axis]
        return st.reshape(shape)

    return jax.tree.map(f, a, b)


def _size(tree, axis):
    return jax.tree.leaves(tree)[0].shape[axis]


def next_pow2(n: int) -> int:
    return 1 if n <= 1 else 1 << (n - 1).bit_length()


# Shape-quantization floor: protocol vectors are zero/identity-padded
# up to `SHAPE_FLOOR * 4^k` physical sizes so the whole prover stack
# touches O(log4 N) distinct kernel shapes instead of O(log2 N) per
# stage (PERF.md roadmap 6: cold TPU compiles were the end-to-end
# bottleneck).  Padding is semantics-free: sumcheck round messages,
# folds, suffix sums and MSMs all ignore zero/infinity tails.
SHAPE_FLOOR = 1 << 10


def bucket4(n: int, floor: int = SHAPE_FLOOR) -> int:
    """Smallest floor * 4^k >= n (floor must be a power of two)."""
    if n <= floor:
        return floor
    p = next_pow2(n)
    if ((p // floor).bit_length() - 1) & 1:
        p <<= 1
    return p


def inclusive_scan(combine: Callable, elems: Any, axis: int = 1,
                   reverse: bool = False):
    """Inclusive associative scan along `axis`; length must be a power
    of two (pad with the combiner's identity first).  All pytree leaves
    must share ndim (negative axes are normalized against it)."""
    axis = axis % jax.tree.leaves(elems)[0].ndim
    n = _size(elems, axis)
    assert n & (n - 1) == 0, "inclusive_scan requires power-of-two length"
    if reverse:
        elems = jax.tree.map(lambda a: jnp.flip(a, axis=axis), elems)
        out = inclusive_scan(_flip_combine(combine), elems, axis)
        return jax.tree.map(lambda a: jnp.flip(a, axis=axis), out)
    return _scan_rec(combine, elems, axis)


def _eo_take(elems, parity: int, axis):
    """Even (parity 0) / odd (parity 1) elements along `axis` via
    reshape + ONE transposed index instead of a stride-2 slice (the
    stride-2 cliff, PERF.md r5: 2-4x at 2^19+ lanes; XLA CSEs the
    shared relayout across the two calls).  Bit-identical outputs."""

    def f(a):
        n = a.shape[axis]
        shp = a.shape[:axis] + (n // 2, 2) + a.shape[axis + 1:]
        t = jnp.moveaxis(a.reshape(shp), axis + 1, 0)
        return t[parity]

    return jax.tree.map(f, elems)


def _scan_rec(combine, elems, axis):
    n = _size(elems, axis)
    if n == 1:
        return elems
    evens = _eo_take(elems, 0, axis)
    odds = _eo_take(elems, 1, axis)
    reduced = combine(evens, odds)  # scan values at odd positions
    scanned = _scan_rec(combine, reduced, axis)
    # even outputs: out[0] = e0; out[2i] = scanned[i-1] . e[2i].
    # Build at full n/2 width (uniform shape): shift `scanned` right by
    # one (slot 0 holds a dummy whose result is discarded below).
    scanned_shift = _concat(
        [_take(scanned, slice(0, 1), axis),
         _take(scanned, slice(0, n // 2 - 1), axis)], axis
    ) if n > 2 else scanned
    evens_combined = combine(scanned_shift, evens)
    evens_out = _concat(
        [_take(evens, slice(0, 1), axis),
         _take(evens_combined, slice(1, n // 2), axis)], axis
    )
    return _interleave(evens_out, scanned, axis)


def _flip_combine(combine):
    def f(a, b):
        return combine(b, a)

    return f
