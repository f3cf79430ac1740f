"""Sparse linear algebra over field limb vectors.

The reference's sparse matvec (misc.rs:100 `product_matrix_vector`) is
a row-major loop of mul-adds; on TPU it becomes gather -> elementwise
Montgomery product -> unreduced segment-sum -> one batched modular
reduction (`fp.reduce_relaxed`).  Scatter-accumulation patterns (the
`abc_tensored` build, snark/time_prover.rs:63-81) use the same
primitive with column ids as segments.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..fields import fp

# Segment sums accumulate 16-bit limbs in uint32 without reduction, so
# a segment may hold at most 2^16 - 2 terms before overflow.
MAX_SEGMENT = (1 << 16) - 2


@partial(jax.jit, static_argnums=(0, 3))
def segment_sum_field(spec, vals, seg_ids, num_segments: int):
    """Sum field elements into segments.

    vals: (L, n) Montgomery; seg_ids: (n,) int32 (need not be sorted);
    returns (L, num_segments) normalized Montgomery sums.  Each segment
    must have < 2^16 - 1 entries (see MAX_SEGMENT).
    """
    acc = jax.ops.segment_sum(
        jnp.swapaxes(vals, 0, 1), seg_ids, num_segments=num_segments
    )
    return fp.reduce_relaxed(spec, jnp.swapaxes(acc, 0, 1))


@partial(jax.jit, static_argnums=(0, 5))
def spmv(spec, vals, rows, cols, x, num_rows: int):
    """y = M x for COO (rows, cols, vals); x: (L, n_cols) Montgomery."""
    prods = fp.mont_mul(spec, vals, x[:, cols])
    return segment_sum_field(spec, prods, rows, num_rows)


@partial(jax.jit, static_argnums=(0, 5))
def rspmv(spec, vals, rows, cols, r, num_cols: int):
    """y = M^T r (i.e. r^T M) for COO; r: (L, n_rows) Montgomery."""
    prods = fp.mont_mul(spec, vals, r[:, rows])
    return segment_sum_field(spec, prods, cols, num_cols)
