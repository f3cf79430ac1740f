"""Plookup helpers (Gabizon–Williamson, subprotocols/plookup).

Reduces the lookup claim "subset = set[index]" to three grand products
over randomized vectors (time_prover.rs:89-113):

    set'    : y(1+z) + w_i + z·w_{i+1}         (with head/tail terms)
    subset' : f*_i + y
    sorted' : the set merged with lookup multiplicities

satisfying  ∏sorted' = ∏set' · ∏subset' · (1+z)^|subset|.

Position binding uses the algebraic hash v_i + ζ·i (time_prover.rs:11).

TPU mapping: the randomized vectors are elementwise device ops plus
single-slot concatenations; multiplicity bookkeeping (frequency,
sorted merge) is O(N) int work on host numpy; index -> field encoding
is a vectorized device op.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import fp
from ..fields.fp import FR
from ..ops import poly
from ..params import R


def lookup(v: jnp.ndarray, index: Sequence[int]) -> jnp.ndarray:
    """v[:, index] — a device gather (time_prover.rs:6)."""
    idx = jnp.asarray(np.asarray(index, dtype=np.int64))
    return v[:, idx]


def index_to_field(index: Sequence[int]) -> jnp.ndarray:
    """Indices -> Montgomery field elements, vectorized (u64 range)."""
    arr = np.asarray(index, dtype=np.uint64)
    limbs = np.zeros((FR.n_limbs, len(arr)), dtype=np.uint32)
    for i in range(4):  # 4 x 16 bits covers usize indices
        limbs[i] = ((arr >> (16 * i)) & 0xFFFF).astype(np.uint32)
    return fp.to_mont(FR, jnp.asarray(limbs))


def alg_hash(v: jnp.ndarray, index: Sequence[int], chal: int) -> jnp.ndarray:
    """v_i + ζ·index_i (time_prover.rs:11-21)."""
    idx_f = index_to_field(index)
    return fp.add(
        FR, v, fp.mont_mul(FR, idx_f, poly.scalar(FR, chal))
    )


def plookup_set(v: jnp.ndarray, y: int, z: int) -> jnp.ndarray:
    """(y(1+z) + z·v_0, {y(1+z) + v_i + z·v_{i+1}}, y(1+z) + v_{n-1})
    (time_prover.rs:23-35)."""
    n = v.shape[1]
    y1z = poly.scalar(FR, (1 + z) * y % R)
    zs = poly.scalar(FR, z)
    if n == 0:
        return v
    head = fp.add(FR, y1z, fp.mont_mul(FR, zs, v[:, :1]))
    last = fp.add(FR, y1z, v[:, -1:])
    if n == 1:
        return jnp.concatenate([head, last], axis=1)
    trunk = fp.add(
        FR,
        fp.add(FR, jnp.broadcast_to(y1z, v[:, :-1].shape), v[:, :-1]),
        fp.mont_mul(FR, zs, v[:, 1:]),
    )
    return jnp.concatenate([head, trunk, last], axis=1)


def plookup_subset(v: jnp.ndarray, y: int) -> jnp.ndarray:
    ys = poly.scalar(FR, y)
    return fp.add(FR, v, jnp.broadcast_to(ys, v.shape))


def compute_frequency(set_len: int, index: Sequence[int]) -> np.ndarray:
    """1 + lookup count per set position (time_prover.rs:65-70)."""
    idx = np.asarray(index, dtype=np.int64)
    return 1 + np.bincount(idx, minlength=set_len).astype(np.int64)


def extend_frequency(frequency: np.ndarray) -> np.ndarray:
    """(i repeated frequency[i] times) (time_prover.rs:72-79)."""
    return np.repeat(
        np.arange(len(frequency), dtype=np.int64), frequency
    )


def sorted_vector(set_v: jnp.ndarray, frequency: np.ndarray) -> jnp.ndarray:
    """Each set element repeated by its multiplicity — a device gather
    by the extended-frequency addresses (time_prover.rs:81-87)."""
    addr = np.repeat(
        np.arange(len(frequency), dtype=np.int64), frequency
    )
    return set_v[:, jnp.asarray(addr)]


def plookup(subset: jnp.ndarray, set_v: jnp.ndarray,
            index: Sequence[int], y: int, z: int,
            zeta: int) -> List[jnp.ndarray]:
    """The three grand-product vectors (time_prover.rs:89-113)."""
    if zeta % R != 0:
        set_h = alg_hash(set_v, range(set_v.shape[1]), zeta)
        subset_h = alg_hash(subset, index, zeta)
    else:
        set_h, subset_h = set_v, subset
    lookup_set = plookup_set(set_h, y, z)
    lookup_subset = plookup_subset(subset_h, y)
    frequency = compute_frequency(set_v.shape[1], index)
    sorted_v = sorted_vector(set_h, frequency)
    lookup_sorted = plookup_set(sorted_v, y, z)
    return [lookup_set, lookup_subset, lookup_sorted]
