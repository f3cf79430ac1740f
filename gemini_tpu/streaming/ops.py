"""Blockwise device pipelines over host-resident vectors.

These are the TPU reformulation of the reference's L2 stream
combinators (sumcheck/streams.rs, tensorcheck/streams.rs): instead of
lazy re-playable iterators, each op streams `HostVector` blocks through
an already-compiled device kernel and writes results back to host RAM.
Device memory stays bounded by the block size; host RAM is the big
tier (SURVEY.md §7 design stance).
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from ..fields import fp
from ..fields.fp import FR
from ..ops import poly
from ..params import R
from .host import (
    HostVector, VirtualHostVector, device_block, from_device_limbs,
    to_device_limbs,
)


def hv_fold(hv: HostVector, r: int, block_size: int = 1 << 20) -> HostVector:
    """Streaming even/odd fold out[k] = f[2k] + r*f[2k+1] (misc.rs:52),
    zero-padding odd lengths — block-for-block identical to the dense
    `poly.fold_polynomial` on the zero-padded vector."""
    n = len(hv)
    out_n = (n + 1) // 2
    L = FR.n_limbs
    out = np.zeros((L, out_n), dtype=np.uint32)
    rs = poly.scalar(FR, r)
    blk = max(2, block_size - (block_size % 2))
    for off in range(0, n, blk):
        raw = hv.slice(off, off + blk)
        m = raw.shape[1]
        if m % 2:
            raw = np.concatenate(
                [raw, np.zeros((L, 1), dtype=np.uint32)], axis=1
            )
        fb = poly.fold_polynomial(FR, to_device_limbs(raw), rs)
        out[:, off // 2: off // 2 + fb.shape[1]] = from_device_limbs(fb)
    return HostVector(out, hv.spec)


def hv_lincomb(hvs: Sequence[HostVector], coeffs: Sequence[int],
               block_size: int = 1 << 20) -> HostVector:
    """Streaming sum_i coeffs[i] * hvs[i], aligned at index 0 to the max
    length (the `lincomb!` stream, tensorcheck/streams.rs:15-134)."""
    n = max(len(hv) for hv in hvs)
    L = FR.n_limbs
    out = np.zeros((L, n), dtype=np.uint32)
    cs = [poly.scalar(FR, c) for c in coeffs]
    for off in range(0, n, block_size):
        m = min(block_size, n - off)
        acc = _lincomb_device_block(hvs, cs, off, m)
        if acc is not None:
            out[:, off: off + m] = from_device_limbs(acc)
    return HostVector(out, hvs[0].spec)


def _lincomb_device_block(hvs, cs, off: int, m: int):
    """One device block of sum_i cs[i]*hvs[i][off:off+m), zero-padded;
    None when every source is exhausted."""
    acc = None
    for hv, c in zip(hvs, cs):
        end = min(off + m, len(hv))
        if end <= off:
            continue
        sl = device_block(hv, off, end, pad_to=m)
        term = fp.mont_mul(FR, sl, c)
        acc = term if acc is None else fp.add(FR, acc, term)
    return acc


def hv_lincomb_lazy(hvs: Sequence[HostVector], coeffs: Sequence[int]
                    ) -> VirtualHostVector:
    """The lincomb as a LAZY device-generating stream: consumers that
    read it once (the fold-tree's first level) skip materializing the
    n-length combination entirely — at 2^24 that is a ~0.5 GB host
    write + re-read saved (VERDICT r4 item 4 pass-count reduction)."""
    import jax.numpy as jnp

    n = max(len(hv) for hv in hvs)
    cs = [poly.scalar(FR, c) for c in coeffs]

    def device_fn(start: int, end: int):
        acc = _lincomb_device_block(hvs, cs, start, end - start)
        if acc is None:
            acc = jnp.zeros((FR.n_limbs, end - start), jnp.uint32)
        return acc

    def fn(start: int, end: int):
        return from_device_limbs(device_fn(start, end))

    return VirtualHostVector(n, fn, hvs[0].spec, device_fn=device_fn)


def hv_hadamard(a: HostVector, b: HostVector,
                block_size: int = 1 << 20) -> HostVector:
    """Streaming elementwise product (hadamard_stream.rs analogue);
    lengths align to the shorter vector like the reference's zip."""
    n = min(len(a), len(b))
    L = FR.n_limbs
    out = np.zeros((L, n), dtype=np.uint32)
    for off in range(0, n, block_size):
        m = min(block_size, n - off)
        pa = a.device_slice(off, off + m)
        pb = b.device_slice(off, off + m)
        out[:, off: off + m] = from_device_limbs(fp.mont_mul(FR, pa, pb))
    return HostVector(out, a.spec)


def hv_accumulated_product(hv: HostVector,
                           block_size: int = 1 << 20) -> HostVector:
    """Streaming suffix products acc[i] = prod_{j>=i} v[j]
    (entryproduct/streams/product_stream.rs analogue): per-block device
    suffix scans stitched with a host-side carry (the running product
    of everything to the right of the block)."""
    from ..subprotocols.entry_product import accumulated_product

    n = len(hv)
    L = FR.n_limbs
    out = np.zeros((L, n), dtype=np.uint32)
    offs = list(range(0, n, block_size))
    carry = poly.scalar(FR, 1)
    for off in reversed(offs):
        m = min(block_size, n - off)
        blockv = hv.device_slice(off, off + m)
        acc = accumulated_product(blockv)  # suffix products inside block
        acc = fp.mont_mul(FR, acc, carry)
        out[:, off: off + m] = from_device_limbs(acc)
        carry = acc[:, :1]  # suffix product from `off` rightward
    return HostVector(out, hv.spec)


def hv_prod(hv: HostVector, block_size: int = 1 << 20) -> int:
    """Streaming grand product -> canonical int."""
    acc = 1
    for _, block in hv.blocks(block_size):
        acc = acc * poly.lane_prod(FR, block) % R
    return acc


def hv_ip(a: HostVector, b: HostVector, block_size: int = 1 << 20) -> int:
    """Streaming inner product over the shorter length -> canonical
    int (misc.rs ip over streams)."""
    n = min(len(a), len(b))
    acc = 0
    for off in range(0, n, block_size):
        m = min(block_size, n - off)
        pa = a.device_slice(off, off + m)
        pb = b.device_slice(off, off + m)
        acc = (acc + poly.ip(FR, pa, pb)) % R
    return acc


def hv_evaluate(hv: HostVector, x: int, block_size: int = 1 << 20) -> int:
    """Streaming little-endian evaluation f(x) -> canonical int."""
    acc = 0
    for off, block in hv.blocks(block_size):
        acc = (acc + pow(x, off, R) * poly.evaluate_le(FR, block, x)) % R
    return acc


def hv_tensor(challenges: Sequence[int],
              block_size: int = 1 << 20) -> HostVector:
    """⊗_j (1, rho_j) of length 2^k as a HostVector, generated
    blockwise: block b equals (low-bit tensor) x (product of the
    challenges selected by the high bits of the offset) — the
    `TensorIter` stream (psnark/streams/tensor_stream.rs:12-90)
    rebuilt as block generation."""
    k = len(challenges)
    n = 1 << k
    L = FR.n_limbs
    out = np.zeros((L, n), dtype=np.uint32)
    low = min(k, max(0, (block_size - 1).bit_length() - 1)) if k else 0
    blk = 1 << low
    wlow = poly.tensor_device(FR, list(challenges[:low]))
    for off in range(0, n, blk):
        hi = off >> low
        s = 1
        for j in range(low, k):
            if (hi >> (j - low)) & 1:
                s = s * challenges[j] % R
        out[:, off: off + blk] = from_device_limbs(
            fp.mont_mul(FR, wlow, poly.scalar(FR, s))
        )
    return HostVector(out)


def tensor_block_dev(challenges: Sequence[int], start: int,
                     end: int) -> jnp.ndarray:
    """Arbitrary window [start, end) of the ⊗_j (1, rho_j) expansion
    as a DEVICE array: t[i] = prod_l rho_l^{bit_l(i)} via log(n) masked
    device multiplies (random access, the `advance_by` of
    tensor_stream.rs:49-90)."""
    m = end - start
    idx = np.arange(start, end, dtype=np.int64)
    out = FR.ones_mont((m,))
    for l, ch in enumerate(challenges):
        bit = jnp.asarray(((idx >> l) & 1).astype(np.uint32))
        mul = fp.mont_mul(FR, out, poly.scalar(FR, ch))
        out = jnp.where(bit[None, :] == 1, mul, out)
    return out


def tensor_block(challenges: Sequence[int], start: int,
                 end: int) -> np.ndarray:
    return from_device_limbs(tensor_block_dev(challenges, start, end))


def tensor_at(challenges: Sequence[int], idx: np.ndarray) -> jnp.ndarray:
    """⊗-expansion values at arbitrary indices: t[idx] =
    prod_l rho_l^{bit_l(idx)} via log(n) masked device multiplies
    (the random-access form of tensor_stream.rs:49-90).  Returns a
    DEVICE (L, len(idx)) Montgomery array."""
    idx = np.asarray(idx, dtype=np.int64)
    out = FR.ones_mont((len(idx),))
    for l, ch in enumerate(challenges):
        bit = jnp.asarray(((idx >> l) & 1).astype(np.uint32))
        mul = fp.mont_mul(FR, out, poly.scalar(FR, ch))
        out = jnp.where(bit[None, :] == 1, mul, out)
    return out


def powers_at(x: int, idx: np.ndarray, n_bits: int) -> jnp.ndarray:
    """x^idx at arbitrary indices via the bit decomposition of idx
    with host-precomputed x^(2^l).  DEVICE (L, len(idx)) Montgomery."""
    idx = np.asarray(idx, dtype=np.int64)
    out = FR.ones_mont((len(idx),))
    sq = x % R
    for l in range(n_bits):
        bit = jnp.asarray(((idx >> l) & 1).astype(np.uint32))
        mul = fp.mont_mul(FR, out, poly.scalar(FR, sq))
        out = jnp.where(bit[None, :] == 1, mul, out)
        sq = sq * sq % R
    return out


def powers_block_dev(x: int, start: int, end: int) -> jnp.ndarray:
    """Window [start, end) of [1, x, x^2, ...] as a DEVICE array."""
    m = end - start
    return fp.mont_mul(
        FR, poly.powers(FR, x, m), poly.scalar(FR, pow(x, start, R))
    )


def powers_block(x: int, start: int, end: int) -> np.ndarray:
    return from_device_limbs(powers_block_dev(x, start, end))


def hv_powers(x: int, n: int, block_size: int = 1 << 20) -> HostVector:
    """[1, x, ..., x^(n-1)] as a HostVector, generated blockwise."""
    L = FR.n_limbs
    out = np.zeros((L, n), dtype=np.uint32)
    for off in range(0, n, block_size):
        m = min(block_size, n - off)
        blockp = fp.mont_mul(
            FR, poly.powers(FR, x, m), poly.scalar(FR, pow(x, off, R))
        )
        out[:, off: off + m] = from_device_limbs(blockp)
    return HostVector(out)


def hv_gather(hv: HostVector, idx: np.ndarray) -> HostVector:
    """items[indices] — host-side vectorized gather (the
    LookupStreamer, psnark/streams/lookup_stream.rs analogue: numpy
    fancy indexing replaces the sorted single-pass iterator)."""
    return hv.gather(idx)


def hv_slice(hv: HostVector, n: int) -> HostVector:
    return HostVector(np.asarray(hv.slice(0, n)), hv.spec)


def hv_alg_hash(hv: HostVector, indices, zeta: int,
                block_size: int = 1 << 20) -> HostVector:
    """v_i + ζ·index_i blockwise (algebraic_hash.rs analogue).
    indices=None means positions 0..n-1."""
    from ..subprotocols.plookup import index_to_field

    n = len(hv)
    L = FR.n_limbs
    out = np.zeros((L, n), dtype=np.uint32)
    zs = poly.scalar(FR, zeta)
    for off in range(0, n, block_size):
        m = min(block_size, n - off)
        v = hv.device_slice(off, off + m)
        if indices is None:
            idx = range(off, off + m)
        else:
            idx = np.asarray(indices[off: off + m], dtype=np.int64)
        idx_f = index_to_field(idx)
        out[:, off: off + m] = from_device_limbs(
            fp.add(FR, v, fp.mont_mul(FR, idx_f, zs))
        )
    return HostVector(out, hv.spec)


def hv_plookup_set(hv: HostVector, y: int, z: int,
                   block_size: int = 1 << 20) -> HostVector:
    """The randomized set vector of plookup (y(1+z) + v_i + z·v_{i+1}
    with head/tail slots, subprotocols/plookup.py plookup_set)
    streamed with one-element block overlap."""
    n = len(hv)
    L = FR.n_limbs
    out = np.zeros((L, n + 1), dtype=np.uint32)
    y1z = poly.scalar(FR, (1 + z) * y % R)
    zs = poly.scalar(FR, z)
    if n == 0:
        return HostVector(out[:, :0], hv.spec)
    # head: y(1+z) + z*v_0
    out[:, :1] = np.asarray(
        fp.add(FR, y1z, fp.mont_mul(FR, zs, hv.device_slice(0, 1)))
    )
    # trunk: slot i+1 = y(1+z) + v_i + z*v_{i+1}, i in [0, n-1)
    for off in range(0, n - 1, block_size):
        m = min(block_size, n - 1 - off)
        v = hv.device_slice(off, off + m)
        vn = hv.device_slice(off + 1, off + 1 + m)
        t = fp.add(
            FR,
            fp.add(FR, jnp.broadcast_to(y1z, v.shape), v),
            fp.mont_mul(FR, zs, vn),
        )
        out[:, off + 1: off + 1 + m] = from_device_limbs(t)
    # tail: y(1+z) + v_{n-1}
    out[:, n: n + 1] = np.asarray(
        fp.add(FR, y1z, hv.device_slice(n - 1, n))
    )
    return HostVector(out, hv.spec)


def hv_plookup_subset(hv: HostVector, y: int,
                      block_size: int = 1 << 20) -> HostVector:
    """f*_i + y blockwise."""
    n = len(hv)
    L = FR.n_limbs
    out = np.zeros((L, n), dtype=np.uint32)
    ys = poly.scalar(FR, y)
    for off in range(0, n, block_size):
        m = min(block_size, n - off)
        v = hv.device_slice(off, off + m)
        out[:, off: off + m] = from_device_limbs(
            fp.add(FR, v, jnp.broadcast_to(ys, v.shape))
        )
    return HostVector(out, hv.spec)


_ONE_COL = None


def _one_col() -> np.ndarray:
    global _ONE_COL
    if _ONE_COL is None:
        _ONE_COL = np.asarray(FR.ones_mont((1,)))
    return _ONE_COL


def hv_monic(hv: HostVector) -> HostVector:
    """f(x) + x^N: append a trailing Montgomery 1 (host concat)."""
    return HostVector(
        np.concatenate([hv.slice(0, len(hv)), _one_col()], axis=1), hv.spec
    )


def hv_right_rotation(hv: HostVector) -> HostVector:
    """(f_{n-1}, f_0, ..., f_{n-2}) (rrot_stream.rs analogue)."""
    return HostVector(
        np.concatenate([hv.slice(len(hv) - 1, len(hv)), hv.slice(0, len(hv) - 1)], axis=1),
        hv.spec,
    )


def hv_plookup(subset: HostVector, set_hashed: HostVector,
               index: np.ndarray, y: int, z: int, zeta: int,
               frequency: np.ndarray,
               block_size: int = 1 << 20) -> List[HostVector]:
    """The three streaming grand-product vectors of plookup
    (plookup/streams/{set,subset,sorted}_stream.rs analogues).

    `set_hashed` must already be position-hashed (ζ); `subset` is the
    raw looked-up vector, hashed here against its lookup indices."""
    if zeta % R != 0:
        subset_h = hv_alg_hash(subset, index, zeta, block_size)
    else:
        subset_h = subset
    lookup_set = hv_plookup_set(set_hashed, y, z, block_size)
    lookup_subset = hv_plookup_subset(subset_h, y, block_size)
    addr = np.repeat(np.arange(len(frequency), dtype=np.int64), frequency)
    sorted_v = hv_gather(set_hashed, addr)
    lookup_sorted = hv_plookup_set(sorted_v, y, z, block_size)
    return [lookup_set, lookup_subset, lookup_sorted]
