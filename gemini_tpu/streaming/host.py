"""Host-RAM vector sources — the TPU rebirth of the reference's
`Iterable` streaming substrate (src/iterable/, SURVEY.md L1).

The reference streams from cheap re-playable sources because CPU RAM
is its scarce resource.  On TPU the scarce resource is HBM: instances
too large for the chip live in host RAM as numpy limb arrays and are
promoted block-by-block.  A `HostVector` is restartable (`blocks()`
may be called once per sumcheck round, like `Iterable::iter`) and
cheap to slice; blocks arrive on device as (L, B) Montgomery arrays.

`VirtualHostVector` is the O(1)-memory flavour (iterable/dummy.rs
analogue): blocks are *generated* by a function instead of read from
RAM, so synthetic giant instances (2^24+) cost no host memory either.

Unlike the reference's big-endian streams, blocks are little-endian
(coefficient order) — the elastic provers here consume them in
coefficient order and produce transcripts identical to the dense
provers, which is the property the reference's convention served.
"""

from __future__ import annotations

from typing import Callable, Iterator, Sequence

import jax.numpy as jnp
import numpy as np

from ..fields.fp import FR, FieldSpec


class HostVector:
    """A field vector resident in host RAM as (L, N) uint32 Montgomery
    limbs; restartable block source."""

    def __init__(self, limbs: np.ndarray, spec: FieldSpec = FR):
        assert limbs.ndim == 2 and limbs.shape[0] == spec.n_limbs
        self.limbs = limbs
        self.spec = spec

    @classmethod
    def from_ints(cls, values: Sequence[int], spec: FieldSpec = FR):
        return cls(spec.encode(list(values)), spec)

    @classmethod
    def from_device(cls, arr: jnp.ndarray, spec: FieldSpec = FR):
        return cls(np.asarray(arr), spec)

    def __len__(self) -> int:
        return self.limbs.shape[1]

    def slice(self, start: int, end: int) -> np.ndarray:
        """(L, end-start) limb view/array; end is clamped to len."""
        return self.limbs[:, start:end]

    def gather(self, idx: np.ndarray) -> "HostVector":
        return HostVector(
            self.limbs[:, np.asarray(idx, dtype=np.int64)], self.spec
        )

    def blocks(self, block_size: int) -> Iterator[tuple[int, jnp.ndarray]]:
        """Yield (offset, device block) pairs, in coefficient order.
        Restartable: call again for a fresh pass."""
        n = len(self)
        for off in range(0, n, block_size):
            yield off, jnp.asarray(self.slice(off, min(off + block_size, n)))

    def to_device(self) -> jnp.ndarray:
        return jnp.asarray(self.limbs)


class VirtualHostVector(HostVector):
    """A lazily generated vector: `fn(start, end) -> (L, end-start)`
    uint32 Montgomery limbs.  O(1) host memory — the rebirth of the
    reference's `DummyStreamer`/`dummy_r1cs_stream` substrate
    (iterable/dummy.rs:10-238), which lets 2^30+ instances run without
    materializing anything."""

    def __init__(self, n: int, fn: Callable[[int, int], np.ndarray],
                 spec: FieldSpec = FR):
        self._n = n
        self._fn = fn
        self.spec = spec

    @classmethod
    def constant(cls, value: int, n: int,
                 spec: FieldSpec = FR) -> "VirtualHostVector":
        """n copies of one field element (DummyStreamer,
        iterable/dummy.rs:10-22)."""
        col = spec.encode([value % spec.modulus])

        def fn(start: int, end: int) -> np.ndarray:
            return np.broadcast_to(col, (spec.n_limbs, end - start))

        return cls(n, fn, spec)

    def __len__(self) -> int:
        return self._n

    @property
    def limbs(self) -> np.ndarray:  # materialize (small vectors only)
        return np.ascontiguousarray(self._fn(0, self._n))

    def slice(self, start: int, end: int) -> np.ndarray:
        end = min(end, self._n)
        return self._fn(start, end)

    def gather(self, idx: np.ndarray) -> HostVector:
        raise NotImplementedError(
            "gather on a virtual stream; materialize explicitly first"
        )
