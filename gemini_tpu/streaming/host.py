"""Host-RAM vector sources — the TPU rebirth of the reference's
`Iterable` streaming substrate (src/iterable/, SURVEY.md L1).

The reference streams from cheap re-playable sources because CPU RAM
is its scarce resource.  On TPU the scarce resource is HBM: instances
too large for the chip live in host RAM as numpy limb arrays and are
promoted block-by-block.  A `HostVector` is restartable (`blocks()`
may be called once per sumcheck round, like `Iterable::iter`) and
cheap to slice; blocks arrive on device as (L, B) Montgomery arrays.

Unlike the reference's big-endian streams, blocks are little-endian
(coefficient order) — the elastic provers here consume them in
coefficient order and produce transcripts identical to the dense
provers, which is the property the reference's convention served.
"""

from __future__ import annotations

from typing import Iterator, Sequence

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

    def blocks(self, block_size: int) -> Iterator[tuple[int, jnp.ndarray]]:
        """Yield (offset, device block) pairs, in coefficient order.
        Restartable: call again for a fresh pass."""
        n = len(self)
        for off in range(0, n, block_size):
            yield off, jnp.asarray(self.limbs[:, off: off + block_size])

    def to_device(self) -> jnp.ndarray:
        return jnp.asarray(self.limbs)
