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

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.fp import FR, FieldSpec


# ---------------------------------------------------------------------------
# Packed transfers.  Normalized Montgomery rows hold 16-bit values in
# uint32 planes — half the wire is zeros.  Every host<->device transfer
# packs row pairs (j, j + L/2) into one uint32 row: 32 B/element for Fr
# (the information-theoretic minimum), 2x less link traffic both ways.
# The [low half | high half] pairing keeps pack/unpack free of sublane
# interleaves (the same trick as ops/msm._pack_xy).
# ---------------------------------------------------------------------------


def pack_rows_host(limbs: np.ndarray) -> np.ndarray:
    """Host (L, B) 16-bit-valued uint32 rows -> (L/2, B) packed."""
    h = limbs.shape[0] // 2
    return limbs[:h] | (limbs[h:] << np.uint32(16))


def unpack_rows_host(packed: np.ndarray) -> np.ndarray:
    """(L/2, B) packed -> (L, B) 16-bit rows."""
    return np.concatenate([packed & np.uint32(0xFFFF), packed >> np.uint32(16)],
                          axis=0)


@jax.jit
def _pack_rows_dev(a: jnp.ndarray) -> jnp.ndarray:
    h = a.shape[0] // 2
    return a[:h] | (a[h:] << jnp.uint32(16))


@jax.jit
def _unpack_rows_dev(p: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([p & jnp.uint32(0xFFFF), p >> jnp.uint32(16)],
                           axis=0)


def to_device_limbs(limbs: np.ndarray) -> jnp.ndarray:
    """Host (L, B) normalized limb rows -> device, packed on the wire."""
    if limbs.shape[0] % 2:
        return jnp.asarray(limbs)
    return _unpack_rows_dev(jnp.asarray(pack_rows_host(limbs)))


def from_device_limbs(arr: jnp.ndarray) -> np.ndarray:
    """Device (L, B) normalized limb rows -> host numpy, packed on the
    wire (the device pack dispatch is async; the halved readback is the
    win)."""
    if arr.shape[0] % 2:
        return np.asarray(arr)
    return unpack_rows_host(np.asarray(_pack_rows_dev(arr)))


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
        return cls(from_device_limbs(arr), spec)

    def __len__(self) -> int:
        return self.limbs.shape[1]

    def slice(self, start: int, end: int) -> np.ndarray:
        """(L, end-start) limb view/array; end is clamped to len."""
        return self.limbs[:, start:end]

    def device_slice(self, start: int, end: int) -> jnp.ndarray:
        """slice() promoted to device with the packed wire format."""
        return to_device_limbs(np.ascontiguousarray(self.slice(start, end)))

    def gather(self, idx: np.ndarray) -> "HostVector":
        return HostVector(
            self.limbs[:, np.asarray(idx, dtype=np.int64)], self.spec
        )

    def blocks(self, block_size: int) -> Iterator[tuple[int, jnp.ndarray]]:
        """Yield (offset, device block) pairs, in coefficient order.
        Restartable: call again for a fresh pass."""
        n = len(self)
        for off in range(0, n, block_size):
            yield off, self.device_slice(off, min(off + block_size, n))

    def to_device(self) -> jnp.ndarray:
        return to_device_limbs(self.limbs)


class VirtualHostVector(HostVector):
    """A lazily generated vector: `fn(start, end) -> (L, end-start)`
    uint32 Montgomery limbs.  O(1) host memory — the rebirth of the
    reference's `DummyStreamer`/`dummy_r1cs_stream` substrate
    (iterable/dummy.rs:10-238), which lets 2^30+ instances run without
    materializing anything.

    `device_fn(start, end) -> (L, end-start) device array`, when given,
    generates blocks ON DEVICE: streaming passes over synthetic giant
    vectors then move ZERO bytes through the host<->device link (the
    2^24 elastic run was tunnel-transfer-bound on exactly these
    constant blocks, PERF.md)."""

    def __init__(self, n: int, fn: Callable[[int, int], np.ndarray],
                 spec: FieldSpec = FR, device_fn=None):
        self._n = n
        self._fn = fn
        self.spec = spec
        self._device_fn = device_fn

    @classmethod
    def constant(cls, value: int, n: int,
                 spec: FieldSpec = FR) -> "VirtualHostVector":
        """n copies of one field element (DummyStreamer,
        iterable/dummy.rs:10-22).  Gathers stay O(1): any index
        selection of a constant is a constant."""
        col = spec.encode([value % spec.modulus])

        def fn(start: int, end: int) -> np.ndarray:
            return np.broadcast_to(col, (spec.n_limbs, end - start))

        dev_col = []

        def device_fn(start: int, end: int) -> jnp.ndarray:
            if not dev_col:
                dev_col.append(to_device_limbs(col))
            return jnp.broadcast_to(dev_col[0],
                                    (spec.n_limbs, end - start))

        out = cls(n, fn, spec, device_fn=device_fn)
        out._const_value = value % spec.modulus
        return out

    def __len__(self) -> int:
        return self._n

    @property
    def limbs(self) -> np.ndarray:  # materialize (small vectors only)
        return np.ascontiguousarray(self._fn(0, self._n))

    def slice(self, start: int, end: int) -> np.ndarray:
        end = min(end, self._n)
        if end <= start:  # numpy slicing tolerates this; generators don't
            return np.zeros((self.spec.n_limbs, 0), dtype=np.uint32)
        return self._fn(start, end)

    def device_slice(self, start: int, end: int) -> jnp.ndarray:
        end = min(end, self._n)
        if self._device_fn is not None and end > start:
            return self._device_fn(start, end)
        return super().device_slice(start, end)

    def gather(self, idx: np.ndarray) -> HostVector:
        if getattr(self, "_const_value", None) is not None:
            return VirtualHostVector.constant(
                self._const_value, len(idx), self.spec)
        raise NotImplementedError(
            "gather on a virtual stream; materialize explicitly first"
        )


class DeviceVector(HostVector):
    """A HostVector whose payload stays DEVICE-resident: fold levels
    small enough for HBM skip the host round trip entirely (VERDICT r4
    item 4, "keep device-resident folds when they fit").  Host access
    (`limbs`/`slice`) reads back on demand — rare paths only."""

    def __init__(self, arr: jnp.ndarray, spec: FieldSpec = FR):
        assert arr.ndim == 2 and arr.shape[0] == spec.n_limbs
        self._arr = arr
        self.spec = spec

    def __len__(self) -> int:
        return self._arr.shape[1]

    @property
    def limbs(self) -> np.ndarray:
        return from_device_limbs(self._arr)

    def slice(self, start: int, end: int) -> np.ndarray:
        end = min(end, len(self))
        if end <= start:
            return np.zeros((self.spec.n_limbs, 0), dtype=np.uint32)
        return from_device_limbs(self._arr[:, start:end])

    def device_slice(self, start: int, end: int) -> jnp.ndarray:
        end = min(end, len(self))
        return self._arr[:, start:end]

    def gather(self, idx: np.ndarray) -> HostVector:
        return HostVector(
            self.limbs[:, np.asarray(idx, dtype=np.int64)], self.spec)


def device_block(hv: HostVector, off: int, end: int,
                 pad_to: int | None = None) -> jnp.ndarray:
    """hv[off:end) as a device array, zero-padded ON DEVICE to
    `pad_to` lanes — the shared block reader for streaming pipelines
    (virtual device generators and device-resident vectors transfer
    nothing; plain host vectors use the packed wire format)."""
    end = min(end, len(hv))
    m = max(0, end - off)
    if m:
        b = hv.device_slice(off, end)
    else:
        b = jnp.zeros((hv.spec.n_limbs, 0), jnp.uint32)
    if pad_to is not None and b.shape[1] < pad_to:
        b = jnp.concatenate(
            [b, jnp.zeros((hv.spec.n_limbs, pad_to - b.shape[1]),
                          jnp.uint32)], axis=1)
    return b
