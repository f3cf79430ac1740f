"""Streaming R1CS sources (circuit.rs:26-40 `R1csStream` +
iterable/dummy.rs:220-238 `dummy_r1cs_stream` analogues).

The elastic SNARK prover consumes relations through this interface so
that giant synthetic instances (the reference demonstrates 2^35,
README.md:38) never materialize: the dummy diagonal instance generates
every vector it needs as an O(1)-memory `VirtualHostVector`, and the
challenge-tensor contraction A^T r_a + η B^T r_b + η² C^T r_c
collapses to a closed form for diagonal matrices.
"""

from __future__ import annotations

from typing import List

from ..params import R
from ..streaming.host import HostVector, VirtualHostVector
from .r1cs import R1cs


class DenseR1csStream:
    """Adapter exposing a dense `R1cs` through the stream interface;
    the challenge contraction uses the device transposed spmv."""

    def __init__(self, r1cs: R1cs):
        self.r1cs = r1cs
        self.z_a = HostVector.from_device(r1cs.a.matvec(r1cs.z))
        self.z_b = HostVector.from_device(r1cs.b.matvec(r1cs.z))
        self.z_c = HostVector.from_device(r1cs.c.matvec(r1cs.z))
        self.z = HostVector.from_device(r1cs.z)
        self.w = HostVector.from_device(r1cs.w)
        self.x_int = r1cs.x_int

    def abc_tensored(self, challenges: List[int], alpha: int, eta: int,
                     block_size: int) -> HostVector:
        """A^T r_a + η B^T r_b + η² C^T r_c with r_b = ⊗(1,ρ),
        r_c = powers(α), r_a = r_b ∘ r_c (snark/time_prover.rs:63-81)."""
        from ..fields import fp
        from ..fields.fp import FR
        from ..ops import poly

        r1cs = self.r1cs
        eta2 = eta * eta % R
        b_challenges = poly.tensor_device(FR, challenges)
        c_challenges = poly.powers(FR, alpha, b_challenges.shape[1])
        a_challenges = fp.mont_mul(FR, b_challenges, c_challenges)
        part_a = r1cs.a.rmatvec(a_challenges)
        part_b = r1cs.b.rmatvec(b_challenges)
        part_c = r1cs.c.rmatvec(c_challenges)
        abc = fp.add(
            FR,
            part_a,
            fp.add(
                FR,
                fp.mont_mul(FR, part_b, poly.scalar(FR, eta)),
                fp.mont_mul(FR, part_c, poly.scalar(FR, eta2)),
            ),
        )
        return HostVector.from_device(abc)


class DummyR1csStream:
    """O(1)-memory diagonal instance: z = (e, ..., e),
    A = B = C = diag(1/e) (circuit.rs:349-365 `dummy_r1cs` as a stream,
    iterable/dummy.rs:220-238 `dummy_r1cs_stream`).

    Satisfiability: (Az)_i (Bz)_i = 1·1 = (Cz)_i.  All vectors are
    `VirtualHostVector`s, so a 2^30 instance costs no host RAM until
    blocks are generated."""

    def __init__(self, n: int, e: int):
        assert e % R not in (0,)
        self.n = n
        self.e = e % R
        ones = VirtualHostVector.constant(1, n)
        self.z_a = ones
        self.z_b = ones
        self.z_c = ones
        self.z = VirtualHostVector.constant(self.e, n)
        self.w = VirtualHostVector.constant(self.e, n - 1)
        self.x_int = [self.e]

    def to_dense(self) -> R1cs:
        """Materialize (small n only; for verification in tests)."""
        from .r1cs import dummy_r1cs
        import random

        class _Fixed(random.Random):
            def __init__(self, e):
                super().__init__(0)
                self._e = e

            def randrange(self, *a, **k):
                return self._e

        return dummy_r1cs(_Fixed(self.e), self.n)

    def abc_tensored(self, challenges: List[int], alpha: int, eta: int,
                     block_size: int):
        """diag(1/e)^T r = (1/e)·r for each matrix, so the combination
        is (1/e)(r_a + η r_b + η² r_c) truncated to n — generated lazily
        per block from the tensor/power closed forms (O(1) host memory,
        O(block) device memory; re-generated each streaming pass like
        the reference's re-streamed MatrixTensor)."""
        from ..fields import fp
        from ..fields.fp import FR
        from ..ops import poly
        from ..streaming.ops import powers_block, tensor_block

        eta2 = eta * eta % R
        inv_e = pow(self.e, -1, R)
        c0 = poly.scalar(FR, inv_e)
        c1 = poly.scalar(FR, eta * inv_e % R)
        c2 = poly.scalar(FR, eta2 * inv_e % R)

        def fn(start: int, end: int):
            import jax.numpy as jnp
            t = jnp.asarray(tensor_block(challenges, start, end))
            p = jnp.asarray(powers_block(alpha, start, end))
            a = fp.mont_mul(FR, t, p)
            comb = fp.add(
                FR,
                fp.mont_mul(FR, a, c0),
                fp.add(
                    FR,
                    fp.mont_mul(FR, t, c1),
                    fp.mont_mul(FR, p, c2),
                ),
            )
            import numpy as np
            return np.asarray(comb)

        return VirtualHostVector(self.n, fn)


def as_stream(r1cs):
    """R1cs -> DenseR1csStream; stream objects pass through."""
    if isinstance(r1cs, R1cs):
        return DenseR1csStream(r1cs)
    return r1cs
