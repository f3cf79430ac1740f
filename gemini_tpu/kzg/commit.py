"""KZG polynomial commitment, time-efficient flavour (kzg/time.rs
analogue) with TPU-native internals.

Prover-side objects (SRS G1 powers, coefficient vectors, quotients)
live on device as limb arrays; commitments/proofs are single G1 points
returned to the host (they feed the Fiat-Shamir transcript anyway).
Verification is host-side over refimpl pairings — it touches a handful
of points, exactly like the reference's verifier (kzg/mod.rs:155-244).

TPU reformulations:
  * SRS generation (fixed-base MSM over powers of tau,
    kzg/time.rs:49-72): host-built window table of generator multiples
    + per-window device gather + batched mixed adds.
  * commit (one G1 MSM, kzg/time.rs:81-83): ops/msm.py Pippenger.
  * open (synthetic division + MSM, kzg/time.rs:112-131): the
    sequential Horner/synthetic-division recurrence is reformulated as
    a *suffix scan*: q_i = alpha^-(i+1) * sum_{j>i} f_j alpha^j, so the
    quotient is two elementwise products and one parallel suffix sum.
  * multi-point open (division by the vanishing polynomial,
    kzg/time.rs:134-145): chained single-point divisions (quotient of
    a quotient equals the quotient by the product).
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..params import R
from ..fields import fp
from ..fields.fp import FQ, FR
from ..curve import g1
from ..curve.g1 import APoint, JPoint
from ..ops import poly, scan
from ..ops.msm import extract_digits, msm_mont_scalars
from ..refimpl import (
    g1_add, g1_generator, g1_mul, g1_neg, g2_generator, g2_mul, g2_add,
    g2_neg, pairing,
)

G1Host = Optional[Tuple[int, int]]

_fr_add_jit = jax.jit(lambda a, b: fp.add(FR, a, b))


class KZGVerificationError(Exception):
    pass


def _apoint_slice(a: APoint, n: int) -> APoint:
    return APoint(a.x[:, :n], a.y[:, :n], a.inf[:n])


def _apoint_gather(a: APoint, idx) -> APoint:
    return APoint(a.x[:, idx], a.y[:, idx], a.inf[idx])


def fixed_base_msm(base: G1Host, scalars_canonical: jnp.ndarray,
                   c: int = 8) -> APoint:
    """[s_i * base for i] as one batched device computation.

    Host precomputes the window table T[w][d] = d * 2^(c*w) * base
    (W * 2^c small host ops); device gathers one table row per window
    per scalar and does W batched mixed adds.
    Mirrors FixedBase::msm usage in SRS setup (kzg/time.rs:55-59).
    """
    n = scalars_canonical.shape[1]
    n_windows = -(-255 // c)
    table: List[G1Host] = []
    for w in range(n_windows):
        base_w = g1_mul(base, 1 << (c * w))
        row: List[G1Host] = [None]
        for _ in range((1 << c) - 1):
            row.append(g1_add(row[-1], base_w))
        table.extend(row)
    tbl = g1.encode_affine(table)
    digits = extract_digits(scalars_canonical, c)
    acc = g1.infinity((n,))
    for w in range(n_windows):
        idx = digits[w] + jnp.uint32(w << c)
        acc = g1.add_mixed(acc, _apoint_gather(tbl, idx))
    return g1.to_affine(acc)


def _suffix_sums(v: jnp.ndarray) -> jnp.ndarray:
    n = v.shape[1]
    npad = scan.next_pow2(n)
    if npad != n:  # zero tail never changes suffix sums of real slots
        v = jnp.concatenate(
            [v, jnp.zeros((v.shape[0], npad - n), jnp.uint32)], axis=1
        )
    return scan.inclusive_scan(_fr_add_jit, v, axis=1, reverse=True)[:, :n]


def divide_linear(coeffs: jnp.ndarray, alpha: int):
    """Divide f (Montgomery (L, n)) by (x - alpha): returns
    (f(alpha) canonical int, quotient (L, n-1) Montgomery).

    Parallel form of the reference's synthetic division
    (kzg/time.rs:117-124): with S_i = sum_{j>=i} f_j alpha^j,
    f(alpha) = S_0 and q_i = S_{i+1} * alpha^-(i+1).
    """
    n = coeffs.shape[1]
    if n == 0:
        return 0, coeffs
    if n == 1:
        return FR.decode(coeffs)[0], coeffs[:, :0]
    if alpha % R == 0:
        return FR.decode(coeffs[:, :1])[0], coeffs[:, 1:]
    pw = poly.powers(FR, alpha, n)
    t = fp.mont_mul(FR, coeffs, pw)
    s = _suffix_sums(t)
    evaluation = FR.decode(s[:, :1])[0]
    ainv = pow(alpha, -1, R)
    pwinv = poly.powers(FR, ainv, n)[:, 1:]
    quotient = fp.mont_mul(FR, s[:, 1:], pwinv)
    return evaluation, quotient


def vanishing_polynomial_host(points: Sequence[int]) -> List[int]:
    """Coefficients (LE) of prod (x - p) over Fr (kzg/mod.rs:262)."""
    coeffs = [1]
    for p in points:
        nxt = [0] * (len(coeffs) + 1)
        for i, ci in enumerate(coeffs):
            nxt[i] = (nxt[i] - p * ci) % R
            nxt[i + 1] = (nxt[i + 1] + ci) % R
        coeffs = nxt
    return coeffs


class CommitterKey:
    """SRS: device G1 powers of tau + host G2 powers (kzg/time.rs:24).

    `devices`: optional device list — when set (>1), every commit MSM
    is data-parallel across them (parallel/msm.py), the multi-chip
    replacement for the reference's rayon-parallel `msm_bigint`."""

    def __init__(self, powers_of_g: APoint, powers_of_g2: List, tau=None,
                 devices: Optional[Sequence] = None):
        self.powers_of_g = powers_of_g
        self.powers_of_g2 = powers_of_g2
        self._tau = tau  # retained only by insecure test setups
        self.devices = devices

    def with_devices(self, devices: Sequence) -> "CommitterKey":
        """Same SRS, commits routed across `devices`."""
        return CommitterKey(
            self.powers_of_g, self.powers_of_g2, tau=self._tau,
            devices=list(devices),
        )

    @classmethod
    def new(cls, max_degree: int, max_eval_points: int, seed: int = 0,
            tau: Optional[int] = None) -> "CommitterKey":
        """Insecure test-only setup (trapdoor from a seeded RNG), like
        the reference's `CommitterKey::new` (kzg/time.rs:49-72)."""
        rng = random.Random(seed)
        tau = tau if tau is not None else rng.randrange(1, R)
        g = g1_mul(g1_generator(), rng.randrange(1, R))
        g2 = g2_mul(g2_generator(), rng.randrange(1, R))
        taus = poly.powers(FR, tau, max_degree + 1)
        taus_canonical = fp.from_mont(FR, taus)
        powers_of_g = fixed_base_msm(g, taus_canonical)
        tau_pows = 1
        powers_of_g2 = []
        for _ in range(max_eval_points + 1):
            powers_of_g2.append(g2_mul(g2, tau_pows))
            tau_pows = tau_pows * tau % R
        return cls(powers_of_g, powers_of_g2, tau=tau)

    def max_eval_points(self) -> int:
        return len(self.powers_of_g2) - 1

    def commit(self, coeffs: jnp.ndarray) -> G1Host:
        """One G1 MSM over the SRS prefix; coeffs Montgomery (L, n)."""
        n = coeffs.shape[1]
        assert n <= self.powers_of_g.x.shape[1], (
            f"polynomial length {n} exceeds SRS size "
            f"{self.powers_of_g.x.shape[1]}"
        )
        if self.devices is not None and len(self.devices) > 1:
            from ..parallel.msm import msm_multichip

            result = msm_multichip(
                _apoint_slice(self.powers_of_g, n),
                fp.from_mont(FR, coeffs), devices=self.devices,
            )
        else:
            result = msm_mont_scalars(
                _apoint_slice(self.powers_of_g, n), coeffs
            )
        return g1.decode_jacobian(result)[0]

    def batch_commit(self, polys: Sequence[jnp.ndarray]) -> List[G1Host]:
        return [self.commit(p) for p in polys]

    def open(self, coeffs: jnp.ndarray, alpha: int):
        """-> (evaluation, proof): commitment to the quotient
        (kzg/time.rs:112-131)."""
        evaluation, quotient = divide_linear(coeffs, alpha)
        if quotient.shape[1] == 0:
            return evaluation, None
        return evaluation, self.commit(quotient)

    def open_multi_points(self, coeffs: jnp.ndarray,
                          points: Sequence[int]) -> G1Host:
        q = coeffs
        for pt in points:
            _, q = divide_linear(q, pt)
        if q.shape[1] == 0:
            return None
        return self.commit(q)

    def batch_open_multi_points(self, polys: Sequence[jnp.ndarray],
                                points: Sequence[int],
                                eval_chal: int) -> G1Host:
        """Open sum_i eta^i f_i at every point (kzg/time.rs:149-159)."""
        assert len(points) < len(self.powers_of_g2)
        etas = poly.powers_host(eval_chal, len(polys))
        batched = poly.linear_combination(FR, list(polys), etas)
        return self.open_multi_points(batched, points)


class VerifierKey:
    """Host-side verification key (kzg/mod.rs:144-149)."""

    def __init__(self, powers_of_g: List[G1Host], powers_of_g2: List):
        self.powers_of_g = powers_of_g
        self.powers_of_g2 = powers_of_g2

    @classmethod
    def from_committer_key(cls, ck: CommitterKey) -> "VerifierKey":
        m = ck.max_eval_points()
        host_g = g1.decode_affine(_apoint_slice(ck.powers_of_g, m))
        return cls(host_g, list(ck.powers_of_g2))

    def verify(self, commitment: G1Host, alpha: int, evaluation: int,
               proof: G1Host) -> None:
        """Single-point check e(C - vG, H) == e(pi, tauH - alphaH)
        (kzg/mod.rs:155-172)."""
        ep = g2_add(
            g2_mul(self.powers_of_g2[0], (-alpha) % R), self.powers_of_g2[1]
        )
        lhs = g1_add(commitment, g1_neg(g1_mul(self.powers_of_g[0], evaluation)))
        if pairing(lhs, self.powers_of_g2[0]) != pairing(proof, ep):
            raise KZGVerificationError("single-point KZG check failed")

    def verify_multi_points(self, commitments: Sequence[G1Host],
                            eval_points: Sequence[int],
                            evaluations: Sequence[Sequence[int]],
                            proof: G1Host, open_chal: int) -> None:
        """Batched multi-point check via Lagrange interpolation of the
        claimed evaluations (kzg/mod.rs:180-244).

        evaluations[i][j] = claimed f_i(eval_points[j]).
        """
        zeros_coeffs = vanishing_polynomial_host(eval_points)
        zeros = None
        for z, h in zip(zeros_coeffs, self.powers_of_g2):
            zeros = g2_add(zeros, g2_mul(h, z)) if zeros is not None else \
                g2_mul(h, z)
        # Lagrange interpolation of each claimed evaluation vector.
        etas = poly.powers_host(open_chal, len(evaluations))
        i_poly = [0] * len(eval_points)
        for evals, eta in zip(evaluations, etas):
            interp = _interpolate(eval_points, evals)
            for k, ck_ in enumerate(interp):
                i_poly[k] = (i_poly[k] + eta * ck_) % R
        i_comm = None
        for cf, gp in zip(i_poly, self.powers_of_g):
            term = g1_mul(gp, cf)
            i_comm = g1_add(i_comm, term)
        f_comm = None
        for cm, eta in zip(commitments, etas):
            f_comm = g1_add(f_comm, g1_mul(cm, eta))
        lhs = g1_add(f_comm, g1_neg(i_comm) if i_comm is not None else None)
        if pairing(lhs, self.powers_of_g2[0]) != pairing(proof, zeros):
            raise KZGVerificationError("multi-point KZG check failed")


def _interpolate(xs: Sequence[int], ys: Sequence[int]) -> List[int]:
    """Lagrange interpolation over Fr -> LE coefficients."""
    n = len(xs)
    coeffs = [0] * n
    for j in range(n):
        denom = 1
        for k in range(n):
            if k != j:
                denom = denom * (xs[j] - xs[k]) % R
        scale = ys[j] * pow(denom, -1, R) % R
        # numerator polynomial prod_{k != j} (x - x_k)
        num = [1]
        for k in range(n):
            if k == j:
                continue
            nxt = [0] * (len(num) + 1)
            for i, ci in enumerate(num):
                nxt[i] = (nxt[i] - xs[k] * ci) % R
                nxt[i + 1] = (nxt[i + 1] + ci) % R
            num = nxt
        for i, ci in enumerate(num):
            coeffs[i] = (coeffs[i] + scale * ci) % R
    return coeffs
