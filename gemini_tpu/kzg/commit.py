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
from functools import partial
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
from ..ops.msm import extract_digits, msm_batch, msm_mont_scalars
from ..refimpl import g1_generator, g2_generator
from ..hostcurve import (
    g1_add, g1_mul, g1_neg, g2_mul, g2_add, g2_neg, pairing, g1_msm,
)

G1Host = Optional[Tuple[int, int]]

_fr_add_jit = jax.jit(lambda a, b: fp.add(FR, a, b))


class KZGVerificationError(Exception):
    pass


def _apoint_slice(a: APoint, n: int) -> APoint:
    return APoint(a.x[:, :n], a.y[:, :n], a.inf[:n])


def _apoint_gather(a: APoint, idx) -> APoint:
    return APoint(a.x[:, idx], a.y[:, idx], a.inf[idx])


_FB_JIT: dict = {}


def _fb_tree_cached(tblp, tbl_inf, idx, use_proj: bool):
    """`_fb_tree` through the disk trace cache (utils/xjit.py): the
    gather + log2(W)-level pallas tree re-traces per (table, block)
    shape each process — tens of seconds of warm SRS-setup cost."""
    import sys as _sys

    from ..curve import pallas_g1 as _pg
    from ..ops import ec_scan as _ec
    from ..utils import xjit

    fn = _FB_JIT.get(use_proj)
    if fn is None:
        fn = jax.jit(lambda a, b, c: _fb_tree(a, b, c, use_proj))
        _FB_JIT[use_proj] = fn
    return xjit.export_cached(
        "fb_tree", fn, (_sys.modules[__name__], _pg, _ec, fp),
        tblp, tbl_inf, idx, statics=(use_proj,),
    )


@partial(jax.jit, static_argnums=(3,))
def _fb_tree(tblp, tbl_inf, idx, use_proj: bool):
    """One packed gather of every window's table entry + a tree
    reduction over the WINDOW axis (log2(W) complete adds per scalar
    instead of W sequential tape-VM mixed adds — the sequential chain
    was ~38 s at 2^14 on TPU, round-3 trace).  Returns Jacobian
    coordinate planes (L, n)."""
    from ..ops import ec_scan
    from ..ops.msm import (
        _proj_to_jacobian, _tape_padd01, _unpack_half,
    )

    if use_proj:
        comb01 = ec_scan.pallas_padd01_points
        comb = ec_scan.pallas_padd_points
    else:
        comb01 = _tape_padd01
        comb = ec_scan.add_points
    g = tblp[:, idx]  # (24, W, n) packed x|y
    gx = _unpack_half(g[:12])
    gy = _unpack_half(g[12:])
    ginf = tbl_inf[idx]  # (W, n)
    one = FQ.ones_mont(ginf.shape)
    gy = fp.select(ginf, one, gy)
    gx = fp.select(ginf, jnp.zeros_like(gx), gx)
    mask = jnp.logical_not(ginf)
    # Level 0 on z in {0, 1}; W is a power of two (c = 8 -> W = 32).
    h = gx.shape[1] // 2
    x, y, z = comb01(
        (gx[:, :h], gy[:, :h], mask[:h]),
        (gx[:, h:], gy[:, h:], mask[h:]),
    )
    while x.shape[1] > 1:
        h = x.shape[1] // 2
        x, y, z = comb(
            (x[:, :h], y[:, :h], z[:, :h]),
            (x[:, h:], y[:, h:], z[:, h:]),
        )
    x, y, z = x[:, 0], y[:, 0], z[:, 0]
    if use_proj:
        return _proj_to_jacobian(x, y, z)
    return x, y, z


def fixed_base_msm(base: G1Host, scalars_canonical: jnp.ndarray,
                   c: int = 8, block: int = 1 << 15) -> APoint:
    """[s_i * base for i] as one batched device computation.

    Host precomputes the window table T[w][d] = d * 2^(c*w) * base
    (W * 2^c small host ops); the device gathers one packed table row
    per (window, scalar) and tree-reduces over the window axis
    (`_fb_tree`), blocked over scalars to bound the (L, W, block)
    working set.  Mirrors FixedBase::msm usage in SRS setup
    (kzg/time.rs:55-59).
    """
    from ..ops.msm import _pack_xy, _use_proj
    from ..utils.trace import start_timer, end_timer

    n = scalars_canonical.shape[1]
    n_windows = -(-255 // c)
    t = start_timer("fixed_base_msm::host table")
    table: List[G1Host] = []
    for w in range(n_windows):
        base_w = g1_mul(base, 1 << (c * w))
        row: List[G1Host] = [None]
        for _ in range((1 << c) - 1):
            row.append(g1_add(row[-1], base_w))
        table.extend(row)
    tbl = g1.encode_affine(table)
    tblp = _pack_xy(jnp.asarray(tbl.x), jnp.asarray(tbl.y))
    tbl_inf = jnp.asarray(tbl.inf)
    end_timer(t)
    t = start_timer("fixed_base_msm::device adds")
    digits = extract_digits(scalars_canonical, c)
    offs = jnp.arange(n_windows, dtype=jnp.uint32)[:, None] << jnp.uint32(c)
    idx = digits + offs  # (W, n); digit 0 rows hit table entry None
    use_proj = _use_proj()
    outs = []
    for s in range(0, n, block):
        blk = idx[:, s:s + block]
        if blk.shape[1] < block and n > block:  # keep one compiled shape
            blk = jnp.concatenate(
                [blk, jnp.zeros(
                    (n_windows, block - blk.shape[1]), jnp.uint32)
                 + offs],
                axis=1,
            )
        outs.append(_fb_tree_cached(tblp, tbl_inf, blk, use_proj))
    x = jnp.concatenate([o[0] for o in outs], axis=1)[:, :n]
    y = jnp.concatenate([o[1] for o in outs], axis=1)[:, :n]
    z = jnp.concatenate([o[2] for o in outs], axis=1)[:, :n]
    acc = JPoint(x, y, z)
    end_timer(t)
    t = start_timer("fixed_base_msm::to_affine")
    out = g1.to_affine(acc)
    end_timer(t)
    return out


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
        import os

        rng = random.Random(seed)
        tau = tau if tau is not None else rng.randrange(1, R)
        g = g1_mul(g1_generator(), rng.randrange(1, R))
        g2 = g2_mul(g2_generator(), rng.randrange(1, R))
        from ..native import bls as _nbls

        use_host_fb = os.environ.get("GEMINI_TPU_HOST_FIXED_BASE")
        if use_host_fb is None:
            use_host_fb = jax.default_backend() == "cpu"
        else:
            use_host_fb = use_host_fb == "1"
        if use_host_fb and _nbls.available():
            # CPU backend: the native windowed fixed-base MSM beats
            # compiling the device table-gather pipeline by minutes
            # per fresh shape (the SRS is a test fixture there).
            taus_int, t = [], 1
            for _ in range(max_degree + 1):
                taus_int.append(t)
                t = t * tau % R
            powers_of_g = g1.encode_affine(
                _nbls.g1_fixed_base(g, taus_int))
        else:
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
        """One batched-window MSM pipeline for ALL polynomials (the
        fold-tree commit case: log-n polynomials of halving sizes).
        Per-MSM pipeline startup dominated `[self.commit(p) for p in
        polys]` (~53 s for 14 tiny commits at 2^14, round-3 trace)."""
        polys = list(polys)
        if not polys:
            return []
        nmax = max(p.shape[1] for p in polys)
        assert nmax <= self.powers_of_g.x.shape[1], (
            f"polynomial length {nmax} exceeds SRS size "
            f"{self.powers_of_g.x.shape[1]}"
        )
        # Group by pow-4 size bucket: msm_batch pads every set to the
        # LARGEST, so stacking the whole fold tree (sizes n, n/2, ...,
        # 2) in one call made every tiny commit pay a full-size window
        # chunk — ~6x the lane work at 2^18 (tensorcheck::batch_commit
        # was 14 s of the 46 s prover).  Per-bucket calls keep the
        # shared-pipeline win within a bucket and cost one extra
        # readback per bucket (~9 ms each).
        from ..ops import scan as scan_util

        if self.devices is not None and len(self.devices) > 1:
            from ..parallel.msm import msm_batch_multichip

            run = lambda sets: msm_batch_multichip(
                self.powers_of_g, sets, devices=self.devices)
        else:
            run = lambda sets: msm_batch(self.powers_of_g, sets)
        canon = [fp.from_mont(FR, p) for p in polys]
        groups: dict = {}
        for i, p in enumerate(canon):
            groups.setdefault(
                scan_util.bucket4(max(p.shape[1], 1), floor=256), []
            ).append(i)
        results: list = [None] * len(polys)
        for b in sorted(groups, reverse=True):
            idxs = groups[b]
            for i, r in zip(idxs, run([canon[i] for i in idxs])):
                results[i] = r
        return [g1.decode_jacobian(r)[0] for r in results]

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
        i_comm = g1_msm(list(self.powers_of_g[:len(i_poly)]), i_poly)
        f_comm = g1_msm(list(commitments), list(etas))
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
