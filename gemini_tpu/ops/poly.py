"""Polynomial/vector helpers on limb arrays (misc.rs analogues).

Reference semantics (documented for parity, reimplemented TPU-style):
  fold_polynomial  misc.rs:52   out[k] = f[2k] + r*f[2k+1]
  powers           misc.rs:59   [1, x, x^2, ...]
  powers2          misc.rs:68   [x, x^2, x^4, ...] (2^j-th powers)
  tensor           misc.rs:133  expansion of ⊗_j (1, rho_j)
  evaluate_le      misc.rs:194  little-endian Horner evaluation
  ip               misc.rs:~235 inner product

Coefficient vectors are (L, N) Montgomery limb arrays; scalars are host
Python ints (canonical).  Anything O(log N) stays host-side; anything
O(N) is a device op.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..fields import fp
from ..fields.fp import FR, FieldSpec


def scalar(spec: FieldSpec, x: int) -> jnp.ndarray:
    """Host int -> (L, 1) Montgomery device scalar."""
    return jnp.asarray(spec.encode([x % spec.modulus]))


def powers_device(spec: FieldSpec, base, n: int):
    """(L,1) Montgomery base -> (L, n) [1, b, b^2, ..., b^(n-1)].

    Doubling construction: p_{2m} = [p_m, b^m * p_m] — log2(n) batched
    muls, each a cached jitted kernel (no monolithic scan graph).
    """
    p = spec.ones_mont((1,))
    cur = base  # b^(len(p))
    while p.shape[1] < n:
        p = jnp.concatenate([p, fp.mont_mul(spec, p, cur)], axis=1)
        cur = fp.mont_mul(spec, cur, cur)
    return p[:, :n]


def powers(spec: FieldSpec, x: int, n: int) -> jnp.ndarray:
    return powers_device(spec, scalar(spec, x), n)


def powers_host(x: int, n: int, modulus: int | None = None) -> list[int]:
    m = modulus or FR.modulus
    out = [1] * n
    for i in range(1, n):
        out[i] = out[i - 1] * x % m
    return out


def powers2_host(x: int, n: int, modulus: int | None = None) -> list[int]:
    """[x, x^2, x^4, ..., x^(2^(n-1))] (misc.rs:68 powers2)."""
    m = modulus or FR.modulus
    out = []
    cur = x % m
    for _ in range(n):
        out.append(cur)
        cur = cur * cur % m
    return out


def tensor_device(spec: FieldSpec, challenges: list[int]) -> jnp.ndarray:
    """Expansion of ⊗_j (1, rho_j): length 2^n, t[bits] = prod rho_j^bit_j.

    Built by n doubling steps: t_{j+1} = [t_j, rho_j * t_j].
    """
    t = spec.ones_mont((1,))
    for rho in challenges:
        r = scalar(spec, rho)
        t = jnp.concatenate([t, fp.mont_mul(spec, t, r)], axis=1)
    return t


def hadamard(spec: FieldSpec, a, b):
    return fp.mont_mul(spec, a, b)


def lane_prod(spec: FieldSpec, v) -> int:
    """Product of all lane elements of a (L, N) Montgomery vector ->
    canonical int, via a log-depth tree of halving Montgomery muls
    (replaces the psnark prover's former host loop over decoded ints,
    which was O(nnz) Python bigint work)."""
    n = v.shape[1]
    npad = 1 if n <= 1 else 1 << (n - 1).bit_length()
    if npad != n:
        v = jnp.concatenate([v, spec.ones_mont((npad - n,))], axis=1)
    while v.shape[1] > 1:
        half = v.shape[1] // 2
        v = fp.mont_mul(spec, v[:, :half], v[:, half:])
    return spec.decode(v)[0]


def ip(spec: FieldSpec, a, b) -> int:
    """Inner product of two (L, N) Montgomery vectors -> canonical int."""
    prod = fp.mont_mul(spec, a, b)
    s = fp.lane_sum(spec, prod, axis=1)
    return spec.decode_relaxed(jnp.asarray(s)[:, None])[0]


def evaluate_le(spec: FieldSpec, coeffs, x: int) -> int:
    """Evaluate sum_i coeffs[i] x^i (little-endian) at host scalar x."""
    n = coeffs.shape[1]
    pw = powers(spec, x, n)
    return ip(spec, coeffs, pw)


def evaluate_be(spec: FieldSpec, coeffs, x: int) -> int:
    """Big-endian evaluation (highest-degree coefficient first),
    the reference's stream convention (misc.rs:180)."""
    n = coeffs.shape[1]
    pw = powers(spec, x, n)[:, ::-1]
    return ip(spec, coeffs, pw)


def eo_split(a):
    """Even/odd columns of (..., n) via reshape + ONE transpose instead
    of stride-2 slices: Mosaic/XLA's strided slice costs 2-4x a
    contiguous relayout at 2^19+ lanes and grows with size (the
    "stride-2 cliff", benches/scsplit.py / PERF.md round 5).  Bit-
    identical outputs."""
    *lead, n = a.shape
    t = a.reshape(*lead, n // 2, 2)
    perm = list(range(len(lead))) + [len(lead) + 1, len(lead)]
    t = t.transpose(perm)
    return t[..., 0, :], t[..., 1, :]


@partial(jax.jit, static_argnums=0)
def fold_polynomial(spec: FieldSpec, f, r):
    """out[k] = f[2k] + r * f[2k+1]; f must have even length
    (pad upstream).  r is an (L, 1) Montgomery scalar."""
    f_e, f_o = eo_split(f)
    return fp.add(spec, f_e, fp.mont_mul(spec, f_o, r))


def pad_to(spec: FieldSpec, f, n: int):
    """Zero-pad (L, m) to (L, n)."""
    m = f.shape[1]
    if m == n:
        return f
    assert m < n
    return jnp.concatenate(
        [f, jnp.zeros((spec.n_limbs, n - m), jnp.uint32)], axis=1
    )


def linear_combination(spec: FieldSpec, polys, coeffs: list[int]):
    """sum_i coeffs[i] * polys[i], aligning lengths to the max
    (misc.rs:37 linear_combination)."""
    n = max(p.shape[1] for p in polys)
    acc = None
    for p, c in zip(polys, coeffs):
        term = fp.mont_mul(spec, pad_to(spec, p, n), scalar(spec, c))
        acc = term if acc is None else fp.add(spec, acc, term)
    return acc


# ---------------------------------------------------------------------------
# Closed-form structured-polynomial evaluations (misc.rs:373-399), used
# by the psnark verifier's oracle computations.  Host arithmetic mod R.
# ---------------------------------------------------------------------------


def evaluate_tensor_poly(challenges: list[int], x: int,
                         modulus: int | None = None) -> int:
    """prod_j (1 + rho_j * x^(2^j)) (misc.rs:373-383)."""
    m = modulus or FR.modulus
    res, s = 1, x % m
    for rho in challenges:
        res = res * (1 + rho * s) % m
        s = s * s % m
    return res


def evaluate_geometric_poly(rx: int, n: int,
                            modulus: int | None = None) -> int:
    """1 + rx + rx^2 + ... + rx^(n-1) (misc.rs:387-390)."""
    m = modulus or FR.modulus
    rx %= m
    if rx == 1:
        return n % m
    return (pow(rx, n, m) - 1) * pow(rx - 1, -1, m) % m


def evaluate_index_poly(x: int, n: int, modulus: int | None = None) -> int:
    """x + 2x^2 + ... + (n-1)x^(n-1) (misc.rs:394-399)."""
    m = modulus or FR.modulus
    x %= m
    assert x != 1
    x1 = (1 - x) % m
    x_n = pow(x, n - 1, m)
    return (x * (1 - x_n) % m * pow(x1 * x1 % m, -1, m)
            - (n - 1) * x_n % m * x % m * pow(x1, -1, m)) % m
