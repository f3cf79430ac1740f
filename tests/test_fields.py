"""Limb-engine field arithmetic: bit-exact vs the pure-Python oracle
(SURVEY.md §7 step 1 gate)."""

import random

import numpy as np
import pytest

from gemini_tpu import params
from gemini_tpu.fields import (
    FQ, FR, add, sub, neg, mont_mul, to_mont, from_mont, inv, pow_fixed,
    lane_sum, fp,
)

rnd = random.Random(99)


def _edge_values(p):
    return [0, 1, 2, p - 1, p - 2, (p - 1) // 2, params.LIMB_MASK,
            1 << 255 % p, p - (1 << 16)]


def _rand_values(p, n):
    return [rnd.randrange(p) for _ in range(n)]


@pytest.mark.parametrize("spec", [FQ, FR], ids=["Fq", "Fr"])
def test_encode_decode_roundtrip(spec):
    vals = _edge_values(spec.modulus) + _rand_values(spec.modulus, 17)
    vals = [v % spec.modulus for v in vals]
    enc = spec.encode(vals)
    assert enc.shape == (spec.n_limbs, len(vals))
    assert spec.decode(enc) == vals
    # non-Montgomery roundtrip
    assert spec.decode(spec.encode(vals, mont=False), mont=False) == vals


@pytest.mark.parametrize("spec", [FQ, FR], ids=["Fq", "Fr"])
def test_add_sub_neg(spec):
    p = spec.modulus
    xs = _edge_values(p) + _rand_values(p, 23)
    ys = list(reversed(_edge_values(p))) + _rand_values(p, 23)
    xs = [x % p for x in xs]
    ys = [y % p for y in ys]
    a, b = spec.encode(xs), spec.encode(ys)
    assert spec.decode(add(spec, a, b)) == [(x + y) % p for x, y in zip(xs, ys)]
    assert spec.decode(sub(spec, a, b)) == [(x - y) % p for x, y in zip(xs, ys)]
    assert spec.decode(neg(spec, a)) == [(-x) % p for x in xs]


@pytest.mark.parametrize("spec", [FQ, FR], ids=["Fq", "Fr"])
def test_mont_mul_bit_exact(spec):
    p = spec.modulus
    xs = [x % p for x in _edge_values(p)] + _rand_values(p, 40)
    ys = [y % p for y in reversed(_edge_values(p))] + _rand_values(p, 40)
    a, b = spec.encode(xs), spec.encode(ys)
    got = spec.decode(mont_mul(spec, a, b))
    assert got == [x * y % p for x, y in zip(xs, ys)]


@pytest.mark.parametrize("spec", [FQ, FR], ids=["Fq", "Fr"])
def test_mont_form_roundtrip(spec):
    p = spec.modulus
    xs = _rand_values(p, 8)
    raw = spec.encode(xs, mont=False)
    m = to_mont(spec, raw)
    assert spec.decode(m) == xs
    back = from_mont(spec, m)
    assert spec.decode(back, mont=False) == xs


@pytest.mark.parametrize("spec", [FQ, FR], ids=["Fq", "Fr"])
def test_scalar_broadcast(spec):
    p = spec.modulus
    xs = _rand_values(p, 10)
    s = rnd.randrange(p)
    a = spec.encode(xs)
    sc = spec.encode([s])
    assert spec.decode(mont_mul(spec, a, sc)) == [x * s % p for x in xs]


@pytest.mark.parametrize("spec", [FQ, FR], ids=["Fq", "Fr"])
def test_inv_and_pow(spec):
    p = spec.modulus
    xs = [1, 2, p - 1] + _rand_values(p, 5)
    a = spec.encode(xs)
    got = spec.decode(inv(spec, a))
    assert got == [pow(x, -1, p) for x in xs]
    e = 0xDEADBEEF
    got = spec.decode(pow_fixed(spec, a, e))
    assert got == [pow(x, e, p) for x in xs]


@pytest.mark.parametrize("spec", [FQ, FR], ids=["Fq", "Fr"])
def test_lane_sum_large_batch(spec):
    p = spec.modulus
    n = 3000  # crosses one chunk boundary at 2^13? keep fast but >1 pass
    xs = _rand_values(p, n)
    a = spec.encode(xs)
    s = lane_sum(spec, a, axis=1)
    assert s.shape[0] == spec.n_limbs + 2
    got = spec.decode_relaxed(np.asarray(s)[:, None])
    assert got == [sum(xs) % p]


def test_deep_mul_chain_stays_normalized():
    """Repeated multiplication must keep limbs normalized (regression
    against deferred-carry overflow)."""
    p = FQ.modulus
    xs = _rand_values(p, 4)
    a = FQ.encode(xs)
    acc = a
    expect = xs[:]
    for _ in range(50):
        acc = mont_mul(FQ, acc, a)
        expect = [e * x % p for e, x in zip(expect, xs)]
        assert np.asarray(acc).max() <= params.LIMB_MASK
    assert FQ.decode(acc) == expect
