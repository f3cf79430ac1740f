"""Batched G1 kernel vs the pure-Python oracle (SURVEY.md §7 step 4
gate): group law, completeness corner cases, scalar mul."""

import random

import jax.numpy as jnp
import numpy as np

from gemini_tpu.params import R
from gemini_tpu.refimpl import (
    g1_add, g1_double, g1_generator, g1_mul, g1_neg,
)
from gemini_tpu.curve import (
    APoint, add, add_mixed, decode_jacobian, double, encode_affine,
    from_affine, infinity, neg, scalar_mul, to_affine, decode_affine,
)

rnd = random.Random(7)
G = g1_generator()


def _rand_points(n):
    return [g1_mul(G, rnd.randrange(1, R)) for _ in range(n)]


def test_double_matches_oracle():
    pts = [G] + _rand_points(5) + [None]
    p = from_affine(encode_affine(pts))
    got = decode_jacobian(double(p))
    assert got == [g1_double(q) for q in pts]


def test_add_complete_cases():
    a = _rand_points(3)
    cases = [
        (a[0], a[1]),          # generic
        (a[0], a[0]),          # P == Q -> double
        (a[0], g1_neg(a[0])),  # P == -Q -> infinity
        (None, a[1]),          # inf + Q
        (a[2], None),          # P + inf
        (None, None),          # inf + inf
    ]
    ps = from_affine(encode_affine([c[0] for c in cases]))
    qs = from_affine(encode_affine([c[1] for c in cases]))
    got = decode_jacobian(add(ps, qs))
    assert got == [g1_add(x, y) for x, y in cases]


def test_add_mixed_complete_cases():
    a = _rand_points(3)
    cases = [
        (a[0], a[1]),
        (a[0], a[0]),
        (a[0], g1_neg(a[0])),
        (None, a[1]),
        (a[2], None),
        (None, None),
    ]
    ps = from_affine(encode_affine([c[0] for c in cases]))
    qs = encode_affine([c[1] for c in cases])
    got = decode_jacobian(add_mixed(ps, qs))
    assert got == [g1_add(x, y) for x, y in cases]


def test_affine_roundtrip():
    pts = _rand_points(4) + [None]
    p = from_affine(encode_affine(pts))
    # run through some jacobian ops to denormalize z
    p3 = add(double(p), p)
    back = decode_affine(to_affine(p3))
    assert back == [g1_mul(q, 3) for q in pts]


def test_scalar_mul():
    pts = _rand_points(3) + [None]
    ks = [rnd.randrange(R) for _ in range(3)] + [5]
    nbits = 64  # keep the test fast; full-width exercised in MSM tests
    ks = [k % (1 << nbits) for k in ks]
    bits = np.zeros((nbits, len(pts)), dtype=bool)
    for j, k in enumerate(ks):
        for i in range(nbits):
            bits[i, j] = (k >> i) & 1
    p = from_affine(encode_affine(pts))
    got = decode_jacobian(scalar_mul(p, jnp.asarray(bits)))
    assert got == [g1_mul(q, k) for q, k in zip(pts, ks)]


def test_neg_and_infinity():
    pts = _rand_points(2)
    p = from_affine(encode_affine(pts))
    s = add(p, neg(p))
    assert decode_jacobian(s) == [None, None]
    assert decode_jacobian(infinity((2,))) == [None, None]
