"""Ground-truth layer sanity: tower fields, curve groups, pairing.

These gate everything above them (SURVEY.md §7 step 1): the limb-engine
kernels are later tested bit-exact against this module.
"""

import random

from gemini_tpu.params import Q, R, G1_X, G1_Y
from gemini_tpu.refimpl import (
    Fq2, Fq6, Fq12,
    g1_generator, g2_generator, g1_add, g1_double, g1_mul, g1_neg,
    g2_mul, g2_add, g1_is_on_curve, g2_is_on_curve, g1_msm,
    pairing, gt_pow,
)

rnd = random.Random(1234)


def test_fq2_field_axioms():
    for _ in range(20):
        a = Fq2(rnd.randrange(Q), rnd.randrange(Q))
        b = Fq2(rnd.randrange(Q), rnd.randrange(Q))
        assert a * b == b * a
        assert (a + b) - b == a
        assert a * a.inv() == Fq2.one()
        assert a.square() == a * a


def test_fq6_fq12_inverse_roundtrip():
    def rand2():
        return Fq2(rnd.randrange(Q), rnd.randrange(Q))

    a6 = Fq6(rand2(), rand2(), rand2())
    assert a6 * a6.inv() == Fq6.one()
    a12 = Fq12(a6, Fq6(rand2(), rand2(), rand2()))
    assert a12 * a12.inv() == Fq12.one()
    # Frobenius is the q-power map.
    assert a12.frobenius(1) == a12 ** Q


def test_g1_group_law():
    g = g1_generator()
    assert g1_is_on_curve(g)
    assert g1_add(g, g1_neg(g)) is None
    assert g1_double(g) == g1_add(g, g1_mul(g, 1))
    a, b = rnd.randrange(R), rnd.randrange(R)
    pa, pb = g1_mul(g, a), g1_mul(g, b)
    assert g1_is_on_curve(pa)
    assert g1_add(pa, pb) == g1_mul(g, (a + b) % R)
    # Order r annihilates.
    assert g1_mul(g, R) is None


def test_g2_group_law():
    g = g2_generator()
    assert g2_is_on_curve(g)
    a, b = rnd.randrange(2**64), rnd.randrange(2**64)
    assert g2_add(g2_mul(g, a), g2_mul(g, b)) == g2_mul(g, a + b)


def test_g1_msm_naive():
    g = g1_generator()
    pts = [g1_mul(g, i + 1) for i in range(8)]
    scalars = [rnd.randrange(1000) for _ in range(8)]
    expected = g1_mul(g, sum((i + 1) * s for i, s in enumerate(scalars)))
    assert g1_msm(pts, scalars) == expected


def test_pairing_bilinear():
    g1, g2 = g1_generator(), g2_generator()
    e = pairing(g1, g2)
    assert not e.is_one()
    # e(aP, bQ) = e(P, Q)^(ab)
    a, b = 5, 7
    lhs = pairing(g1_mul(g1, a), g2_mul(g2, b))
    assert lhs == gt_pow(e, a * b)
    # e(P, Q)^r = 1
    assert gt_pow(e, 0).is_one() if False else (e ** R).is_one()


def test_pairing_kzg_identity():
    """The exact check the KZG verifier does:
    e(C - [v]G1, H) == e(pi, [tau]H - [z]H) for f(x)=c0+c1 x."""
    g1, g2 = g1_generator(), g2_generator()
    tau, c0, c1, z = 11, 3, 9, 4
    # commitment to f = c0 + c1 x at tau
    commit = g1_mul(g1, (c0 + c1 * tau) % R)
    v = (c0 + c1 * z) % R
    # witness polynomial (f(x)-v)/(x-z) = c1
    pi = g1_mul(g1, c1)
    lhs = pairing(g1_add(commit, g1_neg(g1_mul(g1, v))), g2)
    rhs = pairing(pi, g2_add(g2_mul(g2, tau), g2_mul(g2, (R - z))))
    assert lhs == rhs
