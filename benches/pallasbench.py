"""Validate + microbench the fused Pallas G1 kernels on TPU.

Checks padd (RCB complete projective add) against the host refimpl on
random points + identity/double/negation edge cases, then times the
kernel at bulk lane counts.  Timing forces host readback (axon tunnel:
block_until_ready does not wait).
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from gemini_tpu.utils.cache import setup_compilation_cache
setup_compilation_cache(os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/gemini_tpu_bench_cache"))

import jax.numpy as jnp
import numpy as np

from gemini_tpu.params import R, Q
from gemini_tpu.fields.fp import FQ
from gemini_tpu.fields import fp
from gemini_tpu.curve import g1, pallas_g1
from gemini_tpu.refimpl import g1_generator, g1_mul, g1_add as ref_add

print("backend:", jax.default_backend())


def enc_proj(pts, shape):
    """Host affine/None points -> projective (x, y, z) arrays
    (identity = (0 : 1 : 0))."""
    xs = [0 if p is None else p[0] for p in pts]
    ys = [1 if p is None else p[1] for p in pts]
    zs = [0 if p is None else 1 for p in pts]
    return (jnp.asarray(FQ.encode(xs).reshape(FQ.n_limbs, *shape)),
            jnp.asarray(FQ.encode(ys).reshape(FQ.n_limbs, *shape)),
            jnp.asarray(FQ.encode(zs).reshape(FQ.n_limbs, *shape)))


def dec_proj(t):
    """Projective arrays -> host affine/None list."""
    xs = FQ.decode(t[0])
    ys = FQ.decode(t[1])
    zs = FQ.decode(t[2])
    out = []
    for xi, yi, zi in zip(xs, ys, zs):
        if zi == 0:
            out.append(None)
        else:
            zinv = pow(zi, -1, Q)
            out.append((xi * zinv % Q, yi * zinv % Q))
    return out


def main():
    rnd = random.Random(42)
    G = g1_generator()
    pts_a, pts_b, want = [], [], []
    for _ in range(12):
        a = g1_mul(G, rnd.randrange(1, R))
        b = g1_mul(G, rnd.randrange(1, R))
        pts_a.append(a)
        pts_b.append(b)
        want.append(ref_add(a, b))
    # edge cases: P+P, P+(-P), P+inf, inf+P, inf+inf
    P = g1_mul(G, 777)
    negP = (P[0], Q - P[1])
    for a, b in [(P, P), (P, negP), (P, None), (None, P), (None, None)]:
        pts_a.append(a)
        pts_b.append(b)
        want.append(ref_add(a, b))
    n = len(pts_a)
    npad = 256
    pts_a += [None] * (npad - n)
    pts_b += [None] * (npad - n)
    A = enc_proj(pts_a, (npad,))
    B = enc_proj(pts_b, (npad,))
    t0 = time.time()
    out = pallas_g1.padd(A, B)
    got = dec_proj(out)[:n]
    print(f"padd compile+run: {time.time()-t0:.1f}s")
    ok = all(g == w for g, w in zip(got, want))
    print("padd correctness:", "OK" if ok else "FAIL")
    if not ok:
        for i, (g, w) in enumerate(zip(got, want)):
            if g != w:
                print(" mismatch", i, "got", g, "want", w)
        sys.exit(1)

    # throughput: bulk lanes.  NB: force with a tiny dependent slice —
    # a full-array np.asarray measures the axon tunnel's host-transfer
    # bandwidth (~5 GB/s), not the kernel (PERF.md round 2).
    force = jax.jit(lambda t: t[0][:, :1])
    for logn in (14, 16, 18, 20):
        m = 1 << logn
        reps = -(-m // npad)
        big = tuple(jnp.tile(c, (1, reps))[:, :m] for c in A)
        big2 = tuple(jnp.tile(c, (1, reps))[:, :m] for c in B)
        np.asarray(force(pallas_g1.padd(big, big2)))  # warm
        t0 = time.time()
        iters = 3
        for _ in range(iters):
            o = pallas_g1.padd(big, big2)
        np.asarray(force(o))
        dt = (time.time() - t0) / iters
        print(f"padd {m} lanes: {dt*1e3:.1f} ms = {dt/m*1e9:.1f} ns/add "
              f"({m/dt/1e6:.2f} M adds/s)")


if __name__ == "__main__":
    main()
