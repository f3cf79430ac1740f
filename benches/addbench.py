"""Microbenchmark: G1 add throughput per backend path.

Measures ns per lane-add for:
  * tape VM path (ops/tape.py, current MSM workhorse)
  * Pallas fused kernel (curve/pallas_g1.py)
  * flat unrolled XLA graph (fields.fp.mont_mul_unrolled based add)

Each measurement chains K adds inside one jit (fori_loop) so dispatch
overhead amortizes, and forces a host readback (the axon tunnel does
not honor block_until_ready).

Usage: python benches/addbench.py [lanes_log2 ...]
Env: ADD_CHAIN (default 8)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from gemini_tpu.utils.cache import setup_compilation_cache
setup_compilation_cache(os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/gemini_tpu_bench_cache"))

import jax.numpy as jnp
import numpy as np
from functools import partial

from gemini_tpu.fields import fp
from gemini_tpu.fields.fp import FQ
from gemini_tpu.curve import g1
from gemini_tpu.curve.g1 import JPoint
from gemini_tpu.ops import tape

K = int(os.environ.get("ADD_CHAIN", "8"))
L = FQ.n_limbs


def make_points(n):
    """Random-ish valid points: small multiples of G, tiled."""
    from gemini_tpu.refimpl import g1_generator, g1_mul
    import random
    rnd = random.Random(42)
    base = [g1_mul(g1_generator(), rnd.randrange(1, 1 << 60)) for _ in range(64)]
    ap = g1.encode_affine(base)
    reps = -(-n // 64)
    big = g1.APoint(
        jnp.tile(ap.x, (1, reps))[:, :n],
        jnp.tile(ap.y, (1, reps))[:, :n],
        jnp.tile(ap.inf, (reps,))[:n],
    )
    return g1.from_affine(big)


def timed(fn, *args):
    t0 = time.time()
    out = fn(*args)
    leaves = jax.tree_util.tree_leaves(out)
    np.asarray(leaves[0])
    return time.time() - t0, out


def bench_path(name, add_fn, p, q, n):
    @jax.jit
    def chain(px, py, pz, qx, qy, qz):
        def body(i, acc):
            o = add_fn(JPoint(*acc), JPoint(qx, qy, qz))
            return (o.x, o.y, o.z)
        return jax.lax.fori_loop(0, K, body, (px, py, pz))

    args = (p.x, p.y, p.z, q.x, q.y, q.z)
    tw, _ = timed(chain, *args)  # warm (compile)
    best = float("inf")
    for _ in range(3):
        t, _ = timed(chain, *args)
        best = min(best, t)
    per_add = best / (K * n)
    print(f"{name:>28} n=2^{int(np.log2(n)):2d}: {best*1e3:9.1f} ms chain "
          f"({K} adds)  -> {per_add*1e9:9.2f} ns/lane-add "
          f"({1/per_add/1e6:8.2f} M adds/s)   [warm {tw:.1f}s]")
    return per_add


def tape_add(p, q):
    x3, y3, z3, h, r, xd, yd, zd = tape.run(
        FQ, g1._ADD_PROG, [p.x, p.y, p.z, q.x, q.y, q.z]
    )
    out = JPoint(x3, y3, z3)
    same = jnp.logical_and(fp.is_zero(FQ, h), fp.is_zero(FQ, r))
    out = g1.select_point(same, JPoint(xd, yd, zd), out)
    out = g1.select_point(g1.is_infinity(p), q, out)
    out = g1.select_point(g1.is_infinity(q), p, out)
    return out


def pallas_add(p, q):
    from gemini_tpu.curve import pallas_g1
    return JPoint(*pallas_g1.add(p, q))


def flat_add(p, q):
    return g1._add_flat(p, q)


def pallas_padd(p, q):
    from gemini_tpu.curve import pallas_g1
    o = pallas_g1.padd((p.x, p.y, p.z), (q.x, q.y, q.z))
    return JPoint(*o)


def main():
    logs = [int(a) for a in sys.argv[1:]] or [14, 16]
    which = os.environ.get("ADD_WHICH", "tape,pallas,flat").split(",")
    for lg in logs:
        n = 1 << lg
        p = make_points(n)
        q = make_points(n)
        if "tape" in which:
            bench_path("tape VM", tape_add, p, q, n)
        if "pallas" in which:
            try:
                bench_path("pallas fused", pallas_add, p, q, n)
            except Exception as e:
                print(f"pallas failed: {type(e).__name__}: {e}")
        if "flat" in which:
            bench_path("flat unrolled XLA", flat_add, p, q, n)
        if "padd" in which:
            bench_path("pallas RCB projective", pallas_padd, p, q, n)


if __name__ == "__main__":
    main()
