"""Pipelined per-stage MSM profiling: each stage runs K times
back-to-back with ONE tiny readback at the end, so the ~90 ms tunnel
round-trip amortizes away and the per-iteration figure is real device
time.  Env: PROF_LOGN (default 20), PROF_K (default 8)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from gemini_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache(
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/gemini_tpu_bench_cache"))

import jax.numpy as jnp
import numpy as np


def timed(label, fn, k, units, touch):
    """fn() -> out; touch(out) -> small arrays to force readback."""
    out = fn()
    np.asarray(touch(out)[0])  # warm/compile
    t0 = time.time()
    outs = [fn() for _ in range(k)]
    for o in outs:
        for a in touch(o):
            np.asarray(a)
    dt = (time.time() - t0) / k
    print(f"{label:28s} {dt*1e3:8.1f} ms  ({dt/units*1e9:6.1f} ns/unit)")
    return dt


def main():
    logn = int(os.environ.get("PROF_LOGN", "20"))
    k = int(os.environ.get("PROF_K", "8"))
    n = 1 << logn
    import random

    from gemini_tpu.params import R
    from gemini_tpu.fields.fp import FR, FQ
    from gemini_tpu.curve import g1, pallas_g1
    from gemini_tpu.ops import ec_scan, msm as msm_mod
    from gemini_tpu.refimpl import g1_generator, g1_mul

    rnd = random.Random(1)
    base_count = 256
    host_pts = [g1_mul(g1_generator(), rnd.randrange(1, R))
                for _ in range(base_count)]
    ap = g1.encode_affine(host_pts)
    reps = -(-n // base_count)
    px = jnp.tile(ap.x, (1, reps))[:, :n]
    py = jnp.tile(ap.y, (1, reps))[:, :n]
    pinf = jnp.tile(ap.inf, (reps,))[:n]

    rng = np.random.RandomState(3)
    scalars = np.zeros((FR.n_limbs, n), dtype=np.uint32)
    for i in range(FR.n_limbs):
        scalars[i] = rng.randint(0, 1 << 16, size=n).astype(np.uint32)
    scalars[FR.n_limbs - 1] &= 0x0FFF
    scalars = jnp.asarray(scalars)

    c, Wc = msm_mod.plan_window(n)
    W = -(-255 // c)
    m = 1 << (c - 1)
    print(f"n=2^{logn} c={c} W={W} Wc={Wc} m=2^{c-1} K={k} "
          f"ptile={os.environ.get('GEMINI_TPU_PTILE', '1024(default)')}")

    pp = msm_mod._pack_xy(px, py)
    mags, negs = msm_mod.extract_signed_digits(scalars, c)
    mchunk, nchunk = mags[:Wc], negs[:Wc]

    # full window chunk
    dt_chunk = timed(
        "window chunk", lambda: msm_mod._window_chunk(
            pp, pinf, mchunk, nchunk, c, True),
        k, Wc * (n + 3 * m), lambda o: (o[0],))

    # sort+gather
    dt_sg = timed(
        "sort+gather", lambda: msm_mod._sort_gather_proj(
            pp, pinf, mchunk, nchunk),
        k, Wc * n, lambda o: (o[0][:, :, :1], o[3][:, :1]))

    # sort alone
    @jax.jit
    def sort_only(pinf, mchunk, nchunk):
        key = ((mchunk << jnp.uint32(2))
               | (nchunk.astype(jnp.uint32) << jnp.uint32(1))
               | jnp.broadcast_to(pinf, mchunk.shape).astype(jnp.uint32))
        iota = jnp.broadcast_to(
            jnp.arange(mchunk.shape[1], dtype=jnp.int32), mchunk.shape)
        skey, order = jax.lax.sort((key, iota), num_keys=1)
        return skey[:, :1], order[:, :1]

    timed("sort alone", lambda: sort_only(pinf, mchunk, nchunk),
          k, Wc * n, lambda o: o)

    # boundaries alone
    fx, fy, fm, sd = msm_mod._sort_gather_proj(pp, pinf, mchunk, nchunk)

    @jax.jit
    def bound_only(sd):
        return msm_mod._boundary_positions(sd, c)

    timed("boundaries", lambda: bound_only(sd), k, Wc * m,
          lambda o: (o[:, :1],))

    pos = bound_only(sd)

    # prefix_sums_at alone (the scan phase)
    def scans():
        return ec_scan.prefix_sums_at(
            fx, fy, fm, pos,
            combiner=ec_scan.pallas_padd_points,
            combiner01=ec_scan.pallas_padd01_points)

    n_adds = Wc * (n + 3 * m)
    dt_scan = timed("prefix_sums_at", scans, k, n_adds,
                    lambda o: (o[0][:, :, :1],))

    bx, by, bz = scans()

    # tree reduce alone
    timed("tree_reduce", lambda: ec_scan.tree_reduce(
        (bx, by, bz), combiner=ec_scan.pallas_padd_points),
        k, Wc * m, lambda o: (o[0],))

    # raw padd at (Wc, n) batch — the kernel ceiling
    one = FQ.ones_mont((Wc, n))
    zx = jnp.broadcast_to(px[:, None, :], (FQ.n_limbs, Wc, n))
    a = (zx, jnp.broadcast_to(py[:, None, :], (FQ.n_limbs, Wc, n)), one)
    timed("padd raw (Wc,n)", lambda: pallas_g1.padd(a, a), k, Wc * n,
          lambda o: (o[0][:, :, :1],))

    # padd01 raw
    mk = jnp.ones((Wc, n), jnp.uint32)
    a01 = (a[0], a[1], mk)
    timed("padd01 raw (Wc,n)", lambda: pallas_g1.padd01(a01, a01), k, Wc * n,
          lambda o: (o[0][:, :, :1],))

    print(f"chunk total {dt_chunk*1e3:.1f} ms vs "
          f"sort+gather {dt_sg*1e3:.1f} + scans {dt_scan*1e3:.1f}")


if __name__ == "__main__":
    main()
