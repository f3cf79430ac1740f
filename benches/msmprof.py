"""Phase-level MSM profiling on the real chip.

Times (with full host readback — block_until_ready does not wait
through the axon tunnel):
  1. raw fused padd throughput at a big batch (kernel ceiling),
  2. one _window_chunk (sort + suffix scan + gather + reduce),
  3. the full msm,
so the gap between kernel ceiling and pipeline shows which phase eats
it.  Env: PROF_LOGN (default 18), GEMINI_TPU_PTILE.
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


def readback(*arrs):
    for a in arrs:
        np.asarray(a)


def main():
    logn = int(os.environ.get("PROF_LOGN", "18"))
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
    # < 2^252 < R: the signed-digit recode requires reduced scalars
    scalars[FR.n_limbs - 1] &= 0x0FFF
    scalars = jnp.asarray(scalars)

    c, Wc = msm_mod.plan_window(n)
    W = -(-255 // c)
    print(f"n=2^{logn} c={c} W={W} chunks={-(-W // Wc)} "
          f"ptile={os.environ.get('GEMINI_TPU_PTILE', '256')}")

    # --- 1. raw padd ceiling: (L, Wc, n) batch, one dispatch ---
    one = FQ.ones_mont((Wc, n))
    zx = jnp.broadcast_to(px[:, None, :], (FQ.n_limbs, Wc, n))
    a = (zx, jnp.broadcast_to(py[:, None, :], (FQ.n_limbs, Wc, n)), one)
    b = (a[0], a[1], one)
    out = pallas_g1.padd(a, b)
    readback(out[0][:, :, :1])  # compile + warm (small readback:
    # pulling the full (L, Wc, n) output through the tunnel costs
    # ~100 MB and would dominate the timing)
    t0 = time.time()
    out = pallas_g1.padd(a, b)
    readback(out[0][:, :, :1], out[1][:, :, :1], out[2][:, :, :1])
    dt = time.time() - t0
    lanes = Wc * n
    print(f"padd raw: {dt*1e3:.1f} ms for {lanes} lane-adds "
          f"= {dt/lanes*1e9:.0f} ns/add -> ceiling "
          f"{lanes/dt/ (2*W):,.0f} pts/s (scan-dominated model)")

    # --- 2. one window chunk ---
    pp = msm_mod._pack_xy(px, py)
    mags, negs = msm_mod.extract_signed_digits(scalars, c)
    mchunk, nchunk = mags[:Wc], negs[:Wc]
    x, y, z = msm_mod._window_chunk(pp, pinf, mchunk, nchunk, c, True)
    readback(x)
    t0 = time.time()
    x, y, z = msm_mod._window_chunk(pp, pinf, mchunk, nchunk, c, True)
    readback(x)
    dt_chunk = time.time() - t0
    import math as _math
    _m = 1 << (c - 1)
    adds = Wc * (n + 2 * _m + _m * max(0, int(_math.log2(n / max(_m, 1)))) + _m)
    print(f"window chunk: {dt_chunk*1e3:.1f} ms (~{adds} adds, "
          f"{dt_chunk/adds*1e9:.0f} ns/add effective)")

    # --- 2b. phase breakdown (tiny readbacks) ---
    sg = msm_mod._sort_gather_proj
    gx, gy, gm, sd = sg(pp, pinf, mchunk, nchunk)
    readback(gx[:, :, :1])
    t0 = time.time()
    gx, gy, gm, sd = sg(pp, pinf, mchunk, nchunk)
    readback(gx[:, :, :1], gy[:, :, :1], sd[:, :1])
    print(f"sort+gather: {(time.time()-t0)*1e3:.1f} ms")

    # sort alone (key sort + iota payload, no coordinate gather)
    @jax.jit
    def sort_only(pinf, mchunk, nchunk):
        key = ((mchunk << jnp.uint32(2))
               | (nchunk.astype(jnp.uint32) << jnp.uint32(1))
               | jnp.broadcast_to(pinf, mchunk.shape).astype(jnp.uint32))
        iota = jnp.broadcast_to(
            jnp.arange(mchunk.shape[1], dtype=jnp.int32), mchunk.shape)
        skey, order = jax.lax.sort((key, iota), num_keys=1)
        return skey[:, :1], order[:, :1]

    s = sort_only(pinf, mchunk, nchunk)
    readback(*s)
    t0 = time.time()
    s = sort_only(pinf, mchunk, nchunk)
    readback(*s)
    print(f"sort alone: {(time.time()-t0)*1e3:.1f} ms")

    @jax.jit
    def bound_only(sd):
        return msm_mod._boundary_positions(sd, c)[:, :1]

    b = bound_only(sd)
    readback(b)
    t0 = time.time()
    b = bound_only(sd)
    readback(b)
    print(f"boundaries alone: {(time.time()-t0)*1e3:.1f} ms "
          f"({os.environ.get('GEMINI_TPU_BOUND', 'hist')})")

    @jax.jit
    def scan_only(gx, gy, gm, sd):
        pos = msm_mod._boundary_positions(sd, c)
        out = msm_mod.ec_scan.prefix_sums_at(
            gx, gy, gm, pos,
            combiner=msm_mod.ec_scan.pallas_padd_points,
            combiner01=msm_mod.ec_scan.pallas_padd01_points)
        return [v[..., :1] for v in out]

    s = scan_only(gx, gy, gm, sd)
    readback(s[0])
    t0 = time.time()
    s = scan_only(gx, gy, gm, sd)
    readback(*s)
    mm = 1 << (c - 1)
    import math
    est = n + 2 * mm + mm * max(0, round(math.log2(n / max(mm, 1))))
    print(f"positional sums alone: {(time.time()-t0)*1e3:.1f} ms "
          f"(~{Wc*est} adds, {(time.time()-t0)/(Wc*est)*1e9:.0f} ns/add)")

    # --- 3. full msm ---
    from gemini_tpu.ops.msm import msm

    out = msm(g1.APoint(px, py, pinf), scalars, c=c)
    readback(out.x)
    t0 = time.time()
    out = msm(g1.APoint(px, py, pinf), scalars, c=c)
    readback(out.x, out.y, out.z)
    dt_full = time.time() - t0
    print(f"full msm: {dt_full:.2f} s = {n/dt_full:,.0f} pts/s")


if __name__ == "__main__":
    main()
