"""Isolate the 2^21-lane scan-phase cliff (PERF.md round-4): the FUSED
window chunk costs 3.7x at 2^21 vs 2^20 while every standalone stage
scales flat.  This probe jits the scan phase (prefix_sums_at +
tree_reduce) as ONE program fed pre-sorted inputs, at several sizes,
to localize which fused region stops scaling.

Env: PROF_K (default 6), PROF_SIZES (comma list of logn, default
"19,20,21").
"""

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

from functools import partial


def timed(label, fn, k, units):
    out = fn()
    np.asarray(out[0][:, :1])
    t0 = time.time()
    outs = [fn() for _ in range(k)]
    for o in outs:
        np.asarray(o[0][:, :1])
    dt = (time.time() - t0) / k
    print(f"{label:32s} {dt*1e3:8.1f} ms  ({dt/units*1e9:6.1f} ns/unit)",
          flush=True)
    return dt


def main():
    k = int(os.environ.get("PROF_K", "6"))
    sizes = [int(x) for x in
             os.environ.get("PROF_SIZES", "19,20,21").split(",")]
    import random

    from gemini_tpu.params import R
    from gemini_tpu.fields.fp import FR, FQ
    from gemini_tpu.curve import g1
    from gemini_tpu.ops import ec_scan, msm as msm_mod

    from gemini_tpu.refimpl import g1_generator, g1_mul

    rnd = random.Random(1)
    base_count = 256
    host_pts = [g1_mul(g1_generator(), rnd.randrange(1, R))
                for _ in range(base_count)]
    ap = g1.encode_affine(host_pts)

    c = 16
    m = 1 << (c - 1)

    for logn in sizes:
        n = 1 << logn
        reps = -(-n // base_count)
        px = jnp.tile(ap.x, (1, reps))[:, :n]
        py = jnp.tile(ap.y, (1, reps))[:, :n]
        fx = px[:, None, :]
        fy = py[:, None, :]
        fm = jnp.ones((1, n), jnp.uint32)
        rngs = np.random.RandomState(3)
        pos = jnp.asarray(
            np.sort(rngs.randint(-1, n, size=(1, m)).astype(np.int32)))

        @jax.jit
        def scan_fused(fx, fy, fm, pos):
            bx, by, bz = ec_scan.prefix_sums_at(
                fx, fy, fm, pos,
                combiner=ec_scan.pallas_padd_points,
                combiner01=ec_scan.pallas_padd01_points)
            x, y, z = ec_scan.tree_reduce(
                (bx, by, bz), combiner=ec_scan.pallas_padd_points)
            return x[..., 0], y[..., 0], z[..., 0]

        print(f"--- n=2^{logn} ---", flush=True)
        timed(f"scan fused 2^{logn}",
              lambda: scan_fused(fx, fy, fm, pos), k, n)

        # reduce chain ONLY (no stop-scan, no walk-down): fold to m.
        # Return TINY outputs so the tunnel readback measures nothing.
        @jax.jit
        def reduce_chain(fx, fy, fm):
            cx, cy, cz = fx, fy, fm
            is01 = True
            while cx.shape[-1] > m:
                ex, ox_ = cx[..., 0::2], cx[..., 1::2]
                ey, oy_ = cy[..., 0::2], cy[..., 1::2]
                ez, oz_ = cz[..., 0::2], cz[..., 1::2]
                if is01:
                    cx, cy, cz = ec_scan.pallas_padd01_points(
                        (ex, ey, ez), (ox_, oy_, oz_))
                else:
                    cx, cy, cz = ec_scan.pallas_padd_points(
                        (ex, ey, ez), (ox_, oy_, oz_))
                is01 = False
            return cx[..., :1], cy[..., :1], cz[..., :1]

        timed(f"reduce chain 2^{logn}->2^{c-1}",
              lambda: reduce_chain(fx, fy, fm), k, n)

        # level-0 single padd01 on the even/odd split, fused with the split
        @jax.jit
        def level0(fx, fy, fm):
            ex, ox_ = fx[..., 0::2], fx[..., 1::2]
            ey, oy_ = fy[..., 0::2], fy[..., 1::2]
            ez, oz_ = fm[..., 0::2], fm[..., 1::2]
            x, y, z = ec_scan.pallas_padd01_points(
                (ex, ey, ez), (ox_, oy_, oz_))
            return x[..., :1], y[..., :1], z[..., :1]

        timed(f"level0 split+padd01 2^{logn}",
              lambda: level0(fx, fy, fm), k, n)

        # level-0 with CONTIGUOUS halves pairing (not the same math —
        # pure layout probe: is the stride-2 split the non-scaler?)
        @jax.jit
        def level0_halves(fx, fy, fm):
            h = fx.shape[-1] // 2
            x, y, z = ec_scan.pallas_padd01_points(
                (fx[..., :h], fy[..., :h], fm[..., :h]),
                (fx[..., h:], fy[..., h:], fm[..., h:]))
            return x[..., :1], y[..., :1], z[..., :1]

        timed(f"level0 halves+padd01 2^{logn}",
              lambda: level0_halves(fx, fy, fm), k, n)

        # reduce chain with halves pairing at every level (layout probe)
        @jax.jit
        def reduce_chain_halves(fx, fy, fm):
            cx, cy, cz = fx, fy, fm
            is01 = True
            while cx.shape[-1] > m:
                h = cx.shape[-1] // 2
                a = (cx[..., :h], cy[..., :h], cz[..., :h])
                b = (cx[..., h:], cy[..., h:], cz[..., h:])
                if is01:
                    cx, cy, cz = ec_scan.pallas_padd01_points(a, b)
                else:
                    cx, cy, cz = ec_scan.pallas_padd_points(a, b)
                is01 = False
            return cx[..., :1], cy[..., :1], cz[..., :1]

        timed(f"reduce halves 2^{logn}->2^{c-1}",
              lambda: reduce_chain_halves(fx, fy, fm), k, n)


if __name__ == "__main__":
    main()
