"""Measure raw VPU u32 multiply/add throughput inside a Pallas kernel.

A chain of K dependent multiply-adds on a VMEM-resident (ROWS, LANES)
block, grid over lane tiles. Reports lane-ops/s — the ceiling any
limb-arithmetic kernel can hope for.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = int(os.environ.get("VPU_CHAIN", "512"))   # dependent mul-adds
ROWS = int(os.environ.get("VPU_ROWS", "32"))
TILE = int(os.environ.get("VPU_TILE", "1024"))
GRID = int(os.environ.get("VPU_GRID", "64"))
DTYPE = os.environ.get("VPU_DTYPE", "uint32")


def make_kernel(k):
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]

        acc = a
        for _ in range(k):
            acc = acc * b + a
        o_ref[:] = acc[:8, :128]
    return kernel


def run(k, a, b, dt, n, grid):
    f = pl.pallas_call(
        make_kernel(k),
        grid=(grid,),
        in_specs=[pl.BlockSpec((ROWS, TILE), lambda i: (0, i % 64),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), dt),
    )
    jf = jax.jit(f)
    t0 = time.time(); np.asarray(jf(a, b)); warm = time.time() - t0
    best = float("inf")
    for _ in range(5):
        t0 = time.time(); np.asarray(jf(a, b)); best = min(best, time.time() - t0)
    return best, warm


def main():
    n = TILE * 64
    dt = jnp.dtype(DTYPE)
    if dt == jnp.float32:
        a = jnp.ones((ROWS, n), dt) * 1.0000001
        b = jnp.ones((ROWS, n), dt) * 0.9999999
    else:
        a = jnp.arange(ROWS * n, dtype=dt).reshape(ROWS, n) | 1
        b = (jnp.arange(ROWS * n, dtype=dt).reshape(ROWS, n) * 7) | 1

    k1, k2 = K // 4, K
    t_short, w1 = run(k1, a, b, dt, n, GRID)
    t_long, w2 = run(k2, a, b, dt, n, GRID)
    marginal = t_long - t_short
    extra_ops = 2.0 * (k2 - k1) * ROWS * TILE * GRID
    print(f"dtype={DTYPE} rows={ROWS} tile={TILE} grid={GRID}: "
          f"K{k1}={t_short*1e3:.2f}ms K{k2}={t_long*1e3:.2f}ms "
          f"-> {extra_ops/marginal/1e12:.3f} T lane-ops/s marginal "
          f"(warm {w1:.1f}/{w2:.1f}s)")


if __name__ == "__main__":
    main()
