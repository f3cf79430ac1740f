"""Isolate pallas kernel costs: chain K invocations of (a) the bare
montmul kernel, (b) a trivial passthrough kernel, at the same shapes
as the group-law kernels.  Difference reveals compute vs per-step
machinery."""

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

from gemini_tpu.curve import pallas_g1
from gemini_tpu.fields.fp import FQ

L = 24
K = int(os.environ.get("MM_CHAIN", "64"))
LOGN = int(os.environ.get("MM_LOGN", "16"))
TILE = int(os.environ.get("GEMINI_TPU_PTILE", "256"))


def _copy_kernel(k, a, b, o):
    o[:] = a[:] + b[:]


def run_chain(name, kernel, n):
    spec = lambda: pl.BlockSpec((L, TILE), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
    cspec = pallas_g1._const_spec()
    call = pl.pallas_call(
        kernel,
        grid=(n // TILE,),
        in_specs=[cspec, spec(), spec()],
        out_specs=spec(),
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
    )
    consts = pallas_g1._consts()

    @jax.jit
    def chain(a, b):
        def body(i, acc):
            return call(consts, acc, b)
        return jax.lax.fori_loop(0, K, body, a)

    a = jnp.asarray(FQ.encode([3] * n))
    b = jnp.asarray(FQ.encode([5] * n))
    # tiny dependent readback: full-array asarray measures the tunnel,
    # not the kernel (PERF.md round 2)
    force = jax.jit(lambda t: t[:, :1])
    t0 = time.time(); np.asarray(force(chain(a, b))); warm = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        np.asarray(force(chain(a, b)))
        best = min(best, time.time() - t0)
    per = best / (K * n)
    print(f"{name:>12} n=2^{LOGN} tile={TILE}: {best*1e3:8.1f} ms chain({K}) "
          f"-> {per*1e9:8.2f} ns/lane  (warm {warm:.1f}s)")


def main():
    n = 1 << LOGN
    run_chain("copy+add", _copy_kernel, n)
    run_chain("montmul", pallas_g1._mm_kernel, n)


if __name__ == "__main__":
    main()
