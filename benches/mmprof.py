"""Montgomery-multiply kernel roofline probe.

Times the fused Pallas mm and padd kernels per lane at various tiles,
with tiny readbacks (full-output pulls through the tunnel would
dominate).  Env: MM_LOGN (default 20), GEMINI_TPU_PTILE list via
MM_TILES (comma-separated, default "256,512,1024").
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


def main():
    logn = int(os.environ.get("MM_LOGN", "20"))
    n = 1 << logn
    tiles = [int(t) for t in
             os.environ.get("MM_TILES", "256,512,1024").split(",")]

    from gemini_tpu.fields.fp import FQ
    from gemini_tpu.curve import pallas_g1

    rng = np.random.RandomState(5)
    a_np = rng.randint(0, 1 << 16, size=(FQ.n_limbs, n)).astype(np.uint32)
    a_np[-1] &= 0x1FF  # < p
    b_np = rng.randint(0, 1 << 16, size=(FQ.n_limbs, n)).astype(np.uint32)
    b_np[-1] &= 0x1FF
    a = jnp.asarray(a_np)
    b = jnp.asarray(b_np)

    for tile in tiles:
        out = pallas_g1._mm_call(tile, a, b)
        np.asarray(out[:, :1])  # warm
        t0 = time.time()
        out = pallas_g1._mm_call(tile, a, b)
        np.asarray(out[:, :1])
        dt = time.time() - t0
        print(f"mm  tile={tile}: {dt*1e3:7.1f} ms for 2^{logn} lanes "
              f"= {dt/n*1e9:6.1f} ns/mm")

    one = FQ.ones_mont((n,))
    for tile in tiles:
        ox, oy, oz = pallas_g1._padd_call(tile, a, b, one, a, b, one)
        np.asarray(ox[:, :1])  # warm
        t0 = time.time()
        ox, oy, oz = pallas_g1._padd_call(tile, a, b, one, a, b, one)
        np.asarray(ox[:, :1]), np.asarray(oy[:, :1]), np.asarray(oz[:, :1])
        dt = time.time() - t0
        print(f"padd tile={tile}: {dt*1e3:7.1f} ms for 2^{logn} lanes "
              f"= {dt/n*1e9:6.1f} ns/add (mm-equiv x14: "
              f"{dt/n*1e9/14:4.1f} ns)")


if __name__ == "__main__":
    main()
