#!/usr/bin/env python
"""Core-operation micro-benchmarks (benches/coreops_bench.rs analogue):
Fr add/mul and G1 batched add latency/throughput on the active backend.

    python benches/coreops.py [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--lanes", type=int, default=1 << 18)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from gemini_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache(os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/gemini_tpu_jax_cache"))

    import numpy as np
    import jax.numpy as jnp
    from gemini_tpu.fields import fp
    from gemini_tpu.fields.fp import FR, FQ
    from gemini_tpu.curve import g1

    n = args.lanes
    rng = np.random.RandomState(0)

    def rand_fr():
        a = rng.randint(0, 1 << 16, (FR.n_limbs, n)).astype(np.uint32)
        a[-1] &= 0x7FFF
        return jnp.asarray(a)

    a, b = rand_fr(), rand_fr()

    def timed(f, reps=10):
        out = f()
        np.asarray(jax.tree.leaves(out)[0][:1, :1])  # compile + sync
        t0 = time.time()
        o = None
        for _ in range(reps):
            o = f()
        np.asarray(jax.tree.leaves(o)[0][:1, :1])
        return (time.time() - t0) / reps

    t = timed(lambda: fp.add(FR, a, b))
    print(f"fr add  ({n} lanes): {t*1e6:9.1f} us  "
          f"({n/t/1e9:.2f} G ops/s)")
    t = timed(lambda: fp.mont_mul(FR, a, b))
    print(f"fr mul  ({n} lanes): {t*1e6:9.1f} us  "
          f"({n/t/1e6:.1f} M ops/s)")

    m = n // 16
    px = jnp.asarray(rng.randint(0, 1 << 16, (FQ.n_limbs, m)).astype(np.uint32))
    p = g1.JPoint(px, px, px)  # synthetic coords: timing only
    t = timed(lambda: g1.add(p, p), reps=3)
    print(f"g1 add  ({m} lanes): {t*1e3:9.2f} ms  "
          f"({t/m*1e9:.0f} ns/add)")


if __name__ == "__main__":
    main()
