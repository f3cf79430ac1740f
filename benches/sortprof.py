"""Probe the MSM pipeline's non-add phases at full size on TPU:
argsort, coordinate gather, digit extraction, boundary search —
each timed standalone with a tiny jitted readback so the axon tunnel
does not pollute the numbers.  Env: PROF_LOGN (default 20), PROF_WC.
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


def bench(name, fn, *args, reps=3):
    force = jax.jit(lambda t: t.reshape(-1)[:1])
    out = fn(*args)
    first = out[0] if isinstance(out, (tuple, list)) else out
    np.asarray(force(first))  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        first = out[0] if isinstance(out, (tuple, list)) else out
        np.asarray(force(first))
        best = min(best, time.time() - t0)
    print(f"{name:28s} {best*1e3:9.1f} ms")
    return best


def main():
    logn = int(os.environ.get("PROF_LOGN", "20"))
    wc = int(os.environ.get("PROF_WC", "1"))
    n = 1 << logn
    from gemini_tpu.fields.fp import FR, FQ
    from gemini_tpu.ops import msm as msm_mod

    rng = np.random.RandomState(3)
    px = jnp.asarray(
        rng.randint(0, 1 << 16, size=(FQ.n_limbs, n)).astype(np.uint32))
    py = jnp.asarray(
        rng.randint(0, 1 << 16, size=(FQ.n_limbs, n)).astype(np.uint32))
    pinf = jnp.zeros((n,), bool)
    c = 16
    mags = jnp.asarray(
        rng.randint(0, 1 << (c - 1), size=(wc, n)).astype(np.uint32))
    negs = jnp.asarray(rng.randint(0, 2, size=(wc, n)).astype(bool))

    print(f"n=2^{logn} wc={wc} c={c}")

    bench("argsort", jax.jit(lambda m: jnp.argsort(m, axis=1)), mags)
    order = jnp.argsort(mags, axis=1)

    bench("gather 1 coord (24,wc,n)",
          jax.jit(lambda a, o: a[:, o]), px, order)
    bench("gather 2 coords + selects",
          jax.jit(msm_mod._sort_gather_proj), px, py, pinf, mags, negs)
    sd = jnp.sort(mags, axis=1)
    bench("boundary searchsorted",
          jax.jit(lambda s: msm_mod._boundary_positions(s, c)), sd)

    scal = np.zeros((FR.n_limbs, n), dtype=np.uint32)
    for i in range(FR.n_limbs):
        scal[i] = rng.randint(0, 1 << 16, size=n).astype(np.uint32)
    scal[FR.n_limbs - 1] &= 0x0FFF
    scal = jnp.asarray(scal)
    bench("extract_signed_digits",
          lambda s: msm_mod.extract_signed_digits(s, c), scal)


if __name__ == "__main__":
    main()
