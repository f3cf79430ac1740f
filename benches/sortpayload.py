"""A/B: key-sort + per-index gather vs multi-operand lax.sort carrying
the 24 packed coordinate rows as payload, at MSM scale.  The gather
engine's ~34 ns/index cost is flat in payload width, so if the sort
network moves payload near bandwidth the payload-sort wins.
Env: PROF_LOGN (default 20).
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
    np.asarray(force(first))
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        first = out[0] if isinstance(out, (tuple, list)) else out
        np.asarray(force(first))
        best = min(best, time.time() - t0)
    print(f"{name:40s} {best*1e3:9.1f} ms")
    return best


def main():
    logn = int(os.environ.get("PROF_LOGN", "20"))
    n = 1 << logn
    rng = np.random.RandomState(7)
    key = jnp.asarray(rng.randint(0, 1 << 17, size=(n,)).astype(np.uint32))
    iota = jnp.arange(n, dtype=jnp.int32)
    pp = jnp.asarray(rng.randint(0, 1 << 32, size=(24, n), dtype=np.int64)
                     .astype(np.uint32))
    print(f"n=2^{logn}")

    def sort_gather(k, i, a):
        sk, order = jax.lax.sort((k, i), num_keys=1)
        return sk, a[:, order]

    bench("sort(key,iota) + gather 24 rows",
          jax.jit(sort_gather), key, iota, pp)

    def sort_payload(k, a):
        ops = (k,) + tuple(a[j] for j in range(24))
        out = jax.lax.sort(ops, num_keys=1)
        return out[0], jnp.stack(out[1:], axis=0)

    bench("sort(key + 24 payload rows)",
          jax.jit(sort_payload), key, pp)

    def sort_payload8(k, a):
        # pack 24 u32 rows into 12 u64? TPU has no u64 — try 8 rows of
        # 3-row interleave? Just measure fewer operands for scaling.
        ops = (k,) + tuple(a[j] for j in range(8))
        out = jax.lax.sort(ops, num_keys=1)
        return out[0], jnp.stack(out[1:], axis=0)

    bench("sort(key + 8 payload rows)",
          jax.jit(sort_payload8), key, pp)


if __name__ == "__main__":
    main()
