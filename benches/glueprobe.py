"""A/B probes for the MSM glue phases on TPU.

1. gather of (24, n) vs packed (12, n) coordinate planes,
2. boundary positions: vmapped searchsorted vs scatter/segment-max,
3. flipped-order gather (order[::-1]) vs gather-then-flip.
Env: PROF_LOGN (default 20), PROF_WC (default 1).
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
    print(f"{name:36s} {best*1e3:9.1f} ms")
    return best


def main():
    logn = int(os.environ.get("PROF_LOGN", "20"))
    wc = int(os.environ.get("PROF_WC", "1"))
    n = 1 << logn
    c = 16
    m = 1 << (c - 1)
    rng = np.random.RandomState(3)
    px24 = jnp.asarray(
        rng.randint(0, 1 << 16, size=(24, n)).astype(np.uint32))
    px12 = px24[:12] | (px24[12:] << jnp.uint32(16))
    mags = jnp.asarray(rng.randint(0, m, size=(wc, n)).astype(np.uint32))
    order = jnp.argsort(mags, axis=1)
    sd = jnp.sort(mags, axis=1)

    print(f"n=2^{logn} wc={wc} c={c}")
    bench("gather (24,n)", jax.jit(lambda a, o: a[:, o]), px24, order)
    bench("gather packed (12,n)", jax.jit(lambda a, o: a[:, o]), px12, order)
    bench("gather packed flipped order",
          jax.jit(lambda a, o: a[:, o[:, ::-1]]), px12, order)
    bench("gather then flip",
          jax.jit(lambda a, o: a[:, o][..., ::-1]), px12, order)

    ks = jnp.arange(1, m + 1, dtype=jnp.uint32)

    def via_search(s):
        return jax.vmap(
            lambda row: jnp.searchsorted(row, ks, side="left"))(s)

    def via_segmax(s):
        # b[k] = #elements < k for sorted s: scatter-max of (i+1) into
        # value slots, then a running max (cummax) fill; index [k-1].
        iota = jnp.arange(1, n + 1, dtype=jnp.uint32)

        def one(row):
            t = jnp.zeros((m,), jnp.uint32).at[row].max(
                iota, indices_are_sorted=True, mode="drop")
            le = jax.lax.cummax(t)  # le[v] = #elements <= v
            return jnp.concatenate([jnp.zeros((1,), jnp.uint32), le[:-1]])

        return jax.vmap(one)(s)

    a = via_search(sd)
    b = via_segmax(sd)
    print("boundary equal:", bool(jnp.all(a == b)))
    bench("boundaries searchsorted", jax.jit(via_search), sd)
    bench("boundaries scatter-max", jax.jit(via_segmax), sd)


if __name__ == "__main__":
    if os.environ.get("PROBE2"):
        pass  # probe2 runs at import tail
    else:
        main()


def probe2():
    logn = int(os.environ.get("PROF_LOGN", "20"))
    n = 1 << logn
    rng = np.random.RandomState(5)
    a24 = jnp.asarray(rng.randint(0, 1 << 16, size=(24, n)).astype(np.uint32))
    a48 = jnp.concatenate([a24, a24], axis=0)
    order = jnp.asarray(rng.permutation(n).astype(np.int32))
    print(f"probe2 n=2^{logn}")
    bench("lane gather (24,n)[:, idx]", jax.jit(lambda a, o: a[:, o]), a24, order)
    bench("lane gather (48,n)[:, idx]", jax.jit(lambda a, o: a[:, o]), a48, order)
    # row-major (embedding) layouts
    r24 = jnp.asarray(np.ascontiguousarray(np.asarray(a24).T))   # (n, 24) u32
    r128 = jnp.concatenate([r24] * 6 or [], axis=1)              # (n, 144)->(n,128)
    r128 = r128[:, :128]
    b96 = jnp.asarray(rng.randint(0, 256, size=(n, 96)).astype(np.uint8))
    bench("row gather (n,24)u32[idx]", jax.jit(lambda a, o: a[o]), r24, order)
    bench("row gather (n,128)u32[idx]", jax.jit(lambda a, o: a[o]), r128, order)
    bench("row gather (n,96)u8[idx]", jax.jit(lambda a, o: a[o]), b96, order)
    bench("row take axis0 (n,24)", jax.jit(lambda a, o: jnp.take(a, o, axis=0)), r24, order)
    # sort with payload operands
    mags = jnp.asarray(rng.randint(0, 1 << 15, size=(n,)).astype(np.uint32))
    iota = jnp.arange(n, dtype=jnp.int32)
    extra1 = jnp.asarray(rng.randint(0, 2, size=(n,)).astype(np.uint32))
    bench("sort 2 ops (key, iota)",
          jax.jit(lambda k, i: jax.lax.sort((k, i), num_keys=1)), mags, iota)
    bench("sort 4 ops (key,iota,e,e)",
          jax.jit(lambda k, i, e: jax.lax.sort((k, i, e, e), num_keys=1)),
          mags, iota, extra1)


probe2()
