"""Is the sumcheck round also stride-2-bound?  Compare the production
round-message/fold kernels (even/odd strided splits) against
halves-split variants of identical arithmetic cost at 2^19..2^21
lanes.  Env: PROF_K (default 8)."""

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

from gemini_tpu.fields import fp
from gemini_tpu.fields.fp import FR
from gemini_tpu.ops import poly
from gemini_tpu.params import R
from gemini_tpu.subprotocols.sumcheck import (
    SC_TILE, _round_message_kernel, _round_partials, _fold_kernel,
)


def timed(label, fn, k, units):
    touch = lambda o: np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[:1])
    out = fn()
    touch(out)
    t0 = time.time()
    outs = [fn() for _ in range(k)]
    for o in outs:
        touch(o)
    dt = (time.time() - t0) / k
    print(f"{label:34s} {dt*1e3:8.1f} ms  ({dt/units*1e9:6.1f} ns/unit)",
          flush=True)


@jax.jit
def round_message_halves(f, g, t_pow, twist):
    h = f.shape[1] // 2
    f_e, f_o = f[:, :h], f[:, h:]
    g_e, g_o = g[:, :h], g[:, h:]
    m = h
    if m <= SC_TILE:
        return _round_partials(f_e, f_o, g_e, g_o, t_pow, twist)
    L = f.shape[0]
    t = -(-m // SC_TILE)
    npad = t * SC_TILE

    def tiled(x):
        if npad != m:
            x = jnp.concatenate(
                [x, jnp.zeros((L, npad - m), jnp.uint32)], axis=1)
        return x.reshape(L, t, SC_TILE).transpose(1, 0, 2)

    xs = tuple(tiled(v) for v in (f_e, f_o, g_e, g_o, t_pow))

    def body(args):
        return _round_partials(*args, twist)

    parts_a, parts_b = jax.lax.map(body, xs)
    return (jnp.sum(parts_a, axis=0, dtype=jnp.uint32),
            jnp.sum(parts_b, axis=0, dtype=jnp.uint32))


@jax.jit
def fold_transpose(f, g, t_pow, r, r_twist):
    """Same eo semantics; the strided view is materialized by an
    explicit (L, h, 2) -> (L, 2, h) transpose instead of stride-2
    slices (zero layout bookkeeping if it matches halves speed)."""
    L, n = f.shape
    h = n // 2

    def eo(x):
        t = x.reshape(L, h, 2).transpose(0, 2, 1)
        return t[:, 0], t[:, 1]

    f_e, f_o = eo(f)
    g_e, g_o = eo(g)
    f2 = fp.add(FR, f_e, fp.mont_mul(FR, f_o, r_twist))
    g2 = fp.add(FR, g_e, fp.mont_mul(FR, g_o, r))
    t2 = t_pow[:, : h // 2]
    return f2, g2, t2


@jax.jit
def round_message_transpose(f, g, t_pow, twist):
    L, n = f.shape
    h = n // 2

    def eo(x):
        t = x.reshape(L, h, 2).transpose(0, 2, 1)
        return t[:, 0], t[:, 1]

    f_e, f_o = eo(f)
    g_e, g_o = eo(g)
    m = h
    if m <= SC_TILE:
        return _round_partials(f_e, f_o, g_e, g_o, t_pow, twist)
    t = -(-m // SC_TILE)
    npad = t * SC_TILE

    def tiled(x):
        if npad != m:
            x = jnp.concatenate(
                [x, jnp.zeros((L, npad - m), jnp.uint32)], axis=1)
        return x.reshape(L, t, SC_TILE).transpose(1, 0, 2)

    xs = tuple(tiled(v) for v in (f_e, f_o, g_e, g_o, t_pow))

    def body(args):
        return _round_partials(*args, twist)

    parts_a, parts_b = jax.lax.map(body, xs)
    return (jnp.sum(parts_a, axis=0, dtype=jnp.uint32),
            jnp.sum(parts_b, axis=0, dtype=jnp.uint32))


@jax.jit
def fold_halves(f, g, t_pow, r, r_twist):
    h = f.shape[1] // 2
    f2 = fp.add(FR, f[:, :h], fp.mont_mul(FR, f[:, h:], r_twist))
    g2 = fp.add(FR, g[:, :h], fp.mont_mul(FR, g[:, h:], r))
    t2 = t_pow[:, : h // 2]
    return f2, g2, t2


def main():
    k = int(os.environ.get("PROF_K", "8"))
    for logn in (19, 20, 21):
        n = 1 << logn
        rng = np.random.RandomState(5)
        mk = lambda: jnp.asarray(
            rng.randint(0, 1 << 16, size=(FR.n_limbs, n)).astype(np.uint32))
        f, g = mk(), mk()
        t_pow = poly.powers(FR, 777, n // 2)
        tw = poly.scalar(FR, 999)
        r = poly.scalar(FR, 333)
        rt = poly.scalar(FR, 444)
        print(f"--- n=2^{logn} ---", flush=True)
        timed(f"round msg eo 2^{logn}",
              lambda: _round_message_kernel(f, g, t_pow, tw), k, n)
        timed(f"round msg halves 2^{logn}",
              lambda: round_message_halves(f, g, t_pow, tw), k, n)
        fk = jax.jit(lambda a, b, c, d, e: _fold_kernel(a, b, c, d, e, n // 2))
        timed(f"fold eo 2^{logn}",
              lambda: fk(f, g, t_pow, r, rt), k, n)
        timed(f"fold halves 2^{logn}",
              lambda: fold_halves(f, g, t_pow, r, rt), k, n)
        timed(f"fold transpose 2^{logn}",
              lambda: fold_transpose(f, g, t_pow, r, rt), k, n)
        timed(f"round msg transpose 2^{logn}",
              lambda: round_message_transpose(f, g, t_pow, tw), k, n)


if __name__ == "__main__":
    main()
