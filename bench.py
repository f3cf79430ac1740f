"""Headline benchmark: G1 MSM throughput (BLS12-381) on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The BASELINE.json metric is "MSM points/s/chip at 2^20".  The Rust
toolchain is not present in this image, so the reference cannot be
re-measured here; `vs_baseline` is the ratio against 5.0e6 points/s —
a representative figure for arkworks `msm_bigint` (asm+parallel
features) at 2^20 on a 64-core CPU host, the reference's fastest
configuration (BASELINE.md).

Env knobs: BENCH_LOGN (default 20 — the BASELINE.json config),
BENCH_WINDOW (default auto), BENCH_REPEATS (default 2).
"""

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

from gemini_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache(
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/gemini_tpu_bench_cache"))

import jax.numpy as jnp
import numpy as np

BASELINE_POINTS_PER_S = 5.0e6


def main():
    logn = int(os.environ.get("BENCH_LOGN", "20"))
    repeats = int(os.environ.get("BENCH_REPEATS", "2"))
    n = 1 << logn

    from gemini_tpu.params import R
    from gemini_tpu.fields.fp import FR, FQ
    from gemini_tpu.curve import g1
    from gemini_tpu.ops.msm import msm
    from gemini_tpu.refimpl import g1_generator, g1_mul

    rnd = random.Random(0xBEEF)
    # Synthetic affine points: random multiples of G computed on device
    # (host refimpl would take minutes at 2^20).  Build k*G for a few
    # hundred distinct k on host, then tile — bucket distribution is
    # driven by the (uniform random) scalars, so duplicated points do
    # not flatter the kernel.
    base_count = 512
    host_pts = [g1_mul(g1_generator(), rnd.randrange(1, R))
                for _ in range(base_count)]
    ap = g1.encode_affine(host_pts)
    reps = -(-n // base_count)
    points = g1.APoint(
        jnp.tile(ap.x, (1, reps))[:, :n],
        jnp.tile(ap.y, (1, reps))[:, :n],
        jnp.tile(ap.inf, (reps,))[:n],
    )
    scalars_np = np.zeros((FR.n_limbs, n), dtype=np.uint32)
    rng = np.random.RandomState(7)
    for i in range(FR.n_limbs):
        scalars_np[i] = rng.randint(0, 1 << 16, size=n).astype(np.uint32)
    # mask top limb so scalars < 2^252 < R (protocol scalars are reduced
    # Fr elements; the signed-digit recode relies on < R)
    scalars_np[FR.n_limbs - 1] &= 0x0FFF
    scalars = jnp.asarray(scalars_np)

    c = os.environ.get("BENCH_WINDOW")
    c = int(c) if c else None

    # Warmup (compiles cached persistently across rounds).  NB: timing
    # forces a full host readback — block_until_ready does not reliably
    # wait for execution through the remote-TPU tunnel.
    t0 = time.time()
    out = msm(points, scalars, c=c)
    np.asarray(out.x)
    warm = time.time() - t0

    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        out = msm(points, scalars, c=c)
        np.asarray(out.x), np.asarray(out.y), np.asarray(out.z)
        best = min(best, time.time() - t0)

    pts_per_s = n / best
    print(json.dumps({
        "metric": f"msm_g1_points_per_s_2^{logn}",
        "value": round(pts_per_s, 1),
        "unit": "points/s/chip",
        "vs_baseline": round(pts_per_s / BASELINE_POINTS_PER_S, 4),
        "baseline_source": (
            "REPRESENTATIVE, NOT MEASURED: 5.0e6 pts/s for arkworks "
            "msm_bigint (asm+parallel, 64-core CPU) at 2^20; the image "
            "has no Rust toolchain and no egress to re-measure "
            "(BASELINE.md)"),
        "detail": {
            "n": n,
            "best_s": round(best, 4),
            "warmup_s": round(warm, 2),
            "platform": jax.devices()[0].platform,
        },
    }))


if __name__ == "__main__":
    main()
