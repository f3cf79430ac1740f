#!/usr/bin/env python
"""Multi-polynomial multi-point KZG demo (examples/pc.rs analogue).

    python examples/pc.py -d 12 -p 4 -m 3
"""

import argparse
import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-d", "--logdegree", type=int, default=10)
    ap.add_argument("-p", "--polynomials", type=int, default=4)
    ap.add_argument("-m", "--points", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from gemini_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache(os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/gemini_tpu_jax_cache"))

    import jax.numpy as jnp
    from gemini_tpu.params import R
    from gemini_tpu.fields.fp import FR
    from gemini_tpu.kzg.commit import CommitterKey, VerifierKey
    from gemini_tpu.ops import poly

    d = 1 << args.logdegree
    rng = random.Random(0)
    ck = CommitterKey.new(max_degree=d, max_eval_points=args.points,
                          seed=0)
    vk = VerifierKey.from_committer_key(ck)
    polys = [
        jnp.asarray(FR.encode([rng.randrange(R) for _ in range(d)]))
        for _ in range(args.polynomials)
    ]
    pts = [rng.randrange(R) for _ in range(args.points)]

    t0 = time.time()
    commitments = ck.batch_commit(polys)
    commit_t = time.time() - t0
    eta = rng.randrange(R)
    t0 = time.time()
    proof = ck.batch_open_multi_points(polys, pts, eta)
    open_t = time.time() - t0
    evals = [[poly.evaluate_le(FR, p, x) for x in pts] for p in polys]
    t0 = time.time()
    vk.verify_multi_points(commitments, pts, evals, proof, eta)
    verify_t = time.time() - t0
    print(f"commit ({args.polynomials} x 2^{args.logdegree}): "
          f"{commit_t:.2f} s")
    print(f"batch open at {args.points} points: {open_t:.2f} s")
    print(f"verify: {verify_t:.2f} s  (OK)")


if __name__ == "__main__":
    main()
