#!/usr/bin/env python
"""SNARK benchmark driver (examples/snark.rs analogue).

    python examples/snark.py -i 12 --time-prover
    python examples/snark.py -i 16            # elastic (space) prover

Uses the deterministic diagonal dummy R1CS (circuit.rs:349) so
instance generation is O(n); prints timings, peak memory, proof size.
GEMINI_TPU_TRACE=1 enables span tracing.
"""

import argparse
import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-i", "--instance-logsize", type=int, default=10)
    ap.add_argument("--time-prover", action="store_true")
    ap.add_argument("--msm-buffer-log", type=int, default=20)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend")
    args = ap.parse_args()
    if not 1 <= args.instance_logsize <= 35:
        ap.error("--instance-logsize must be in [1, 35]")

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       "/tmp/gemini_tpu_jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

    from gemini_tpu.kzg.commit import CommitterKey, VerifierKey
    from gemini_tpu.relation import dummy_r1cs
    from gemini_tpu.serialize import snark_proof_bytes
    from gemini_tpu.snark import Proof
    from gemini_tpu.streaming import CommitterKeyStream
    from gemini_tpu.utils import MemoryWatcher

    n = 1 << args.instance_logsize
    rng = random.Random(0)
    print(f"instance: dummy R1CS, 2^{args.instance_logsize} constraints "
          f"({'time' if args.time_prover else 'elastic'} prover)")
    r1cs = dummy_r1cs(rng, n)
    ck = CommitterKey.new(max_degree=n, max_eval_points=3, seed=0)
    vk = VerifierKey.from_committer_key(ck)

    with MemoryWatcher() as mem:
        t0 = time.time()
        if args.time_prover:
            proof = Proof.new_time(r1cs, ck)
        else:
            cks = CommitterKeyStream(ck, 1 << args.msm_buffer_log)
            proof = Proof.new_elastic(r1cs, cks)
        prove_t = time.time() - t0
    t0 = time.time()
    proof.verify(r1cs, vk)
    verify_t = time.time() - t0
    size = len(snark_proof_bytes(proof))
    print(f"prover time:   {prove_t:.2f} s")
    print(f"verifier time: {verify_t:.2f} s")
    print(f"proof size:    {size} B (compressed)")
    print(f"peak rss:      {mem.peak / 2**20:.1f} MiB")


if __name__ == "__main__":
    main()
