#!/usr/bin/env python
"""Preprocessing SNARK benchmark driver (examples/psnark.rs analogue).

    python examples/psnark.py -i 10               # time prover
    python examples/psnark.py -i 10 --elastic     # space prover
"""

import argparse
import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-i", "--instance-logsize", type=int, default=8)
    ap.add_argument("--elastic", action="store_true",
                    help="space-efficient prover (bounded device memory)")
    ap.add_argument("--giant", action="store_true",
                    help="elastic prover over a streaming relation with "
                    "the tau=1 synthetic SRS (examples/psnark.rs:54-68 "
                    "giant-instance path; no dense relation or real key "
                    "is ever materialized)")
    ap.add_argument("--msm-buffer-log", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if not 1 <= args.instance_logsize <= 30:
        ap.error("--instance-logsize must be in [1, 30]")

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from gemini_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache(os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/gemini_tpu_jax_cache"))

    from gemini_tpu.kzg.commit import CommitterKey, VerifierKey
    from gemini_tpu.relation import dummy_r1cs
    from gemini_tpu.relation.r1cs import joint_matrices
    from gemini_tpu.psnark import Proof, index
    from gemini_tpu.serialize import psnark_proof_bytes
    from gemini_tpu.utils import MemoryWatcher

    n = 1 << args.instance_logsize
    rng = random.Random(0)

    if args.giant:
        from gemini_tpu.psnark import index_stream
        from gemini_tpu.relation.stream import DummyR1csStream
        from gemini_tpu.params import R
        from gemini_tpu.streaming import FakeCommitterKeyStream

        stream = DummyR1csStream(n, rng.randrange(1, R))
        cks = FakeCommitterKeyStream(
            max_eval_points=3, seed=0,
            max_msm_buffer=1 << args.msm_buffer_log)
        t0 = time.time()
        idx = index_stream(cks, stream)
        index_t = time.time() - t0
        with MemoryWatcher() as mem:
            t0 = time.time()
            proof = Proof.new_elastic(
                cks, stream, idx, block_size=1 << args.msm_buffer_log)
            prove_t = time.time() - t0
        size = len(psnark_proof_bytes(proof))
        print(f"indexer time:  {index_t:.2f} s")
        print(f"prover time:   {prove_t:.2f} s")
        print(f"proof size:    {size} B (compressed)")
        print(f"peak rss:      {mem.peak / 2**20:.1f} MiB")
        return

    r1cs = dummy_r1cs(rng, n)
    jm = joint_matrices(r1cs)
    ck = CommitterKey.new(
        max_degree=2 * n + jm.num_non_zero + 2, max_eval_points=3, seed=0)
    vk = VerifierKey.from_committer_key(ck)

    t0 = time.time()
    idx = index(ck, r1cs)
    index_t = time.time() - t0
    with MemoryWatcher() as mem:
        t0 = time.time()
        if args.elastic:
            from gemini_tpu.streaming import CommitterKeyStream

            cks = CommitterKeyStream(ck, 1 << args.msm_buffer_log)
            proof = Proof.new_elastic(
                cks, r1cs, idx, block_size=1 << args.msm_buffer_log)
        else:
            proof = Proof.new_time(ck, r1cs, idx)
        prove_t = time.time() - t0
    t0 = time.time()
    proof.verify(r1cs, vk, idx, jm.num_non_zero)
    verify_t = time.time() - t0
    size = len(psnark_proof_bytes(proof))
    print(f"indexer time:  {index_t:.2f} s")
    print(f"prover time:   {prove_t:.2f} s")
    print(f"verifier time: {verify_t:.2f} s")
    print(f"proof size:    {size} B (compressed)")
    print(f"peak rss:      {mem.peak / 2**20:.1f} MiB")


if __name__ == "__main__":
    main()
