#!/usr/bin/env python
"""SNARK benchmark driver (examples/snark.rs analogue).

    python examples/snark.py -i 12 --time-prover
    python examples/snark.py -i 24            # elastic (space) prover

The time prover uses a real (test-trapdoor) SRS and the dense diagonal
dummy R1CS (circuit.rs:349).  The elastic prover mirrors the
reference's giant-instance setup (examples/snark.rs:55-67): an
O(1)-memory `DummyR1csStream` relation and the constant-base τ=1
`FakeCommitterKeyStream` SRS, so instance sizes far beyond any
materializable key can run.  Verification runs when the dense relation
fits (the SNARK verifier is linear in the circuit, like the
reference's); above --verify-max-log it is skipped.

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
    ap.add_argument("--verify-max-log", type=int, default=16,
                    help="skip verification above this logsize")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend")
    args = ap.parse_args()
    if not 1 <= args.instance_logsize <= 35:
        ap.error("--instance-logsize must be in [1, 35]")

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from gemini_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache(os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/gemini_tpu_jax_cache"))

    from gemini_tpu.kzg.commit import CommitterKey, VerifierKey
    from gemini_tpu.relation import dummy_r1cs
    from gemini_tpu.relation.stream import DummyR1csStream
    from gemini_tpu.serialize import snark_proof_bytes
    from gemini_tpu.snark import Proof
    from gemini_tpu.streaming import FakeCommitterKeyStream
    from gemini_tpu.utils import MemoryWatcher

    n = 1 << args.instance_logsize
    rng = random.Random(0)
    print(f"instance: dummy R1CS, 2^{args.instance_logsize} constraints "
          f"({'time' if args.time_prover else 'elastic'} prover)")

    do_verify = args.instance_logsize <= args.verify_max_log
    with MemoryWatcher() as mem:
        t0 = time.time()
        if args.time_prover:
            r1cs = dummy_r1cs(rng, n)
            ck = CommitterKey.new(max_degree=n, max_eval_points=3, seed=0)
            vk = VerifierKey.from_committer_key(ck)
            setup_t = time.time() - t0
            print(f"setup time:    {setup_t:.2f} s "
                  f"(instance + SRS + verifier key)")
            t0 = time.time()
            proof = Proof.new_time(r1cs, ck)
        else:
            from gemini_tpu.params import R
            e = rng.randrange(1, R)
            stream = DummyR1csStream(n, e)
            fake = FakeCommitterKeyStream(
                max_eval_points=3, seed=0,
                max_msm_buffer=1 << args.msm_buffer_log)
            proof = Proof.new_elastic(
                stream, fake, block_size=1 << args.msm_buffer_log)
            vk = fake.verifier_key()
            r1cs = stream.to_dense() if do_verify else None
        prove_t = time.time() - t0
    if do_verify:
        t0 = time.time()
        proof.verify(r1cs, vk)
        verify_t = time.time() - t0
        print(f"verifier time: {verify_t:.2f} s")
    else:
        print("verification skipped (instance above --verify-max-log; "
              "the SNARK verifier is linear in the circuit)")
    size = len(snark_proof_bytes(proof))
    print(f"prover time:   {prove_t:.2f} s")
    print(f"proof size:    {size} B (compressed)")
    print(f"peak rss:      {mem.peak / 2**20:.1f} MiB")


if __name__ == "__main__":
    main()
