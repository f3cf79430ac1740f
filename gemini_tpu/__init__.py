"""gemini_tpu — a TPU-native elastic proof system with the capabilities
of arkworks-rs/gemini (Gemini: elastic SNARKs for R1CS, ia.cr/2022/420).

Layers (bottom-up, mirroring SURVEY.md §1 but redesigned TPU-first):

  refimpl/        pure-Python ground truth (fields, curves, pairing)
  fields/         batched limb-vector Fr/Fq arithmetic (JAX, Montgomery)
  curve/          batched G1/G2 Jacobian ops on limb vectors
  ops/            MSM (Pippenger via sort+segmented scan), poly helpers
  kzg/            KZG polynomial commitment (time + streaming)
  subprotocols/   sumcheck, tensorcheck, entry product, plookup
  snark/          non-preprocessing SNARK (prover linear, verifier linear)
  psnark/         preprocessing SNARK (verifier logarithmic)
  relation/       R1CS frontend
  parallel/       device-mesh sharding and collectives
  transcript.py   merlin-compatible Fiat-Shamir (host)
"""

__version__ = "0.1.0"

from . import params  # noqa: F401

SPACE_TIME_THRESHOLD = 22  # lib.rs:76 analogue: host->HBM promotion bound
