#!/usr/bin/env python
"""External Fiat-Shamir replay harness (VERDICT r4 item 9).

Emits (1) the exact byte sequence this implementation feeds merlin —
every (label, message) append and every challenge request with its
expected value — and (2) a ready-to-run Rust `main.rs` that replays the
sequence against the real `merlin` + `ark-serialize` crates and panics
on any divergence.  Run the Rust program on any machine with a Rust
toolchain to close the cross-stack transcript question in minutes
(this image has neither Rust nor egress).

Usage:
  python tools/fs_replay.py            # print the JSON vector set
  python tools/fs_replay.py --rust     # print the Rust replay program

The sequence mirrors the pinned protocol vectors of
tests/test_transcript.py::test_pinned_gemini_protocol_vectors
(transcript.rs:8-34 semantics; 64-byte reduced challenges).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gemini_tpu.refimpl import g1_generator, g1_mul
from gemini_tpu.serialize import G1Msg, ScalarMsg, serialize_uncompressed
from gemini_tpu.transcript import GeminiTranscript


def build_trace():
    """Replay the pinned protocol transcript, recording every event."""
    events = []
    t = GeminiTranscript(b"GEMINI-v0", force_python=True)

    def append(label: bytes, obj):
        data = serialize_uncompressed(obj)
        events.append({"op": "append", "label": label.decode(),
                       "bytes": data.hex()})
        t.append_serializable(label, obj)

    def challenge(label: bytes) -> int:
        c = t.get_challenge(label)
        events.append({"op": "challenge", "label": label.decode(),
                       "expect": hex(c)})
        return c

    G = g1_generator()
    P = g1_mul(G, 123456789)
    append(b"witness", G1Msg(G))
    alpha = challenge(b"alpha")
    append(b"zc(alpha)", ScalarMsg(42))
    eta = challenge(b"eta")
    append(b"sumcheck-round", ScalarMsg(alpha * eta % (2 ** 255)))
    append(b"commitment", G1Msg(P))
    append(b"commitment", G1Msg(None))
    challenge(b"evaluation-chal")
    challenge(b"open-chal")
    return events


RUST_TEMPLATE = r"""// Replay gemini_tpu's Fiat-Shamir byte sequence against the real
// merlin + ark stacks, using the reference's own challenge derivation
// verbatim (/root/reference/src/transcript.rs:26-34: 64 challenge
// bytes -> Fr::from_random_bytes, rejection loop).  Cargo.toml deps:
//   merlin = "3"
//   ark-ff = "0.4"
//   ark-bls12-381 = "0.4"
//   hex = "0.4"
// The appended bytes are this repo's ark-serialize uncompressed
// encodings; to close the loop on encodings too, check the first
// append equals ark_bls12_381::G1Affine::generator()
// .serialize_uncompressed(...) bytes.
use ark_bls12_381::Fr;
use ark_ff::{BigInteger, Field, PrimeField};
use merlin::Transcript;

fn get_challenge(t: &mut Transcript, label: &'static [u8]) -> Fr {
    loop {
        let mut bytes = [0; 64];
        t.challenge_bytes(label, &mut bytes);
        if let Some(e) = Fr::from_random_bytes(&bytes) {
            return e;
        }
    }
}

fn main() {
    let mut t = Transcript::new(b"GEMINI-v0");
    let events: &[(&str, &str, &str)] = &[
%EVENTS%
    ];
    for (op, label, data) in events {
        match *op {
            "append" => {
                let bytes = hex::decode(data).unwrap();
                // merlin labels are &'static: match the fixed set.
                let label: &'static [u8] = match *label {
                    "witness" => b"witness",
                    "zc(alpha)" => b"zc(alpha)",
                    "sumcheck-round" => b"sumcheck-round",
                    "commitment" => b"commitment",
                    _ => panic!("unknown label"),
                };
                t.append_message(label, &bytes);
            }
            "challenge" => {
                let label: &'static [u8] = match *label {
                    "alpha" => b"alpha",
                    "eta" => b"eta",
                    "evaluation-chal" => b"evaluation-chal",
                    "open-chal" => b"open-chal",
                    _ => panic!("unknown label"),
                };
                let got = get_challenge(&mut t, label);
                let want_hex = data.trim_start_matches("0x");
                let got_hex = hex::encode(
                    got.into_bigint().to_bytes_be());
                assert_eq!(
                    got_hex.trim_start_matches('0'),
                    want_hex.trim_start_matches('0'),
                    "challenge {} diverged", label.escape_ascii());
            }
            _ => unreachable!(),
        }
    }
    println!("ALL CHALLENGES MATCH");
}
"""


def main():
    events = build_trace()
    if "--rust" in sys.argv:
        rows = []
        for e in events:
            data = e.get("bytes", e.get("expect", ""))
            rows.append(f'        ("{e["op"]}", "{e["label"]}", "{data}"),')
        print(RUST_TEMPLATE.replace("%EVENTS%", "\n".join(rows)))
    else:
        print(json.dumps(events, indent=2))


if __name__ == "__main__":
    main()
