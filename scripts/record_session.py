"""Record frozen IPC request/response byte sessions (SURVEY.md §4e).

Generates one deterministic prove round trip and one verify round trip at
the wire-byte level and freezes them into tests/data/session_prove.bin /
session_verify.bin.  The replay suite (tests/test_ipc_replay.py,
tests/test_integration.py) asserts the codec reproduces these bytes
exactly, freezing the wire format against accidental drift.

File container: TLV frames [request_bytes, response_bytes].

Run once (on any backend; deterministic given the pinned rng/seed):
    python scripts/record_session.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax

    if jax.default_backend() != "cpu":
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from dusk_blindbidproof_tpu.models.blindbid import (
        VerifyRequest,
        make_prove_request,
        prove_batch,
        verify_batch,
    )
    from dusk_blindbidproof_tpu.server import (
        OP_PROVE,
        OP_VERIFY,
        encode_proof,
        parse_prove_request,
        parse_verify_request,
    )
    from dusk_blindbidproof_tpu.utils.tlv import TlvReader, TlvWriter

    req = make_prove_request(
        d=123456789, k=987654321, seed=42424242,
        pub_list_extra=[1111, 2222, 3333], toggle_pos=1,
    )

    # ---- prove request bytes (opcode 1 body, proof.rs:97-115) ----------
    body = TlvWriter()
    for v in (req.d, req.k, req.y, req.y_inv, req.q, req.z_img, req.seed):
        body.write_scalar(v)
    body.write_list([x.to_bytes(32, "little") for x in req.pub_list])
    body.write_u64(req.toggle)
    prove_request = bytes([OP_PROVE]) + body.getvalue()

    parsed = parse_prove_request(prove_request[1:])
    assert parsed == req, "request codec does not round-trip"

    proofs = prove_batch([req], rng=np.random.default_rng(2026))
    proof_frame = encode_proof(proofs[0])
    w = TlvWriter()
    w.write(proof_frame)
    prove_response = w.getvalue()

    # ---- verify request bytes (opcode 2 body, verify.rs:91-128) --------
    body = TlvWriter()
    body.write(proof_frame)
    for v in (req.q, req.z_img, req.seed):
        body.write_scalar(v)
    body.write_list([x.to_bytes(32, "little") for x in req.pub_list])
    verify_request = bytes([OP_VERIFY]) + body.getvalue()

    vreq = parse_verify_request(verify_request[1:])
    assert vreq == VerifyRequest(
        proof=proofs[0], score=req.q, z_img=req.z_img, seed=req.seed,
        pub_list=req.pub_list,
    )
    oks = verify_batch([vreq])
    assert oks == [True], "recorded proof failed verification"
    w = TlvWriter()
    w.write(b"\x01")
    verify_response = w.getvalue()

    data_dir = os.path.join(os.path.dirname(__file__), "..", "tests", "data")
    os.makedirs(data_dir, exist_ok=True)
    for name, request, response in [
        ("session_prove.bin", prove_request, prove_response),
        ("session_verify.bin", verify_request, verify_response),
    ]:
        w = TlvWriter()
        w.write(request)
        w.write(response)
        path = os.path.join(data_dir, name)
        with open(path, "wb") as fh:
            fh.write(w.getvalue())
        print(f"wrote {path} ({os.path.getsize(path)} bytes)")


if __name__ == "__main__":
    main()
