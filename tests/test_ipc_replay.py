"""IPC conformance replay (SURVEY.md §4e): frozen wire-byte sessions.

tests/data/session_*.bin hold one recorded prove and one verify round trip
(request bytes + response bytes, scripts/record_session.py).  These tests
replay the request bytes through the codec/dispatch layers and re-encode
the responses, asserting byte equality with the recorded session — the wire
format (§8.1: opcode framing, TLV scalars/lists, proof serialization) is
frozen against accidental drift with no prover in the loop.
"""

import os

import pytest

from dusk_blindbidproof_tpu.server import (
    OP_PROVE,
    OP_VERIFY,
    decode_proof,
    encode_proof,
    parse_prove_request,
    parse_verify_request,
)
from dusk_blindbidproof_tpu.utils.tlv import TlvReader, TlvWriter

DATA = os.path.join(os.path.dirname(__file__), "data")


def _load(name):
    path = os.path.join(DATA, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} not recorded (run scripts/record_session.py)")
    r = TlvReader(open(path, "rb").read())
    request = r.expect_frame("request")
    response = r.expect_frame("response")
    assert r.read_frame() is None
    return request, response


def test_prove_session_replay():
    request, response = _load("session_prove.bin")
    assert request[0] == OP_PROVE
    req = parse_prove_request(request[1:])
    # re-encode the request from the parsed form: byte-identical
    w = TlvWriter()
    for v in (req.d, req.k, req.y, req.y_inv, req.q, req.z_img, req.seed):
        w.write_scalar(v)
    w.write_list([x.to_bytes(32, "little") for x in req.pub_list])
    w.write_u64(req.toggle)
    assert bytes([OP_PROVE]) + w.getvalue() == request

    # response: TLV frame holding the encoded proof; decode + re-encode
    # must reproduce the exact historical bytes
    r = TlvReader(response)
    proof_frame = r.expect_frame("proof")
    assert r.read_frame() is None
    proof = decode_proof(proof_frame)
    assert encode_proof(proof) == proof_frame
    w = TlvWriter()
    w.write(encode_proof(proof))
    assert w.getvalue() == response


def test_verify_session_replay():
    request, response = _load("session_verify.bin")
    assert request[0] == OP_VERIFY
    vreq = parse_verify_request(request[1:])
    w = TlvWriter()
    w.write(encode_proof(vreq.proof))
    for v in (vreq.score, vreq.z_img, vreq.seed):
        w.write_scalar(v)
    w.write_list([x.to_bytes(32, "little") for x in vreq.pub_list])
    assert bytes([OP_VERIFY]) + w.getvalue() == request

    # recorded response: TLV(0x01) — the proof verified when recorded
    r = TlvReader(response)
    assert r.expect_frame("status") == b"\x01"


def test_sessions_cross_consistent():
    """The proof inside the verify request is the prove response's proof."""
    _, prove_resp = _load("session_prove.bin")
    verify_req, _ = _load("session_verify.bin")
    proof_frame = TlvReader(prove_resp).expect_frame("proof")
    embedded = TlvReader(verify_req[1:]).expect_frame("proof")
    assert proof_frame == embedded
