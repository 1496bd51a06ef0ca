"""IPC layer tests: TLV codec, proof wire format, request parsing, dispatch.

Mirrors the reference's wire protocol (SURVEY.md §8.1): opcode 1 = prove,
opcode 2 = verify, error containment answers an error frame and keeps the
server alive (futures/main.rs:15-25,103-105).  Dispatch tests stub the
batching service so no device work runs; the full live-socket round trip is
tests/test_integration.py.
"""

import asyncio
import io

import pytest

from dusk_blindbidproof_tpu import server as srv
from dusk_blindbidproof_tpu.models.proof_struct import (
    BlindBidProof,
    R1CSProof,
)
from dusk_blindbidproof_tpu.models.transcript_protocol import (
    IDENTITY_COMPRESSED,
    ProofError,
)
from dusk_blindbidproof_tpu.utils.curve_host import L
from dusk_blindbidproof_tpu.utils.tlv import (
    TlvReader,
    TlvWriter,
    read_varint,
    write_varint,
)


# ---------------------------------------------------------------------------
# TLV codec
# ---------------------------------------------------------------------------


def test_varint_round_trip():
    for n in [0, 1, 127, 128, 300, 2**14, 2**21 - 1, 2**32, 2**63 - 1]:
        assert read_varint(io.BytesIO(write_varint(n))) == n


def test_varint_rejects_overlong():
    with pytest.raises(ValueError):
        read_varint(io.BytesIO(b"\x80" * 10 + b"\x01"))


def test_varint_truncation():
    assert read_varint(io.BytesIO(b"")) is None  # clean EOF between frames
    with pytest.raises(EOFError):
        read_varint(io.BytesIO(b"\x80"))  # EOF mid-varint


def test_frame_round_trip():
    w = TlvWriter()
    w.write(b"hello")
    w.write(b"")
    w.write(b"x" * 300)
    r = TlvReader(w.getvalue())
    assert r.read_frame() == b"hello"
    assert r.read_frame() == b""
    assert r.read_frame() == b"x" * 300
    assert r.read_frame() is None


def test_list_round_trip():
    items = [b"a", b"bb", b"", b"c" * 200]
    w = TlvWriter()
    w.write_list(items)
    assert TlvReader(w.getvalue()).read_list() == items


def test_truncated_frame_raises():
    w = TlvWriter()
    w.write(b"hello")
    data = w.getvalue()[:-1]
    with pytest.raises(EOFError):
        TlvReader(data).read_frame()


def test_scalar_frame_length_check():
    w = TlvWriter()
    w.write(b"\x01" * 31)
    with pytest.raises(ValueError):
        TlvReader(w.getvalue()).read_scalar_bytes()


# ---------------------------------------------------------------------------
# Proof wire format
# ---------------------------------------------------------------------------


def _dummy_r1cs(rounds=11, phase2=False):
    p = lambda i: bytes([i]) + bytes(31)  # noqa: E731
    return R1CSProof(
        A_I1=p(1), A_O1=p(2), S1=p(3),
        A_I2=p(4) if phase2 else IDENTITY_COMPRESSED,
        A_O2=p(5) if phase2 else IDENTITY_COMPRESSED,
        S2=p(6) if phase2 else IDENTITY_COMPRESSED,
        T_1=p(7), T_3=p(8), T_4=p(9), T_5=p(10), T_6=p(11),
        t_x=123, t_x_blinding=456, e_blinding=789,
        ipp_L=[p(20 + i) for i in range(rounds)],
        ipp_R=[p(40 + i) for i in range(rounds)],
        ipp_a=111, ipp_b=222,
    )


def test_r1cs_proof_round_trip_one_phase():
    proof = _dummy_r1cs()
    data = proof.to_bytes()
    assert data[0] == 0
    back = R1CSProof.from_bytes(data)
    assert back == proof


def test_r1cs_proof_round_trip_two_phase():
    proof = _dummy_r1cs(phase2=True)
    data = proof.to_bytes()
    assert data[0] == 1
    assert R1CSProof.from_bytes(data) == proof


def test_r1cs_proof_rejects_garbage():
    with pytest.raises(ProofError):
        R1CSProof.from_bytes(b"")
    with pytest.raises(ProofError):
        R1CSProof.from_bytes(bytes([9]) + bytes(32 * 20))  # bad version
    with pytest.raises(ProofError):
        R1CSProof.from_bytes(bytes([0]) + bytes(33))  # not 32-aligned
    # non-canonical scalar (= L) must be rejected
    data = bytearray(_dummy_r1cs().to_bytes())
    data[1 + 32 * 8 : 1 + 32 * 9] = L.to_bytes(32, "little")
    with pytest.raises(ProofError):
        R1CSProof.from_bytes(bytes(data))


def test_blindbid_proof_envelope_round_trip():
    proof = BlindBidProof(
        r1cs=_dummy_r1cs(),
        commitments=[bytes([i]) * 32 for i in range(4)],
        t_c=[bytes([10 + i]) * 32 for i in range(5)],
    )
    back = srv.decode_proof(srv.encode_proof(proof))
    assert back == proof


# ---------------------------------------------------------------------------
# Request parsing (opcode bodies)
# ---------------------------------------------------------------------------


def _prove_body(d=5, k=6, y=7, y_inv=8, q=9, z_img=10, seed=11,
                pub_list=(1, 2, 3), toggle=1, entry_len=32):
    w = TlvWriter()
    for v in (d, k, y, y_inv, q, z_img, seed):
        w.write(v.to_bytes(32, "little"))
    w.write_list([v.to_bytes(entry_len, "little") for v in pub_list])
    w.write(toggle.to_bytes(8, "little"))
    return w.getvalue()


def test_parse_prove_request():
    req = srv.parse_prove_request(_prove_body())
    assert (req.d, req.k, req.y, req.y_inv) == (5, 6, 7, 8)
    assert (req.q, req.z_img, req.seed) == (9, 10, 11)
    assert req.pub_list == [1, 2, 3]
    assert req.toggle == 1


def test_parse_prove_rejects_non_canonical_scalar():
    with pytest.raises(ValueError):
        srv.parse_prove_request(_prove_body(d=L))


def test_parse_prove_rejects_bad_entry_length():
    # replicates bid.rs:24 strictness: non-32-byte entries are fatal
    with pytest.raises(ValueError):
        srv.parse_prove_request(_prove_body(entry_len=31))


def test_parse_prove_pub_list_from_bits():
    """255-bit non-canonical entries pass through unreduced
    (Scalar::from_bits semantics, SURVEY.md §8.5 quirk 3)."""
    big = (1 << 255) - 1
    req = srv.parse_prove_request(_prove_body(pub_list=(big,)))
    assert req.pub_list == [big & ((1 << 255) - 1)]


def test_parse_verify_request():
    proof = BlindBidProof(
        r1cs=_dummy_r1cs(), commitments=[bytes(32)] * 4, t_c=[bytes(32)] * 3
    )
    w = TlvWriter()
    w.write(srv.encode_proof(proof))
    for v in (100, 200, 300):
        w.write(v.to_bytes(32, "little"))
    w.write_list([v.to_bytes(32, "little") for v in (1, 2, 3)])
    req = srv.parse_verify_request(w.getvalue())
    assert (req.score, req.z_img, req.seed) == (100, 200, 300)
    assert req.pub_list == [1, 2, 3]
    assert req.proof == proof


# ---------------------------------------------------------------------------
# Dispatch (stubbed service — no device work)
# ---------------------------------------------------------------------------


class _StubService:
    def __init__(self, result):
        self.result = result
        self.calls = []

    async def submit(self, kind, shape_key, item):
        self.calls.append((kind, shape_key, item))
        if isinstance(self.result, Exception):
            raise self.result
        return self.result


def _dispatch(service, request: bytes) -> bytes:
    s = srv.BlindBidServer("/tmp/unused.sock", service=service)
    return asyncio.run(s._dispatch(request))


def test_dispatch_unknown_opcode_answers_error_frame():
    service = _StubService(None)
    resp = _dispatch(service, b"\x09whatever")
    assert TlvReader(resp).read_frame() == srv.ERROR_FRAME
    assert service.calls == []


def test_dispatch_empty_request_answers_error_frame():
    resp = _dispatch(_StubService(None), b"")
    assert TlvReader(resp).read_frame() == srv.ERROR_FRAME


def test_dispatch_malformed_prove_answers_error_frame():
    resp = _dispatch(_StubService(None), b"\x01\x05hello")
    assert TlvReader(resp).read_frame() == srv.ERROR_FRAME


def test_dispatch_verify_false_is_normal_response():
    """verification failure is payload 0x00, NOT the error frame
    (futures/main.rs:95-100)."""
    proof = BlindBidProof(
        r1cs=_dummy_r1cs(), commitments=[bytes(32)] * 4, t_c=[bytes(32)] * 2
    )
    w = TlvWriter()
    w.write(srv.encode_proof(proof))
    for v in (1, 2, 3):
        w.write(v.to_bytes(32, "little"))
    w.write_list([v.to_bytes(32, "little") for v in (1, 2)])
    body = w.getvalue()
    assert TlvReader(_dispatch(_StubService(False), b"\x02" + body)).read_frame() == b"\x00"
    assert TlvReader(_dispatch(_StubService(True), b"\x02" + body)).read_frame() == b"\x01"


def test_dispatch_service_exception_contained():
    proof = BlindBidProof(
        r1cs=_dummy_r1cs(), commitments=[bytes(32)] * 4, t_c=[bytes(32)] * 2
    )
    w = TlvWriter()
    w.write(srv.encode_proof(proof))
    for v in (1, 2, 3):
        w.write(v.to_bytes(32, "little"))
    w.write_list([])
    resp = _dispatch(_StubService(RuntimeError("boom")), b"\x02" + w.getvalue())
    assert TlvReader(resp).read_frame() == srv.ERROR_FRAME
