"""Tests for the host Keccak permutation and Merlin/STROBE transcript."""

import hashlib

from dusk_blindbidproof_tpu.utils.keccak import sha3_256, keccak_f1600
from dusk_blindbidproof_tpu.utils.merlin import Transcript


def test_keccak_f1600_via_sha3_vs_hashlib():
    for msg in [b"", b"abc", b"blind bid", bytes(range(200)), b"x" * 1000]:
        assert sha3_256(msg) == hashlib.sha3_256(msg).digest()


def test_keccak_f1600_deterministic_nonzero():
    out = keccak_f1600([0] * 25)
    # Known first lane of Keccak-f[1600] applied to the zero state.
    assert out[0] == 0xF1258F7940E1DDE7


def test_merlin_equivalence_simple():
    """The `merlin` crate's own `equivalence_simple` test vector: protocol
    label b"test protocol", one append, one 32-byte challenge."""
    t = Transcript(b"test protocol")
    t.append_message(b"some label", b"some data")
    chal = t.challenge_bytes(b"challenge", 32)
    assert chal.hex() == "d5a21972d0d5fe320c0d263fac7fffb8145aa640af6e9bca177c03c7efcf0615"


def test_merlin_challenge_stream_is_stateful():
    t = Transcript(b"proto")
    c1 = t.challenge_bytes(b"c", 32)
    c2 = t.challenge_bytes(b"c", 32)
    assert c1 != c2

    # identical transcripts produce identical challenges
    a = Transcript(b"proto")
    b = Transcript(b"proto")
    a.append_message(b"l", b"m")
    b.append_message(b"l", b"m")
    assert a.challenge_bytes(b"c", 64) == b.challenge_bytes(b"c", 64)

    # diverging data produces diverging challenges
    a.append_message(b"l", b"m1")
    b.append_message(b"l", b"m2")
    assert a.challenge_bytes(b"c", 64) != b.challenge_bytes(b"c", 64)


def test_merlin_long_absorb_and_squeeze_cross_rate_boundary():
    t = Transcript(b"proto")
    t.append_message(b"big", bytes(1000))
    out = t.challenge_bytes(b"c", 500)
    assert len(out) == 500
    # clone independence
    t2 = t.clone()
    assert t.challenge_bytes(b"c", 32) == t2.challenge_bytes(b"c", 32)


def test_transcript_rng_deterministic_given_seed():
    t = Transcript(b"proto")
    t.append_message(b"l", b"m")
    r1 = t.build_rng().rekey_with_witness_bytes(b"w", b"\x01" * 32).finalize(b"\x42" * 32)
    r2 = t.build_rng().rekey_with_witness_bytes(b"w", b"\x01" * 32).finalize(b"\x42" * 32)
    assert r1.fill_bytes(64) == r2.fill_bytes(64)
    r3 = t.build_rng().rekey_with_witness_bytes(b"w", b"\x02" * 32).finalize(b"\x42" * 32)
    assert r1.fill_bytes(64) != r3.fill_bytes(64)


def test_native_backend_matches_python():
    """The C++ STROBE duplex (native/strobe.cc) must be byte-identical to the
    pure-Python Strobe128 across every op merlin uses, including rate-boundary
    crossings, clone, and the TranscriptRng key/prf path."""
    from dusk_blindbidproof_tpu.utils.merlin import (
        PyStrobe128,
        Strobe128,
        TranscriptRngBuilder,
    )

    if Strobe128 is PyStrobe128:
        import pytest

        pytest.skip("native backend unavailable")

    def drive(cls):
        t = Transcript.__new__(Transcript)
        t.strobe = cls(Transcript.MERLIN_PROTOCOL_LABEL)
        t.append_message(b"dom-sep", b"BlindBidProofGadget")
        out = []
        for i in range(40):
            t.append_message(b"pt", bytes([i]) * (1 + 7 * i))  # cross rate
            out.append(t.challenge_bytes(b"ch", 64))
        c = t.clone()
        out.append(c.challenge_bytes(b"post-clone", 33))
        rng = (
            TranscriptRngBuilder(t.strobe.clone())
            .rekey_with_witness_bytes(b"w", b"\x07" * 32)
            .finalize(b"\x01" * 32)
        )
        out.append(rng.fill_bytes(96))
        return out

    assert drive(PyStrobe128) == drive(Strobe128)
