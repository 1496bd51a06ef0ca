"""API-surface parity tests: Bid (bid.rs), unified errors (error.rs)."""

import io

import pytest

from dusk_blindbidproof_tpu.errors import (
    BlindBidError,
    IoError,
    OtherError,
    TlvError,
    UnexpectedEof,
    wrap_exception,
)
from dusk_blindbidproof_tpu.models.bid import Bid, scalar_from_bits
from dusk_blindbidproof_tpu.utils.tlv import TlvReader, TlvWriter


def test_from_bits_masks_top_bit_no_reduction():
    # bit 255 is masked; the remaining 255-bit value is NOT reduced mod L
    raw = (2**256 - 1).to_bytes(32, "little")
    assert scalar_from_bits(raw) == (1 << 255) - 1
    raw2 = (7).to_bytes(32, "little")
    assert scalar_from_bits(raw2) == 7


def test_bid_non_32_byte_entry_fatal():
    # quirk §8.5.1: reference panics on any non-32-byte entry (bid.rs:24)
    with pytest.raises(ValueError):
        Bid.from_bytes(b"\x01" * 31)
    with pytest.raises(ValueError):
        Bid.from_bytes(b"\x01" * 33)


def test_bid_list_round_trip():
    bids = [Bid(i * 7 + 1) for i in range(5)]
    w = TlvWriter()
    w.write_list([b.to_bytes() for b in bids])
    got = Bid.try_list_from_reader(TlvReader(w.getvalue()))
    assert got == bids


def test_wrap_exception_mapping():
    assert isinstance(wrap_exception(ConnectionResetError("x")), IoError)
    assert isinstance(wrap_exception(EOFError("x")), UnexpectedEof)
    assert isinstance(wrap_exception(ValueError("x")), OtherError)
    assert isinstance(wrap_exception(RuntimeError("x")), OtherError)
    e = TlvError("bad frame")
    assert wrap_exception(e) is e
    assert isinstance(e, BlindBidError)


def test_tlv_truncated_frame_raises_eof():
    w = TlvWriter()
    w.write(b"\x01\x02\x03\x04")
    data = w.getvalue()[:-2]
    with pytest.raises(EOFError):
        TlvReader(io.BytesIO(data)).expect_frame()
