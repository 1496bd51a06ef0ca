"""Bid — behavioral port of /root/reference/src/blindbid/bid.rs.

The reference wraps one scalar: ``Bid { x: Scalar }`` (bid.rs:9-12), built
from raw 32-byte wire entries with ``Scalar::from_bits`` — i.e. the top bit
masked off but NO canonical mod-l reduction (bid.rs:27; SURVEY.md §8.5
quirk 3).  Non-canonical 255-bit values are accepted as-is and flow into the
circuit unreduced on the wire, while all arithmetic downstream is mod L.

Quirk §8.5.1 replicated: ``From<Vec<u8>>`` uses ``cmp::max(bytes.len(), 32)``
where ``min`` was intended (bid.rs:24), so any input that is not exactly
32 bytes panics in the reference.  We raise ``ValueError`` for the same
inputs, preserving the observable contract (only 32-byte entries decode).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..utils.tlv import TlvReader


def scalar_from_bits(data: bytes) -> int:
    """``Scalar::from_bits``: mask bit 255, no canonical reduction."""
    if len(data) != 32:
        # bid.rs:24 makes any non-32-byte entry fatal (quirk §8.5.1)
        raise ValueError(f"bid entries must be 32 bytes, got {len(data)}")
    return int.from_bytes(data, "little") & ((1 << 255) - 1)


@dataclass(frozen=True)
class Bid:
    """One public-list entry (bid.rs:9-12)."""

    x: int  # raw 255-bit value, possibly >= L (from_bits semantics)

    @staticmethod
    def from_bytes(data: bytes) -> "Bid":
        return Bid(scalar_from_bits(data))

    @staticmethod
    def try_list_from_reader(reader: TlvReader) -> list["Bid"]:
        """TLV list of 32-byte entries -> bids (bid.rs:15-17)."""
        return [Bid.from_bytes(item) for item in reader.read_list()]

    def to_bytes(self) -> bytes:
        return self.x.to_bytes(32, "little")
