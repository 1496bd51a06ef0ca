"""Host curve ground truth vs the ristretto255 spec (RFC 9496) vectors."""

import hashlib

from dusk_blindbidproof_tpu.utils.curve_host import (
    ED25519_BASEPOINT,
    EdwardsPoint,
    L,
    P,
    ristretto_compress,
    ristretto_decompress,
    ristretto_from_uniform_bytes,
    scalar_invert,
)

# RFC 9496 §A.1 — small multiples of the ristretto255 generator.
SMALL_MULTIPLES = [
    "0000000000000000000000000000000000000000000000000000000000000000",
    "e2f2ae0a6abc4e71a884a961c500515f58e30b6aa582dd8db6a65945e08d2d76",
    "6a493210f7499cd17fecb510ae0cea23a110e8d5b901f8acadd3095c73a3b919",
    "94741f5d5d52755ece4f23f044ee27d5d1ea1e2bd196b462166b16152a9d0259",
    "da80862773358b466ffadfe0b3293ab3d9fd53c5ea6c955358f568322daf6a57",
    "e882b131016b52c1d3337080187cf768423efccbb517bb495ab812c4160ff44e",
    "f64746d3c92b13050ed8d80236a7f0007c3b3f962f5ba793d19a601ebb1df403",
    "44f53520926ec81fbd5a387845beb7df85a96a24ece18738bdcfa6a7822a176d",
    "903293d8f2287ebe10e2374dc1a53e0bc887e592699f02d077d5263cdd55601c",
    "02622ace8f7303a31cafc63f8fc48fdc16e1c8c8d234b2f0d6685282a9076031",
    "20706fd788b2720a1ed2a5dad4952b01f413bcf0e7564de8cdc816689e2db95f",
    "bce83f8ba5dd2fa572864c24ba1810f9522bc6004afe95877ac73241cafdab42",
    "e4549ee16b9aa03099ca208c67adafcafa4c3f3e4e5303de6026e3ca8ff84460",
    "aa52e000df2e16f55fb1032fc33bc42742dad6bd5a8fc0be0167436c5948501f",
    "46376b80f409b29dc2b5f6f0c52591990896e5716f41477cd30085ab7f10301e",
    "e0c418f7c8d9c4cdd7395b93ea124f3ad99021bb681dfc3302a9d99a2e53e64e",
]

# RFC 9496 §A.3 — one-way map of SHA-512 of labeled inputs.  Only the vectors
# whose expected encodings we could pin down offline are kept; together they
# exercise both Elligator branches (was_square true and false).
HASH_TO_GROUP = [
    (
        b"Ristretto is traditionally a short shot of espresso coffee",
        "3066f82a1a747d45120d1740f14358531a8f04bbffe6a819f86dfe50f44a0a46",
    ),
    (
        b"about half the amount of water in the same amount of time",
        "006ccd2a9e6867e6a2c5cea83d3302cc9de128dd2a9a57dd8ee7b9d7ffe02826",
    ),
]


def test_small_multiples_of_generator():
    acc = EdwardsPoint.identity()
    for i, expect in enumerate(SMALL_MULTIPLES):
        assert ristretto_compress(acc).hex() == expect, f"multiple {i}"
        acc = acc + ED25519_BASEPOINT


def test_compress_decompress_roundtrip():
    for i in range(1, 20):
        pt = ED25519_BASEPOINT.scalar_mul(i * 104729 + 7)
        enc = ristretto_compress(pt)
        dec = ristretto_decompress(enc)
        assert dec is not None
        assert dec.ristretto_eq(pt)
        assert ristretto_compress(dec) == enc


def test_decompress_rejects_bad_encodings():
    # non-canonical: p itself, and all-0xff
    assert ristretto_decompress(((P).to_bytes(32, "little"))) is None
    assert ristretto_decompress(b"\xff" * 32) is None
    # negative s (odd)
    assert ristretto_decompress((1).to_bytes(32, "little")) is None
    # wrong length
    assert ristretto_decompress(b"\x00" * 31) is None


def test_one_way_map_vectors():
    for label, expect in HASH_TO_GROUP:
        uniform = hashlib.sha512(label).digest()
        pt = ristretto_from_uniform_bytes(uniform)
        assert ristretto_compress(pt).hex() == expect, label


def test_group_laws():
    a = ED25519_BASEPOINT.scalar_mul(123456789)
    b = ED25519_BASEPOINT.scalar_mul(987654321)
    assert (a + b).ristretto_eq(b + a)
    assert ((a + b) + a).ristretto_eq(a.double() + b)
    assert (a - a).ristretto_eq(EdwardsPoint.identity())
    # scalar arithmetic mod L
    assert ED25519_BASEPOINT.scalar_mul(L).ristretto_eq(EdwardsPoint.identity())
    s = 0xDEADBEEF
    si = scalar_invert(s)
    assert a.scalar_mul(s).scalar_mul(si).ristretto_eq(a)
