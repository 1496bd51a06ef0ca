"""Generator setup tests (PedersenGens / BulletproofGens)."""

import time

from dusk_blindbidproof_tpu.utils.curve_host import EdwardsPoint, ristretto_compress
from dusk_blindbidproof_tpu.utils.generators import (
    BulletproofGens,
    PedersenGens,
    cached_bp_gens,
)


def test_pedersen_default_basepoint():
    pc = PedersenGens.default()
    assert (
        ristretto_compress(pc.B).hex()
        == "e2f2ae0a6abc4e71a884a961c500515f58e30b6aa582dd8db6a65945e08d2d76"
    )
    # B_blinding must be a valid, non-identity point distinct from B
    assert not pc.B_blinding.ristretto_eq(pc.B)
    assert not pc.B_blinding.ristretto_eq(EdwardsPoint.identity())


def test_pedersen_commit_homomorphic():
    pc = PedersenGens.default()
    c1 = pc.commit(5, 7)
    c2 = pc.commit(11, 13)
    c3 = pc.commit(16, 20)
    assert (c1 + c2).ristretto_eq(c3)


def test_bp_gens_deterministic_and_distinct():
    g1 = BulletproofGens(8, 1)
    g2 = BulletproofGens(8, 1)
    enc1 = [ristretto_compress(p) for p in g1.G_vec[0] + g1.H_vec[0]]
    enc2 = [ristretto_compress(p) for p in g2.G_vec[0] + g2.H_vec[0]]
    assert enc1 == enc2
    assert len(set(enc1)) == 16  # all distinct


def test_bp_gens_prefix_stability():
    """Gens for capacity 8 must be a prefix of gens for capacity 32 (the
    XOF chain property the crate relies on for resizing)."""
    small = BulletproofGens(8, 1)
    big = BulletproofGens(32, 1)
    for a, b in zip(small.G_vec[0], big.G_vec[0]):
        assert ristretto_compress(a) == ristretto_compress(b)


def test_cached_bp_gens_is_cached():
    t0 = time.monotonic()
    a = cached_bp_gens(64)
    t1 = time.monotonic()
    b = cached_bp_gens(64)
    t2 = time.monotonic()
    assert a is b
    assert (t2 - t1) < (t1 - t0) + 0.01
