"""Batched device Edwards ops vs the host oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from dusk_blindbidproof_tpu.ops import edwards, limb
from dusk_blindbidproof_tpu.utils import curve_host as host

B = host.ED25519_BASEPOINT


def host_pts(scalars):
    return [B.scalar_mul(s) for s in scalars]


@jax.jit
def _add_j(p, q):
    return edwards.add(p, q)


@jax.jit
def _double_j(p):
    return edwards.double(p)


@jax.jit
def _check_j(p, q):
    return edwards.eq_points(p, q), edwards.on_curve(p)


def test_add_double_vs_host():
    xs = [1, 2, 3, 12345, 2**200 + 17, host.L - 1, host.L - 2]
    ys = [7, 1, 9, 54321, 2**190 + 3, 1, host.L - 1]
    p = edwards.from_host(host_pts(xs))
    q = edwards.from_host(host_pts(ys))
    got_add = _add_j(p, q)
    want_add = edwards.from_host([B.scalar_mul(x + y) for x, y in zip(xs, ys)])
    eq, oncurve = _check_j(got_add, want_add)
    assert np.asarray(eq).all()
    assert np.asarray(oncurve).all()

    got_dbl = _double_j(p)
    want_dbl = edwards.from_host([B.scalar_mul(2 * x) for x in xs])
    eq, oncurve = _check_j(got_dbl, want_dbl)
    assert np.asarray(eq).all()
    assert np.asarray(oncurve).all()


def test_unified_add_edge_cases():
    """The MSM scan relies on completeness: P+P, P+identity, P+(-P)."""
    xs = [5, 42, 99, 1, 2, 3, 4]
    p = edwards.from_host(host_pts(xs))
    ident = edwards.identity((len(xs),))

    # P + identity = P
    eq, _ = _check_j(_add_j(p, ident), p)
    assert np.asarray(eq).all()

    # P + P = 2P via the *unified* add
    eq, _ = _check_j(_add_j(p, p), _double_j(p))
    assert np.asarray(eq).all()

    # P + (-P) = identity
    neg = jax.jit(edwards.negate)(p)
    eq, _ = _check_j(_add_j(p, neg), ident)
    assert np.asarray(eq).all()


def test_scalar_mul_bits_vs_host():
    scalars = [1, 2, 12345678901234567890, host.L - 1, 0, 2**252 - 3, 7]
    s_limbs = jnp.asarray(limb.ints_to_limbs(scalars))
    bits = edwards.scalar_limbs_to_bits(s_limbs)
    base = edwards.from_host([B] * len(scalars))
    got = jax.jit(edwards.scalar_mul_bits)(base, bits)
    want = edwards.from_host([B.scalar_mul(s) for s in scalars])
    eq, oncurve = _check_j(got, want)
    assert np.asarray(eq).all()
    # identity rows (scalar 0) are still on curve
    assert np.asarray(oncurve).all()


def test_host_roundtrip():
    pts = host_pts([3, 17])
    back = edwards.to_host(edwards.from_host(pts))
    for a, b in zip(pts, back):
        assert a.ristretto_eq(b)
        assert host.ristretto_compress(a) == host.ristretto_compress(b)
