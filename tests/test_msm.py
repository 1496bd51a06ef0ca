"""MSM kernel vs host ground truth (SURVEY.md §7 step 4 gate)."""

import random

import jax
import jax.numpy as jnp
import numpy as np

from dusk_blindbidproof_tpu.ops import edwards, limb, msm
from dusk_blindbidproof_tpu.utils import curve_host as host

import pytest

# Full-engine device graphs: multi-minute XLA-CPU compiles.  The fast
# suite (`make test`, -m "not slow") gates with host-side golden vectors,
# property tests, and the interpret-mode Pallas kernels; these run in
# `make inttest`.
pytestmark = pytest.mark.slow

B = host.ED25519_BASEPOINT
rng = random.Random(99)


def host_msm(points, scalars):
    acc = host.EdwardsPoint.identity()
    for p, s in zip(points, scalars):
        acc = acc + p.scalar_mul(s)
    return acc


_msm_j = jax.jit(msm.msm)
_eq_j = jax.jit(edwards.eq_points)


def test_msm_small_vs_host():
    n = 8
    pts_host = [B.scalar_mul(rng.randrange(1, host.L)) for _ in range(n)]
    scalars = [rng.randrange(0, host.L) for _ in range(n)]
    # adversarial values
    scalars[0] = 0
    scalars[1] = 1
    scalars[2] = host.L - 1

    got = _msm_j(
        edwards.from_host(pts_host), jnp.asarray(limb.ints_to_limbs(scalars))
    )
    want = edwards.from_host(host_msm(pts_host, scalars))
    assert np.asarray(_eq_j(got, want)).all()


def test_msm_batched():
    n, batch = 4, 3
    pts_host = [
        [B.scalar_mul(rng.randrange(1, host.L)) for _ in range(n)]
        for _ in range(batch)
    ]
    scalars = [[rng.randrange(0, host.L) for _ in range(n)] for _ in range(batch)]
    pts = jnp.stack([edwards.from_host(row) for row in pts_host])
    s = jnp.stack([jnp.asarray(limb.ints_to_limbs(row)) for row in scalars])
    got = _msm_j(pts, s)
    want = edwards.from_host(
        [host_msm(p_row, s_row) for p_row, s_row in zip(pts_host, scalars)]
    )
    assert np.asarray(_eq_j(got, want)).all()


def test_msm_all_zero_scalars_gives_identity():
    n = 4
    pts_host = [B.scalar_mul(i + 2) for i in range(n)]
    got = _msm_j(
        edwards.from_host(pts_host),
        jnp.zeros((n, limb.NLIMBS), dtype=jnp.int32),
    )
    assert np.asarray(_eq_j(got, edwards.identity())).all()


def test_prescale_windows():
    pts_host = [B, B.scalar_mul(7)]
    table = jax.jit(msm.prescale_windows)(edwards.from_host(pts_host))
    assert table.shape == (2, msm.WINDOWS, 4, limb.NLIMBS)
    for i, p in enumerate(pts_host):
        for w in [0, 1, 5, 19]:
            want = edwards.from_host(p.scalar_mul(2 ** (13 * w) % host.L))
            assert np.asarray(_eq_j(table[i, w], want)).all()


def test_bucket_path_forced_vs_host(monkeypatch):
    """The production sort + blocked-scan + histogram bucket path (taken for
    m > BIT_MSM_MAX_ITEMS in production, i.e. every prover/verifier MSM) run
    at small m by lowering the threshold — regression cover for
    _inclusive_scan_points/_batched_hist/boundary-gather without a 2048-gen
    compile (VERDICT r4 weak #4)."""
    monkeypatch.setattr(msm, "BIT_MSM_MAX_ITEMS", 0)
    m = 50  # > _UNROLL_MAX, not a multiple of the scan block
    pts_host = [B.scalar_mul(rng.randrange(1, host.L)) for _ in range(m)]
    digits = [rng.randrange(0, msm.D_BUCKETS) for _ in range(m)]
    digits[0] = 0
    digits[1] = msm.D_BUCKETS - 1
    digits[2] = digits[3] = 77  # duplicate bucket
    pts = edwards.from_host(pts_host)
    d = jnp.asarray(np.asarray(digits, dtype=np.int32))

    want = edwards.from_host(
        host_msm(pts_host, [int(x) for x in digits])
    )
    got = jax.jit(lambda p, dd: msm.bucket_msm(p, dd))(pts, d)
    assert np.asarray(_eq_j(got, want)).all()

    # affine-Niels leaf adds (the fixed-table form every phase program uses)
    niels = jax.jit(edwards.to_niels)(pts)
    got_n = jax.jit(lambda p, dd: msm.bucket_msm(p, dd, niels=True))(niels, d)
    assert np.asarray(_eq_j(got_n, want)).all()

    # the TPU plane-layout scan path (fused kernels via the interpreter)
    from dusk_blindbidproof_tpu.ops import fused

    monkeypatch.setattr(fused, "enabled", lambda: True)
    got_p = jax.jit(lambda p, dd: msm.bucket_msm(p, dd, niels=True))(niels, d)
    assert np.asarray(_eq_j(got_p, want)).all()

    # lazy (non-canonical) digit path: digits a few units above 2^13 in 21
    # windows must produce the same group element
    lazy = [rng.randrange(0, 8194) for _ in range(m)]
    want_l = edwards.from_host(host_msm(pts_host, lazy))
    dl = jnp.asarray(np.asarray(lazy, dtype=np.int32))
    got_l = jax.jit(
        lambda p, dd: msm.bucket_msm(p, dd, niels=True, d_max=8194)
    )(niels, dl)
    assert np.asarray(_eq_j(got_l, want_l)).all()


def test_niels_roundtrip_add():
    """add_niels(p, to_niels(q)) == add(p, q) including identity operands."""
    p = B.scalar_mul(rng.randrange(1, host.L))
    q = B.scalar_mul(rng.randrange(1, host.L))
    cases = [(p, q), (p, p), (p, host.EdwardsPoint.identity())]
    for a, b in cases:
        got = jax.jit(edwards.add_niels)(
            edwards.from_host(a), jax.jit(edwards.to_niels)(edwards.from_host(b))
        )
        want = edwards.from_host(a + b)
        assert np.asarray(_eq_j(got, want)).all()


def test_msm_prescaled_matches_msm():
    n = 4
    pts_host = [B.scalar_mul(rng.randrange(1, host.L)) for _ in range(n)]
    scalars = [rng.randrange(0, host.L) for _ in range(n)]
    pts = edwards.from_host(pts_host)
    s = jnp.asarray(limb.ints_to_limbs(scalars))

    table = jax.jit(msm.prescale_windows)(pts)
    got = jax.jit(msm.msm_prescaled)(table, limb.jcanon(limb.FL, s))
    want = edwards.from_host(host_msm(pts_host, scalars))
    assert np.asarray(_eq_j(got, want)).all()
