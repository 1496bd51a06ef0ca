"""Multi-chip correctness on the virtual 8-device CPU mesh (SURVEY.md §4f).

conftest.py forces XLA_FLAGS=--xla_force_host_platform_device_count=8, so
these tests exercise real GSPMD partitioning + collectives without TPU
hardware:

  * TP-analog: `sharded_msm` (items partitioned over the `points` axis,
    all-gather + group-law tree reduction) == single-device `msm`;
  * DP-analog: `prove_batch(..., mesh=...)` / `verify_batch(..., mesh=...)`
    (bids sharded over the `bids` axis) produce byte-identical proofs to
    the unsharded path (slow marker: full-engine compile).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dusk_blindbidproof_tpu.ops import edwards, limb, msm
from dusk_blindbidproof_tpu.parallel import mesh as pmesh
from dusk_blindbidproof_tpu.utils import curve_host as host

import random

rng = np.random.default_rng(11)
prand = random.Random(11)


@pytest.mark.slow
def test_sharded_msm_matches_msm():
    m = pmesh.make_mesh(8, bids=1, points=8)
    n = 16
    B = host.ED25519_BASEPOINT
    pts_host = [B.scalar_mul(prand.randrange(1, host.L)) for _ in range(n)]
    scalars = [prand.randrange(0, host.L) for _ in range(n)]
    pts = edwards.from_host(pts_host)
    s = jnp.asarray(limb.ints_to_limbs(scalars))

    got = pmesh.sharded_msm(m, pts, s)
    want = jax.jit(msm.msm)(pts, s)
    assert np.asarray(jax.jit(edwards.eq_points)(got, want)).all()


@pytest.mark.slow
def test_sharded_bucket_step_matches_local():
    m = pmesh.make_mesh(8, bids=4, points=2)
    B, n_items = 8, 16
    base = edwards.from_host(host.ED25519_BASEPOINT)
    pts = jnp.broadcast_to(base, (B, n_items, 4, limb.NLIMBS))
    digits = jnp.asarray(
        rng.integers(0, msm.D_BUCKETS, size=(B, n_items)).astype(np.int32)
    )
    got = pmesh.sharded_bucket_step(m, pts, digits)
    want = jax.jit(msm.bucket_msm)(pts, digits)
    assert np.asarray(jax.jit(edwards.eq_points)(got, want)).all()


@pytest.mark.slow
def test_sharded_prove_verify_byte_identical():
    """DP-analog end-to-end: bids sharded over 4 devices == unsharded,
    byte-for-byte (same transcripts => same challenges => same proofs)."""
    from dusk_blindbidproof_tpu.models.blindbid import (
        VerifyRequest,
        make_prove_request,
        prove_batch,
        verify_batch,
    )

    m = pmesh.make_mesh(4, bids=4, points=1)
    reqs = [
        make_prove_request(
            d=100 + i, k=200 + i, seed=300 + i,
            pub_list_extra=[7, 8, 9], toggle_pos=i % 4,
        )
        for i in range(4)
    ]
    plain = prove_batch(reqs, rng=np.random.default_rng(5))
    sharded = prove_batch(reqs, rng=np.random.default_rng(5), mesh=m)
    for a, b in zip(plain, sharded):
        assert a.r1cs.to_bytes() == b.r1cs.to_bytes()
        assert a.commitments == b.commitments and a.t_c == b.t_c

    vreqs = [
        VerifyRequest(proof=p, score=r.q, z_img=r.z_img, seed=r.seed,
                      pub_list=r.pub_list)
        for p, r in zip(sharded, reqs)
    ]
    assert verify_batch(vreqs, mesh=m) == [True] * 4
