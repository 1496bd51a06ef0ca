"""Mesh sharding: partitioned MSM and batch proving (SURVEY.md §2.3).

The reference's parallelism inventory maps to TPU as:

  * DP-analog  — independent bids sharded over a `bids` mesh axis: every
    device runs the full prover phase programs on its slice of the batch
    (the reference's analog is the num_cpus connection pool,
    /root/reference/Cargo.lock:191-198).
  * TP-analog  — one MSM's items partitioned over a `points` mesh axis:
    each device bucket-accumulates its slice locally, then the partial
    group elements are combined with an all-gather + Edwards tree add over
    ICI (the psum-style reduction of SURVEY.md §2.3; note the reduction is
    a *group* add of limb-coded points, so it rides all_gather rather than
    an arithmetic psum).
  * PP/SP-analog — none needed: Fiat-Shamir phases are sequential by
    construction (SURVEY.md §2.3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import edwards, limb, msm
from ..ops.limb import FL, NLIMBS


def make_mesh(n_devices: int | None = None, bids: int | None = None,
              points: int | None = None) -> Mesh:
    """Build a 2D (bids, points) mesh over the available devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if bids is None and points is None:
        points = 1
        bids = n
    bids = bids or n // points
    points = points or n // bids
    assert bids * points == n, (bids, points, n)
    arr = np.asarray(devs[:n]).reshape(bids, points)
    return Mesh(arr, axis_names=("bids", "points"))


def sharded_msm(mesh: Mesh, points_arr: jnp.ndarray, scalars: jnp.ndarray):
    """MSM with items partitioned over the `points` mesh axis.

    points_arr: [n, 4, NLIMBS]; scalars: [n, NLIMBS].  n must divide evenly
    by the points-axis size.  Each device computes the bucket MSM of its
    slice; partial results are all-gathered and tree-added (log2(ndev)
    Edwards adds) — equivalent to a psum over the group law.
    """

    def local(pts, scs):
        digits = limb.canon(FL, scs)
        prescaled = msm.prescale_windows_batched(pts)
        partial = msm.msm_prescaled(prescaled, digits)  # [4, NLIMBS]
        gathered = jax.lax.all_gather(partial, "points")  # [ndev, 4, NL]
        total = msm._tree_sum_points(_pad_pow2(gathered))
        return total

    shard = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("points"), P("points")),
        out_specs=P(),
        # check_vma=False is REQUIRED, not a shortcut: the result is
        # mathematically replicated over `points` (every device all-gathers
        # the same partials and tree-adds them), but shard_map's static
        # varying-axis checker only understands replication produced by
        # primitives it knows (psum & friends).  Our reduction is the
        # Edwards GROUP law over limb vectors — an arithmetic psum cannot
        # add curve points — so the checker sees a `points`-varying value
        # flowing into out_specs=P() and rejects it; `jax.lax.pvary` can
        # only add variance, never discharge it.  Correctness is instead
        # pinned by tests/test_mesh.py (sharded == single-device on the
        # 8-device CPU mesh) and the driver dryrun's host cross-check.
        check_vma=False,
    )
    return shard(points_arr, scalars)


def _pad_pow2(pts: jnp.ndarray) -> jnp.ndarray:
    m = pts.shape[-3]
    mp = 1 << (m - 1).bit_length()
    if mp == m:
        return pts
    pad = jnp.broadcast_to(
        edwards.identity(), (*pts.shape[:-3], mp - m, 4, NLIMBS)
    )
    return jnp.concatenate([pts, pad], axis=-3)


def shard_batch_over_bids(mesh: Mesh, arr: jnp.ndarray) -> jnp.ndarray:
    """Place a [B, ...] batch array sharded over the bids axis."""
    spec = P("bids", *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def sharded_bucket_step(mesh: Mesh, points_arr: jnp.ndarray,
                        digits: jnp.ndarray):
    """A jit-compiled sharded bucket-accumulation step used by the
    multi-chip dry run: batch over `bids`, items over `points`."""

    def local(pts, digs):
        partial = msm.bucket_msm(pts, digs)  # [b_loc, 4, NL]
        gathered = jax.lax.all_gather(partial, "points", axis=0)
        # gathered: [n_dev, b_loc, 4, NL] — move the device axis to -3 so the
        # group-law tree reduction runs over devices, not the local batch
        gathered = jnp.moveaxis(gathered, 0, -3)  # [b_loc, n_dev, 4, NL]
        return msm._tree_sum_points(_pad_pow2(gathered))

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P("bids", "points"), P("bids", "points")),
            out_specs=P("bids"),
            check_vma=False,  # replicated over `points` post-gather; see above
        )
    )(points_arr, digits)
