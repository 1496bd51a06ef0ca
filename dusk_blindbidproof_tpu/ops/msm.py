"""Multi-scalar multiplication (MSM) — the framework's north-star kernel.

TPU-native replacement for `curve25519-dalek`'s Straus/Pippenger MSM
(SURVEY.md §2.2 row 3): the reference's prover spends ~99% of its time in
MSMs over the Bulletproof generator vectors
(/root/reference/src/blindbid/proof.rs:88 via the pinned bulletproofs crate).

Design (scatter-free Pippenger, re-derived for XLA; measured notes in
docs/DESIGN.md and BENCHMARKS.md):

  * Window size c = 13 = LIMB_BITS, so the canonical limb decomposition of
    a scalar IS its window-digit decomposition: zero digit-extraction cost
    (`limb.digits_lazy` + d_max also supports non-canonical std digits).
  * Fixed bases are pre-scaled per window: table[i, w] = 2^(13 w) * G_i,
    with an affine-Niels copy (Z=1) for 7M mixed scan adds.  An MSM then is
    one flat weighted sum  sum_j digit_j * Q_j  over m = n * NLIMBS items —
    no doublings at all.
  * Bucket accumulation without scatters:
      - sort items by digit descending (keys only), then gather the point
        limbs as packed flat rows (pairs of limbs per int32 — the (4, 21)
        row gather scalarizes at ~5 GB/s on TPU, the packed flat gather
        runs ~10x faster);
      - within-block inclusive scans of the sorted points (on TPU: fused
        plane-layout Pallas adds, one relayout in/out) + exclusive block
        offsets from recursing on the block totals;
      - suffix sums per bucket = within[pos_k] + offset[pos_k // R] at the
        last position with digit >= k, located via a digit histogram (pure
        cumsum, no searchsorted) — the scan is only read at the D-1
        boundaries, so no offset-apply pass over all m items runs;
      - sum_b b * B_b = sum_{k>=1} suf_k: one log-tree reduction over D.
    Total ~ m + 2D unified Edwards adds, all as wide vector steps.

Batched: a leading batch axis runs independent MSMs (independent proofs) in
lockstep — the throughput axis of SURVEY.md §2.3.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import edwards, limb
from .limb import FL, LIMB_BITS, NLIMBS

# One window per scalar limb that can be nonzero: canonical scalars are
# < L < 2^253, so limb 20 (weight 2^260) is always zero — 20 windows
# suffice.  (A 21-window lazy-digit variant that skips the canonical
# reduction measured net-slower at batch 16 — the +5% window items cost
# more than the saved ~10 canon passes; see BENCHMARKS.md.)
WINDOWS = NLIMBS - 1
D_BUCKETS = 1 << LIMB_BITS


def prescale_windows(points: jnp.ndarray) -> jnp.ndarray:
    """[n, 4, NLIMBS] points -> [n, WINDOWS, 4, NLIMBS] with
    out[i, w] = 2^(13 w) * P_i, computed by 13 batched doubles per window."""

    def step(carry, _):
        nxt = carry
        for _ in range(LIMB_BITS):
            nxt = edwards.double(nxt)
        return nxt, carry

    _, scaled = jax.lax.scan(step, points, None, length=WINDOWS)
    # scaled: [WINDOWS, n, 4, NLIMBS] -> [n, WINDOWS, 4, NLIMBS]
    return jnp.moveaxis(scaled, 0, 1)


def _shift_down(x: jnp.ndarray, k: int, fill: jnp.ndarray) -> jnp.ndarray:
    """x[..., j, :] -> x[..., j-k, :] along axis -3 (items), filling with
    `fill` rows at the front."""
    pad = jnp.broadcast_to(fill, (*x.shape[:-3], k, *x.shape[-2:]))
    return jnp.concatenate([pad, x[..., :-k, :, :]], axis=-3)


# below this item count a Hillis-Steele ladder unrolls instead: log2(m)
# sequential steps at m*log2(m) total adds — the right trade for the small
# recursion levels, where step-launch latency dominates total work
_UNROLL_MAX = 128
# sequential block length of the two-level scans: R scan steps of width m/R
# (total work is ~m adds regardless; R trades steps against width)
_BLOCK_R = 32
# below this row width the block-offset apply is one full-width broadcast
# add instead of a second R-step scan (the scan-apply exists only to bound
# peak temporaries at 82k-row widths; recursion levels are ~m/32 wide)
_APPLY_WIDE_MAX = 16384


def _pad_items(x: jnp.ndarray, k: int, niels: bool = False) -> jnp.ndarray:
    ident = edwards.identity_niels() if niels else edwards.identity()
    pad = jnp.broadcast_to(ident, (*x.shape[:-3], k, *x.shape[-2:]))
    return jnp.concatenate([x, pad], axis=-3)


def _blocked(x: jnp.ndarray, niels: bool = False):
    """[..., m, 4, NL] -> (scan-ready [R, ..., C, 4, NL], C) with identity
    padding; block c holds items [c*R, (c+1)*R)."""
    m = x.shape[-3]
    C = -(-m // _BLOCK_R)
    if C * _BLOCK_R != m:
        x = _pad_items(x, C * _BLOCK_R - m, niels=niels)
    view = x.reshape(*x.shape[:-3], C, _BLOCK_R, 4, NLIMBS)
    return jnp.moveaxis(view, -3, 0), C


def _inclusive_scan_points(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix scan of points along axis -3.

    Two-level blocked scan with an O(1)-size graph (the round-1..3
    recursive-pairing form unrolled ~2 log2(m) distinct add graphs and made
    every MSM compile-bound, VERDICT r3 weak #2): a `lax.scan` of R = 128
    sequential steps runs all m/R blocks' local scans in lockstep (work m
    adds, one add in the graph), block offsets come from recursing on the
    m/R block totals, and one broadcast add applies them (work m).  Total
    ~2m + o(m) adds — matching the work-efficient form at O(1) graph size.
    Small m unrolls a Hillis-Steele ladder with static shifts instead.
    """
    m = x.shape[-3]
    if m == 1:
        return x
    if m <= _UNROLL_MAX:
        off = 1
        while off < m:
            x = edwards.add(x, _shift_down(x, off, edwards.identity()))
            off *= 2
        return x
    xs, C = _blocked(x)
    acc0 = edwards.identity(xs.shape[1:-2]) + xs[0] * 0

    def step(acc, xt):
        acc = edwards.add(acc, xt)
        return acc, acc

    totals, within = jax.lax.scan(step, acc0, xs)
    offsets = _shift_down(
        _inclusive_scan_points(totals), 1, edwards.identity()
    )  # exclusive block prefix [..., C, 4, NL]

    out = jnp.moveaxis(within, 0, -3)  # [..., C, R, 4, NL]
    if m <= _APPLY_WIDE_MAX:
        # one broadcast add applies all block offsets in a single step
        out = edwards.add(out, offsets[..., :, None, :, :])
    else:
        # scan-apply: peak temporaries stay at block width (the one-shot
        # form's ~0.5 GB of gather/product buffers at 82k items crashed the
        # axon TPU worker)
        def apply(carry, wt):
            return carry, edwards.add(wt, carry)

        _, out_s = jax.lax.scan(apply, offsets, within)
        out = jnp.moveaxis(out_s, 0, -3)
    out = out.reshape(*out.shape[:-4], C * _BLOCK_R, 4, NLIMBS)
    return out[..., :m, :, :]


# the halving-tree unroll bound for reductions: log2(m) small static add
# graphs; 512 keeps the D-bucket suffix reduction at ~40 sequential steps
_TREE_UNROLL_MAX = 512


def _tree_sum_points(x: jnp.ndarray) -> jnp.ndarray:
    """Sum points along axis -3 (any length): `lax.scan` accumulates all
    m/R blocks in lockstep (work m adds, one add in the graph), then the
    block totals reduce recursively; small m unrolls the halving tree."""
    m = x.shape[-3]
    if m == 1:
        return x[..., 0, :, :]
    if m <= _TREE_UNROLL_MAX:
        while m > 1:
            if m % 2 != 0:
                last = x[..., m - 1 :, :, :]
                half = x[..., : m - 1, :, :].reshape(
                    *x.shape[:-3], (m - 1) // 2, 2, 4, NLIMBS
                )
                x = edwards.add(half[..., 0, :, :], half[..., 1, :, :])
                x = jnp.concatenate([x, last], axis=-3)
                m = (m - 1) // 2 + 1
            else:
                half = x.reshape(*x.shape[:-3], m // 2, 2, 4, NLIMBS)
                x = edwards.add(half[..., 0, :, :], half[..., 1, :, :])
                m //= 2
        return x[..., 0, :, :]
    xs, _C = _blocked(x)
    acc0 = edwards.identity(xs.shape[1:-2]) + xs[0] * 0

    def step(acc, xt):
        return edwards.add(acc, xt), None

    totals, _ = jax.lax.scan(step, acc0, xs)
    return _tree_sum_points(totals)


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


# below this item count the bit-decomposition path wins the runtime
# crossover (13*m*log m vs m*log m + D_BUCKETS*log D adds); chosen above the
# verifier's ~(40 points * 20 windows) = 800-item dynamic MSM so production
# verification takes the cheap path (VERDICT round 3 weak #8)
BIT_MSM_MAX_ITEMS = 1024


def _bit_msm(points: jnp.ndarray, digits: jnp.ndarray) -> jnp.ndarray:
    """Small-m weighted sum via digit bit-planes: 13 masked tree-sums
    (vectorized over the bit axis) + a Horner combine as a 12-step lax.scan.

    Used for the verifier's dynamic MSM and small shapes where the bucket
    path's 8192-bucket suffix fold would dominate runtime.
    """
    nbits = LIMB_BITS
    bits = (digits[..., :, None] >> np.arange(nbits, dtype=np.int32)) & 1
    bits = jnp.moveaxis(bits, -1, -2)  # [..., nbits, m]
    pts = jnp.broadcast_to(
        points[..., None, :, :, :],
        (*points.shape[:-3], nbits, *points.shape[-3:]),
    )
    masked = edwards.select(bits != 0, pts, edwards.identity())
    t = _tree_sum_points(masked)  # [..., nbits, 4, NLIMBS]
    t_rev = jnp.moveaxis(t, -3, 0)[::-1]  # [nbits, ...] MSB plane first

    def horner(acc, plane):
        return edwards.add(edwards.double(acc), plane), None

    acc, _ = jax.lax.scan(horner, t_rev[0], t_rev[1:])
    return acc


def bucket_msm(
    points: jnp.ndarray,
    digits: jnp.ndarray,
    niels: bool = False,
    d_max: int = D_BUCKETS,
) -> jnp.ndarray:
    """sum_j digits[j] * points[j] with digits in [0, d_max).

    points: [..., m, 4, NLIMBS], digits: [..., m] int32.  With niels=True
    the points are affine-Niels rows (fixed tables pre-normalized to Z=1)
    and every scan leaf add is the 7M mixed formula instead of 9M.  d_max
    sizes the histogram: `limb.digits20` emits lazy (non-canonical) digits
    a few units above 2^13, trading a slightly larger bucket range for
    skipping the full canonical reduction.  Returns [..., 4, NLIMBS].

    The prefix scan is only ever *read* at the d_max-1 bucket-boundary
    positions, so instead of materializing a full inclusive scan (within-
    block scan + an offset-apply pass over all m items, ~2m adds) this
    computes the within-block scans and block offsets (~m adds total) and
    gathers `within[pos] + offset[pos // R]` at the boundaries only
    (d_max extra adds).  On TPU the whole within-scan runs in the fused
    plane layout (one relayout in, one out — no per-step transposes).
    """
    if points.shape[-3] <= BIT_MSM_MAX_ITEMS and not niels:
        assert d_max <= D_BUCKETS, "bit path needs canonical 13-bit digits"
        return _bit_msm(points, digits)
    # Sort by digit descending and gather the points in PACKED FLAT-ROW
    # form.  Two facts drive this shape (measured on v5e at [16, 41k]):
    #   * a take_along_axis of (4, 21)-shaped point rows runs at ~5 GB/s
    #     (small-slice gathers scalarize) — ~94 ms;
    #   * the same gather over flat [.., m, cols] rows runs ~5x faster, and
    #     packing PAIRS of <= 2^13 std limbs per int32 (base 2^14) halves
    #     the gathered bytes again — ~10 ms.
    # (A variadic lax.sort carrying all columns as payload matches that
    # runtime but its 30+-operand comparator blows XLA compile time from
    # minutes to hours; the packed gather compiles like any gather.)
    batch = points.shape[:-3]
    m = points.shape[-3]
    nrows = 3 if niels else 4  # niels row 3 is identically zero
    flat = points[..., :nrows, :]
    ncols = nrows * NLIMBS
    if ncols % 2:
        flat = jnp.concatenate(
            [
                flat.reshape(*batch, m, ncols),
                jnp.zeros((*batch, m, 1), dtype=jnp.int32),
            ],
            axis=-1,
        )
        ncols += 1
    else:
        flat = flat.reshape(*batch, m, ncols)
    packed = flat[..., 0::2] + (flat[..., 1::2] << 14)  # [.., m, ncols//2]
    order = jnp.argsort(-digits, axis=-1)
    d_sorted = jnp.take_along_axis(digits, order, axis=-1)
    packed_sorted = jnp.take_along_axis(packed, order[..., None], axis=-2)
    lo = packed_sorted & 0x3FFF
    hi = packed_sorted >> 14
    unpacked = jnp.stack([lo, hi], axis=-1).reshape(*batch, m, ncols)
    pts_sorted = unpacked[..., : nrows * NLIMBS].reshape(
        *batch, m, nrows, NLIMBS
    )
    if niels:
        pts_sorted = jnp.concatenate(
            [pts_sorted, jnp.zeros((*batch, m, 1, NLIMBS), dtype=jnp.int32)],
            axis=-2,
        )

    # histogram of digits -> count_ge[k] = #items with digit >= k
    hist = _batched_hist(d_sorted, d_max)  # [..., d_max]
    suffix_counts = jnp.cumsum(hist[..., ::-1], axis=-1)[..., ::-1]
    pos = suffix_counts - 1  # last sorted index with digit >= k (desc order)

    from . import fused

    # plane-native scan (one relayout in/out instead of three per step):
    # measured neutral-to-slower vs the row scan at bench shapes (the row
    # scan's per-step relayouts overlap well); kept behind a flag for
    # further tuning.
    import os as _os

    if fused.enabled() and _os.environ.get("BLINDBID_PLANE_SCAN") == "1":
        within_f, offsets, R = _bucket_scan_planes(pts_sorted, niels)
    else:
        within_f, offsets, R = _bucket_scan_rows(pts_sorted, niels)

    # suf_k = scan[pos_k] for k >= 1, identity when no item has digit >= k
    pos_k = pos[..., 1:]
    valid = pos_k >= 0
    safe_pos = jnp.maximum(pos_k, 0)
    vals = jnp.take_along_axis(within_f, safe_pos[..., None, None], axis=-3)
    offs = jnp.take_along_axis(
        offsets, (safe_pos // R)[..., None, None], axis=-3
    )
    suf = edwards.add(vals, offs)
    suf = edwards.select(valid, suf, edwards.identity())

    # tree-reduce: total = sum_{k>=1} suf_k
    return _tree_sum_points(suf)


def _bucket_scan_rows(pts_sorted: jnp.ndarray, niels: bool):
    """Within-block inclusive scans + exclusive block offsets, row layout.

    Returns (within_f [..., C*R, 4, NL] flattened back to item order:
    within_f[p] = sum of items (p//R)*R .. p, offsets [..., C, 4, NL], R).
    """
    xs, C = _blocked(pts_sorted, niels=niels)  # [R, ..., C, 4, NL]
    acc0 = edwards.identity(xs.shape[1:-2]) + xs[0] * 0
    leaf_add = edwards.add_niels if niels else edwards.add

    def step(acc, xt):
        acc = leaf_add(acc, xt)
        return acc, acc

    totals, within = jax.lax.scan(step, acc0, xs)
    offsets = _shift_down(
        _inclusive_scan_points(totals), 1, edwards.identity()
    )  # [..., C, 4, NL] exclusive block prefix (extended points)

    within_f = jnp.moveaxis(within, 0, -3)  # [..., C, R, 4, NL]
    within_f = within_f.reshape(*within_f.shape[:-4], C * _BLOCK_R, 4, NLIMBS)
    return within_f, offsets, _BLOCK_R


def _bucket_scan_planes(pts_sorted: jnp.ndarray, niels: bool):
    """Plane-layout within-block scan: the whole R-step accumulation runs on
    [.., 4, NLIMBS, C] planes through the fused kernels — one relayout into
    plane form and one back, instead of three relayouts per scan step.

    C is chosen as a multiple of the kernel lane tile (so no per-step pad
    copies) near m/R; the tail pads with identity items.
    """
    from . import fused

    batch = pts_sorted.shape[:-3]
    m = pts_sorted.shape[-3]
    Cp = 2048 if m > 60000 else (1024 if m > 20000 else 512)
    R = -(-m // Cp)
    m_pad = R * Cp
    if m_pad != m:
        pts_sorted = _pad_items(pts_sorted, m_pad - m, niels=niels)

    planes = jnp.moveaxis(pts_sorted, -3, -1)  # [.., 4, NL, m_pad]
    xs_t = jnp.moveaxis(
        planes.reshape(*batch, 4, NLIMBS, Cp, R), -1, 0
    )  # [R, .., 4, NL, Cp]; item p = c*R + r
    ident = np.zeros((*([1] * len(batch)), 4, NLIMBS, Cp), dtype=np.int32)
    ident[..., 1, 0, :] = 1
    ident[..., 2, 0, :] = 1
    acc0 = jnp.broadcast_to(jnp.asarray(ident), (*batch, 4, NLIMBS, Cp))
    add_op = fused.madd_planes if niels else fused.add_planes

    def step(acc, xt):
        acc = add_op(acc, xt)
        return acc, acc

    totals_t, within_t = jax.lax.scan(step, acc0, xs_t)

    # block offsets: recursion over C block totals in row layout (the adds
    # route through the fused kernels via edwards.add at these widths)
    totals_rows = jnp.moveaxis(totals_t, -1, -3)  # [.., Cp, 4, NL]
    offsets = _shift_down(
        _inclusive_scan_points(totals_rows), 1, edwards.identity()
    )

    # within, back to item order rows: [R, .., 4, NL, Cp] -> [.., Cp, R, 4, NL]
    a = jnp.moveaxis(within_t, 0, -1)  # [.., 4, NL, Cp, R]
    a = jnp.moveaxis(a, (-2, -1), (-4, -3))  # [.., Cp, R, 4, NL]
    within_f = a.reshape(*batch, Cp * R, 4, NLIMBS)
    return within_f, offsets, R


def _batched_hist(d_sorted: jnp.ndarray, d_max: int = D_BUCKETS) -> jnp.ndarray:
    """Histogram over the last axis for arbitrary leading batch dims."""
    flat = d_sorted.reshape(-1, d_sorted.shape[-1])

    def one(row):
        return jnp.zeros((d_max,), dtype=jnp.int32).at[row].add(1)

    hist = jax.vmap(one)(flat)
    return hist.reshape(*d_sorted.shape[:-1], d_max)


def msm(points: jnp.ndarray, scalars: jnp.ndarray) -> jnp.ndarray:
    """General MSM: sum_i scalars[i] * points[i].

    points: [..., n, 4, NLIMBS]; scalars: [..., n, NLIMBS] working form.
    Pre-scales windows on the fly (13*(WINDOWS-1) batched doubles), then runs
    the flat bucket accumulation over m = n * WINDOWS items.
    """
    digits = limb.canon(FL, scalars)  # [..., n, NLIMBS]; limbs ARE digits
    prescaled = prescale_windows_batched(points)  # [..., n, W, 4, NL]
    return msm_prescaled(prescaled, digits)


def prescale_windows_batched(points: jnp.ndarray) -> jnp.ndarray:
    batch = points.shape[:-3]
    flat = points.reshape(-1, 4, NLIMBS)
    table = prescale_windows(flat)
    return table.reshape(*batch, points.shape[-3], WINDOWS, 4, NLIMBS)


def msm_prescaled(
    table: jnp.ndarray,
    digits: jnp.ndarray,
    niels: bool = False,
    d_max: int = D_BUCKETS,
) -> jnp.ndarray:
    """MSM against a pre-scaled window table.

    table: [..., n, WINDOWS, 4, NLIMBS] (fixed bases: built once, device
    resident; affine-Niels rows when niels=True); digits: [..., n, WINDOWS]
    window digits < d_max (canonical limbs, or `limb.digits20` lazy form
    with the matching bound).
    """
    batch = table.shape[:-4]
    n = table.shape[-4]
    if digits.shape[-1] != WINDOWS:  # canonical limbs: drop the zero slack
        digits = digits[..., :WINDOWS]
    flat_pts = table.reshape(*batch, n * WINDOWS, 4, NLIMBS)
    flat_digits = digits.reshape(*batch, n * WINDOWS).astype(jnp.int32)
    return bucket_msm(flat_pts, flat_digits, niels=niels, d_max=d_max)


# ---------------------------------------------------------------------------
# Fixed-base generator tables (built on device once per capacity, cached)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=4)
def pedersen_tables(gens_capacity: int):
    """Device-resident pre-scaled tables for (G_vec ++ H_vec ++ B ++ B_blinding).

    Returns (table, layout) where table is [n_total, WINDOWS, 4, NLIMBS] and
    layout maps names to index ranges: G: [0, cap), H: [cap, 2cap),
    B: 2cap, B_blinding: 2cap+1.
    """
    from ..utils.generators import PedersenGens, cached_bp_gens

    # Must never run inside a jit trace: the lru_cache would capture a tracer
    # (callers warm this cache from host code, e.g. Prover/Verifier __init__).
    from jax._src import core as _core

    assert _core.trace_state_clean(), (
        "pedersen_tables(cap=%d) first called inside a jit trace; warm the "
        "cache from host code first" % gens_capacity
    )
    bp = cached_bp_gens(gens_capacity)
    pc = PedersenGens.default()
    pts = bp.G_vec[0] + bp.H_vec[0] + [pc.B, pc.B_blinding]
    dev_pts = edwards.from_host(pts)
    table = np.asarray(jax.jit(prescale_windows)(dev_pts))
    layout = {
        "G": (0, gens_capacity),
        "H": (gens_capacity, 2 * gens_capacity),
        "B": 2 * gens_capacity,
        "B_blinding": 2 * gens_capacity + 1,
    }
    return table, layout


@functools.lru_cache(maxsize=4)
def pedersen_tables_niels(gens_capacity: int):
    """Affine-Niels form of pedersen_tables (rows y-x, y+x, 2d*xy, 0):
    pre-normalized so the bucket-MSM scan uses 7M mixed adds.  Same layout."""
    from jax._src import core as _core

    assert _core.trace_state_clean(), (
        "pedersen_tables_niels(cap=%d) first called inside a jit trace; "
        "warm the cache from host code first" % gens_capacity
    )
    table, layout = pedersen_tables(gens_capacity)
    flat = jnp.asarray(table.reshape(-1, 4, NLIMBS))
    niels = np.asarray(jax.jit(edwards.to_niels)(flat))
    return niels.reshape(table.shape), layout
