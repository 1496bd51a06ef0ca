"""Batched Edwards point arithmetic on device (extended coordinates).

TPU-native replacement for `curve25519-dalek`'s group ops (SURVEY.md §2.2 row
2).  A point batch is one int32 array of shape [..., 4, NLIMBS] holding
(X, Y, Z, T) in extended coordinates over F_p as 13-bit limbs — a flat layout
so MSM gathers/sorts/selects move whole points as contiguous rows.

Formulas (same as dalek's, chosen for completeness on a = -1 with d
non-square, so the *unified* add is safe for P+P / identity / mixed inputs —
required by the data-dependent combines inside the MSM scan):
  * add:    add-2008-hwcd-3 (9M)
  * double: dbl-2008-hwcd (4M + 4S)

Everything here is shape-static jnp tracing limb ops; callers jit whole
phases.  Tests: tests/test_edwards.py vs the host oracle.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils import curve_host as host
from . import limb
from .limb import FP, NLIMBS

# 2*d mod p as limbs, for the hwcd-3 addition
_D2_LIMBS = limb.int_to_limbs(2 * host.D % host.P)
_ONE = limb.int_to_limbs(1)


def identity(batch_shape: tuple[int, ...] = ()) -> jnp.ndarray:
    pt = np.zeros((*batch_shape, 4, NLIMBS), dtype=np.int32)
    pt[..., 1, :] = _ONE  # Y = 1
    pt[..., 2, :] = _ONE  # Z = 1
    return jnp.asarray(pt)


def from_host(points) -> jnp.ndarray:
    """host EdwardsPoint or list thereof -> [..., 4, NLIMBS] limbs."""
    if isinstance(points, host.EdwardsPoint):
        points = [points]
        squeeze = True
    else:
        squeeze = False
    arr = np.stack(
        [
            np.stack(
                [
                    limb.int_to_limbs(p.X % host.P),
                    limb.int_to_limbs(p.Y % host.P),
                    limb.int_to_limbs(p.Z % host.P),
                    limb.int_to_limbs(p.T % host.P),
                ]
            )
            for p in points
        ]
    )
    return jnp.asarray(arr[0] if squeeze else arr)


def to_host(pts) -> list[host.EdwardsPoint]:
    """[..., 4, NLIMBS] -> list of host EdwardsPoints (canonicalized)."""
    arr = np.asarray(limb.jcanon(FP, jnp.asarray(pts)))
    flat = arr.reshape(-1, 4, NLIMBS)
    out = []
    for row in flat:
        coords = [limb.limbs_to_int(c) for c in row]
        out.append(host.EdwardsPoint(*coords))
    return out


def add(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Unified extended addition (add-2008-hwcd-3, a=-1, complete).

    Large row batches on TPU route through the fused plane-layout Pallas
    kernel (ops.fused): limbs on sublanes, items on lanes, whole formula in
    VMEM — measured 35 M adds/s vs 6.6 M for the op chain on v5e."""
    from . import fused

    if fused.use_fused(p.shape, q.shape):
        return fused.add_rows(p, q)
    return add_impl(p, q)


def add_impl(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    x1, y1, z1, t1 = p[..., 0, :], p[..., 1, :], p[..., 2, :], p[..., 3, :]
    x2, y2, z2, t2 = q[..., 0, :], q[..., 1, :], q[..., 2, :], q[..., 3, :]
    d2 = limb.kconst(_D2_LIMBS)
    a = limb.mul(FP, limb.sub(FP, y1, x1), limb.sub(FP, y2, x2))
    b = limb.mul(FP, limb.add(FP, y1, x1), limb.add(FP, y2, x2))
    c = limb.mul(FP, limb.mul(FP, t1, d2), t2)
    dd = limb.mul(FP, limb.add(FP, z1, z1), z2)
    e = limb.sub(FP, b, a)
    f = limb.sub(FP, dd, c)
    g = limb.add(FP, dd, c)
    h = limb.add(FP, b, a)
    return jnp.stack(
        [
            limb.mul(FP, e, f),
            limb.mul(FP, g, h),
            limb.mul(FP, f, g),
            limb.mul(FP, e, h),
        ],
        axis=-2,
    )


def double(p: jnp.ndarray) -> jnp.ndarray:
    """dbl-2008-hwcd (a=-1); fused Pallas kernel for large TPU batches."""
    from . import fused

    if fused.use_fused(p.shape):
        return fused.double_rows(p)
    return double_impl(p)


def double_impl(p: jnp.ndarray) -> jnp.ndarray:
    x1, y1, z1 = p[..., 0, :], p[..., 1, :], p[..., 2, :]
    a = limb.sqr(FP, x1)
    b = limb.sqr(FP, y1)
    zz = limb.sqr(FP, z1)
    c = limb.add(FP, zz, zz)
    h = limb.add(FP, a, b)
    xy = limb.add(FP, x1, y1)
    e = limb.sub(FP, h, limb.sqr(FP, xy))
    g = limb.sub(FP, a, b)
    f = limb.add(FP, c, g)
    return jnp.stack(
        [
            limb.mul(FP, e, f),
            limb.mul(FP, g, h),
            limb.mul(FP, f, g),
            limb.mul(FP, e, h),
        ],
        axis=-2,
    )


def identity_niels(batch_shape: tuple[int, ...] = ()) -> jnp.ndarray:
    """Identity in affine-Niels form: (y-x, y+x, 2d*t) = (1, 1, 0)."""
    pt = np.zeros((*batch_shape, 4, NLIMBS), dtype=np.int32)
    pt[..., 0, :] = _ONE
    pt[..., 1, :] = _ONE
    return jnp.asarray(pt)


def to_niels(p: jnp.ndarray) -> jnp.ndarray:
    """Extended [..., 4, NLIMBS] -> affine-Niels rows (y-x, y+x, 2d*xy, 0).

    Normalizes Z to 1 with a batched Fermat inversion chain (one-time table
    preparation cost; the payoff is the 7M mixed add in the MSM scans —
    dalek's AffineNielsPoint precomputation, SURVEY.md §2.2 row 2).
    """
    from . import ristretto

    zinv = ristretto.invert(p[..., 2, :])
    x = limb.mul(FP, p[..., 0, :], zinv)
    y = limb.mul(FP, p[..., 1, :], zinv)
    t2d = limb.mul(FP, limb.kconst(_D2_LIMBS), limb.mul(FP, x, y))
    return jnp.stack(
        [
            limb.sub(FP, y, x),
            limb.add(FP, y, x),
            t2d,
            jnp.zeros_like(x),
        ],
        axis=-2,
    )


def add_niels(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Mixed unified add: p extended + q affine-Niels -> extended (7M).

    madd-2008-hwcd-3 (dalek's `&EdwardsPoint + &AffineNielsPoint`), complete
    for a=-1 with d non-square — same unified-safety as add_impl, two muls
    cheaper because q is pre-normalized (Z2=1) with (y±x, 2d*xy) cached."""
    from . import fused

    if fused.use_fused(p.shape, q.shape):
        return fused.add_rows(p, q, niels=True)
    x1, y1, z1, t1 = p[..., 0, :], p[..., 1, :], p[..., 2, :], p[..., 3, :]
    a2, b2, c2 = q[..., 0, :], q[..., 1, :], q[..., 2, :]
    a = limb.mul(FP, limb.sub(FP, y1, x1), a2)
    b = limb.mul(FP, limb.add(FP, y1, x1), b2)
    c = limb.mul(FP, t1, c2)
    dd = limb.add(FP, z1, z1)
    e = limb.sub(FP, b, a)
    f = limb.sub(FP, dd, c)
    g = limb.add(FP, dd, c)
    h = limb.add(FP, b, a)
    return jnp.stack(
        [
            limb.mul(FP, e, f),
            limb.mul(FP, g, h),
            limb.mul(FP, f, g),
            limb.mul(FP, e, h),
        ],
        axis=-2,
    )


def negate(p: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack(
        [
            limb.neg(FP, p[..., 0, :]),
            p[..., 1, :],
            p[..., 2, :],
            limb.neg(FP, p[..., 3, :]),
        ],
        axis=-2,
    )


def select(cond: jnp.ndarray, p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """cond ? p : q, cond shaped [...] against [..., 4, NLIMBS] points."""
    return jnp.where(cond[..., None, None], p, q)


def scalar_mul_bits(p: jnp.ndarray, bits: jnp.ndarray) -> jnp.ndarray:
    """Variable-base scalar multiplication by a 253-bit scalar given as a bit
    array [..., 253] (LSB first): fixed-schedule double-and-add — 253 unified
    adds + doubles as a lax.scan (compact graph), batched over leading axes.

    Used for dynamic-base points (verifier's proof-dependent bases); the hot
    fixed-base path uses precomputed tables in ops.msm instead.
    """
    import jax

    nbits = bits.shape[-1]
    # p * 0 term: inherit p's varying manual axes under shard_map (a pure
    # constant scan-carry init fails the carry-type check there)
    acc0 = identity(p.shape[:-2]) + p * 0
    bits_t = jnp.moveaxis(bits, -1, 0)  # [nbits, ...]

    def step(carry, bit):
        acc, base = carry
        acc = select(bit != 0, add(acc, base), acc)
        base = double(base)
        return (acc, base), None

    (acc, _), _ = jax.lax.scan(step, (acc0, p), bits_t, length=nbits)
    return acc


def scalar_limbs_to_bits(s: jnp.ndarray, nbits: int = 253) -> jnp.ndarray:
    """Canonical scalar limbs [..., NLIMBS] -> bit array [..., nbits]."""
    shifts = jnp.arange(limb.LIMB_BITS, dtype=jnp.int32)
    bits = (s[..., :, None] >> shifts) & 1  # [..., NLIMBS, 13]
    return bits.reshape(*s.shape[:-1], NLIMBS * limb.LIMB_BITS)[..., :nbits]


def on_curve(p: jnp.ndarray) -> jnp.ndarray:
    """Check -x^2 + y^2 = z^2 + d x^2 y^2 / z^2 and xy = zt (projective)."""
    x, y, z, t = p[..., 0, :], p[..., 1, :], p[..., 2, :], p[..., 3, :]
    d_l = jnp.asarray(limb.int_to_limbs(host.D))
    x2 = limb.sqr(FP, x)
    y2 = limb.sqr(FP, y)
    z2 = limb.sqr(FP, z)
    lhs = limb.mul(FP, limb.sub(FP, y2, x2), z2)
    rhs = limb.add(
        FP, limb.sqr(FP, z2), limb.mul(FP, d_l, limb.mul(FP, x2, y2))
    )
    curve_ok = limb.eq_mod(FP, lhs, rhs)
    ext_ok = limb.eq_mod(FP, limb.mul(FP, x, y), limb.mul(FP, z, t))
    return jnp.logical_and(curve_ok, ext_ok)


def eq_points(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Projective (curve-point) equality: X1 Z2 == X2 Z1 and Y1 Z2 == Y2 Z1."""
    x_ok = limb.eq_mod(
        FP,
        limb.mul(FP, p[..., 0, :], q[..., 2, :]),
        limb.mul(FP, q[..., 0, :], p[..., 2, :]),
    )
    y_ok = limb.eq_mod(
        FP,
        limb.mul(FP, p[..., 1, :], q[..., 2, :]),
        limb.mul(FP, q[..., 1, :], p[..., 2, :]),
    )
    return jnp.logical_and(x_ok, y_ok)
