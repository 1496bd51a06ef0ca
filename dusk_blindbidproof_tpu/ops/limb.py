"""Batched modular bignum arithmetic for TPU: 13-bit limbs in int32 lanes.

This is the TPU-native replacement for `curve25519-dalek`'s field/scalar
backends (SURVEY.md §2.2 rows 1-2; the reference pins dalek 1.2.3 with
5x51-bit u64 / AVX2 limbs, /root/reference/Cargo.toml:13).  A TPU has no
64-bit-wide fast integer path, so the radix is re-chosen for the int32 VPU:

    element = sum_i limb[i] * 2^(13*i),   limb[i] in [0, 2^13],  20 limbs.

Why 13 bits: schoolbook partial products are 26-bit and a full product column
sums at most 20 of them (< 2^31) — every intermediate fits an int32 lane with
*no* carry handling inside the inner loop.  Elements vectorize along leading
batch axes: one TPU vector register row holds 128 independent elements.

Working form ("loose"): limbs <= 2^13, value < 2^261 — NOT fully reduced.
All ops are closed over this form; canonical reduction happens only at byte
boundaries (`canon`).  This mirrors dalek's lazy-reduction discipline,
re-derived for this radix.

One engine serves both moduli:
    * F_p, p = 2^255-19 (point coordinates)
    * F_l, l = 2^252 + 27742317777372353535851937790883648493 (scalars)

Pure jnp over int32, Pallas-compatible.  Property tests in tests/test_limb.py
check every op against Python-int ground truth including adversarial
carry/fold edge cases.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

LIMB_BITS = 13
NLIMBS = 20
LIMB_MASK = (1 << LIMB_BITS) - 1
PROD_LIMBS = 2 * NLIMBS - 1  # limbs of a full product before reduction


def int_to_limbs(x: int, nlimbs: int = NLIMBS) -> np.ndarray:
    out = np.zeros(nlimbs, dtype=np.int32)
    for i in range(nlimbs):
        out[i] = x & LIMB_MASK
        x >>= LIMB_BITS
    assert x == 0, "value does not fit"
    return out


def limbs_to_int(limbs) -> int:
    limbs = np.asarray(limbs)
    return sum(int(v) << (LIMB_BITS * i) for i, v in enumerate(limbs.reshape(-1)))


def ints_to_limbs(xs, nlimbs: int = NLIMBS) -> np.ndarray:
    """Vector of python ints -> [len(xs), nlimbs] int32."""
    return np.stack([int_to_limbs(int(x), nlimbs) for x in xs])


def limbs_to_ints(arr) -> list[int]:
    arr = np.asarray(arr)
    flat = arr.reshape(-1, arr.shape[-1])
    return [
        sum(int(v) << (LIMB_BITS * i) for i, v in enumerate(row)) for row in flat
    ]


def _redigit_at_least(value: int, minimums: list[int], ndigits: int) -> np.ndarray:
    """Decompose `value` into base-2^13 digits with digit[j] >= minimums[j].

    Greedy from the bottom: after fixing digit j, the remaining mass is kept in
    the higher digits.  Raises if the value has insufficient mass.
    """
    digits = []
    rem = value
    for j in range(ndigits):
        d = rem & LIMB_MASK
        need = minimums[j] if j < len(minimums) else 0
        while d < need:
            d += 1 << LIMB_BITS
        digits.append(d)
        rem = (rem - d) >> LIMB_BITS
        assert rem >= 0, "insufficient mass for re-digiting"
    assert rem == 0
    assert sum(d << (LIMB_BITS * j) for j, d in enumerate(digits)) == value
    return np.array(digits, dtype=np.int32)


@dataclass(frozen=True, eq=False)  # identity hash: usable as a jit static arg
class ModContext:
    """Precomputed reduction tables for one modulus (built once, on host)."""

    modulus: int
    name: str
    # fold_rows[k] = limbs of (2^(13*(NLIMBS+k)) mod modulus): the residue of
    # the weight of "overflow limb" NLIMBS+k.   [NLIMBS, NLIMBS]
    fold_rows: np.ndarray = field(repr=False)
    # Digits of a multiple of the modulus (~2^262), every digit[j] >= 2^13 for
    # j < NLIMBS, for borrow-free negation.   [NLIMBS + 1]
    sub_digits: np.ndarray = field(repr=False)
    # Canonicalization: split at bit SB = floor-multiple covering the modulus;
    # hi = value >> SB (< 2^(261-SB), a single small int32).
    #   canon_neg False: value ≡ lo + hi * canon_residue   (p: residue 19)
    #   canon_neg True:  value ≡ lo - hi * canon_residue, computed borrow-free
    #                    as lo + (canon_adjust - hi * canon_residue)
    #                    (l: residue = l - 2^252 ~ 2^133, adjust = l redigited)
    split_bit: int
    canon_neg: bool
    canon_residue: np.ndarray = field(repr=False)  # [NLIMBS]
    canon_adjust: np.ndarray = field(repr=False)  # [NLIMBS]
    mod_limbs: np.ndarray = field(repr=False)  # [NLIMBS]

    @staticmethod
    def create(modulus: int, name: str, split_bit: int) -> "ModContext":
        fold_rows = np.stack(
            [
                int_to_limbs(pow(2, LIMB_BITS * (NLIMBS + k), modulus))
                for k in range(2 * NLIMBS)
            ]
        )
        # S = k*modulus in [2^261, 2^261 + modulus); digits >= 2^13 for j < 20.
        k = -(-(1 << 261) // modulus)
        sub_digits = _redigit_at_least(
            k * modulus, [1 << LIMB_BITS] * NLIMBS, NLIMBS + 1
        )

        rpos = pow(2, split_bit, modulus)
        rneg = modulus - rpos
        hi_max = 1 << (261 - split_bit)
        if rpos <= rneg:
            canon_neg = False
            residue = rpos
            adjust = np.zeros(NLIMBS, dtype=np.int32)
            assert hi_max * rpos + (1 << split_bit) < modulus * 8, (
                "positive canon residue too large"
            )
        else:
            canon_neg = True
            residue = rneg
            # adjust = modulus, re-digited so each digit dominates the
            # corresponding digit of hi*residue (hi < hi_max).
            res_limbs = int_to_limbs(rneg)
            mins = [int(v) * hi_max for v in res_limbs]
            assert max(mins) < 2**30
            adjust = _redigit_at_least(modulus, mins, NLIMBS)
            assert hi_max * rneg < modulus
        return ModContext(
            modulus=modulus,
            name=name,
            fold_rows=fold_rows,
            sub_digits=sub_digits,
            split_bit=split_bit,
            canon_neg=canon_neg,
            canon_residue=int_to_limbs(residue),
            canon_adjust=np.asarray(adjust, dtype=np.int32),
            mod_limbs=int_to_limbs(modulus),
        )


P = 2**255 - 19
L = 2**252 + 27742317777372353535851937790883648493

FP = ModContext.create(P, "fp", split_bit=255)
FL = ModContext.create(L, "fl", split_bit=252)


# ---------------------------------------------------------------------------
# Core limb ops (all shapes [..., K] int32, K >= NLIMBS)
# ---------------------------------------------------------------------------


def _carry_pass(x: jnp.ndarray) -> jnp.ndarray:
    """One vectorized carry pass; appends a top limb so no carry is dropped."""
    c = x >> LIMB_BITS
    lo = x & LIMB_MASK
    c_shifted = jnp.pad(c, [(0, 0)] * (x.ndim - 1) + [(1, 0)])[..., :-1]
    top = c[..., -1:]
    return jnp.concatenate([lo + c_shifted, top], axis=-1)


def _carry_exact(x: jnp.ndarray) -> jnp.ndarray:
    """Sequential ripple carry as one lax.scan over the limb axis: output
    limbs strictly < 2^13 (+ top limb).  A single primitive keeps traced
    graphs small (every field op uses this)."""
    import jax

    xt = jnp.moveaxis(x, -1, 0)  # [K, ...]

    def step(carry, col):
        v = col + carry
        return v >> LIMB_BITS, v & LIMB_MASK

    # carry init derived from x (not a fresh constant) so it inherits x's
    # varying manual axes under shard_map — a constant init fails scan's
    # carry-type check inside sharded regions.
    carry, lo = jax.lax.scan(step, x[..., 0] * 0, xt)
    out = jnp.moveaxis(lo, 0, -1)
    return jnp.concatenate([out, carry[..., None]], axis=-1)


def _fold_once(ctx: ModContext, x: jnp.ndarray) -> jnp.ndarray:
    """Fold limbs >= NLIMBS back via residue rows; input limbs <= 2^13.

    result value = lo + sum_k hi_k * fold_rows[k]  (same residue class);
    int32-safe: products <= 2^13 * (2^13-1), summed over <= 20 rows < 2^31.
    """
    if x.shape[-1] <= NLIMBS:
        return x
    k = x.shape[-1] - NLIMBS
    # int32 safety: lo (<=2^13) + k products of <= 2^13*(2^13-1) each
    assert k <= 30, f"fold of {k} overflow limbs would overflow int32 columns"
    lo = x[..., :NLIMBS]
    hi = x[..., NLIMBS:]
    rows = jnp.asarray(ctx.fold_rows[:k])  # [k, NLIMBS]
    folded = jax_dot_int32(hi, rows)
    return lo + folded


def normalize(ctx: ModContext, x: jnp.ndarray) -> jnp.ndarray:
    """Reduce nonnegative limbs (< 2^31 each, any length >= NLIMBS) to working
    form: NLIMBS limbs <= 2^13, value < 2^261 and ≡ input (mod M)."""
    x = x.astype(jnp.int32)
    if x.shape[-1] < NLIMBS:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, NLIMBS - x.shape[-1])])
    # Schedule derived from worst-case magnitude bounds: 4 passes bring
    # arbitrary <2^31 limbs down to <= 2^13 each; fold collapses overflow
    # limbs; after 3 rounds the value is < 2^260.2, and the exact-carry /
    # single-limb-fold tail leaves 20 strict limbs with value < 2^260.
    for _ in range(3):
        for _ in range(4):
            x = _carry_pass(x)
        x = _fold_once(ctx, x)
    x = _carry_exact(x)  # 21 limbs strict, top in {0,1}
    x = _fold_once(ctx, x)  # 20 limbs <= 2^14, value < 2^260
    x = _carry_exact(x)  # 21 limbs strict, top provably 0
    return x[..., :NLIMBS]


def add(ctx: ModContext, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return normalize(ctx, a + b)


def add_many(ctx: ModContext, terms: jnp.ndarray, axis: int = -2) -> jnp.ndarray:
    """Sum <= 2^17 working-form elements along `axis` (limb-wise int32 sum
    stays < 2^31), then normalize."""
    s = jnp.sum(terms, axis=axis)
    return normalize(ctx, s)


def sub(ctx: ModContext, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a - b mod M via borrow-free digits: a + (S - b), S ≡ 0, digits of S
    dominate any working-form limb."""
    s = jnp.asarray(ctx.sub_digits)  # [NLIMBS+1]
    neg = s[:NLIMBS] - b
    neg = jnp.concatenate(
        [neg, jnp.broadcast_to(s[NLIMBS:], (*neg.shape[:-1], 1))], axis=-1
    )
    a_ext = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, 1)])
    return normalize(ctx, a_ext + neg)


def neg(ctx: ModContext, b: jnp.ndarray) -> jnp.ndarray:
    return sub(ctx, jnp.zeros_like(b), b)


# static anti-diagonal gather matrix: column k of the product collects the
# outer-product entries (i, j) with i + j = k.  The schoolbook multiply then
# is ONE outer product + ONE integer matmul — on TPU the matmul maps onto
# the MXU, on CPU it is a single fused GEMM; either way the traced graph is
# 3 primitives instead of 20 scatter-adds.
_CONV_M = np.zeros((NLIMBS * NLIMBS, PROD_LIMBS), dtype=np.int32)
for _i in range(NLIMBS):
    for _j in range(NLIMBS):
        _CONV_M[_i * NLIMBS + _j, _i + _j] = 1


def mul(ctx: ModContext, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Schoolbook product via outer-product + anti-diagonal matmul; every
    column sum < 2^31; then fold+carry."""
    batch = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    a = jnp.broadcast_to(a, (*batch, NLIMBS))
    b = jnp.broadcast_to(b, (*batch, NLIMBS))
    outer = (a[..., :, None] * b[..., None, :]).reshape(
        *batch, NLIMBS * NLIMBS
    )
    z = jax_dot_int32(outer, jnp.asarray(_CONV_M))
    return normalize(ctx, z)


def jax_dot_int32(x: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    import jax

    return jax.lax.dot_general(
        x, m,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def sqr(ctx: ModContext, a: jnp.ndarray) -> jnp.ndarray:
    return mul(ctx, a, a)


def mul_small(ctx: ModContext, a: jnp.ndarray, k: int) -> jnp.ndarray:
    assert 0 <= k <= LIMB_MASK
    return normalize(ctx, a * jnp.int32(k))


def select(cond: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """cond ? a : b with cond shaped [...] against [..., NLIMBS] operands."""
    return jnp.where(cond[..., None], a, b)


def _cond_sub_modulus(ctx: ModContext, x: jnp.ndarray) -> jnp.ndarray:
    """One step of x >= M ? x - M : x on strictly-carried limbs (one scan)."""
    import jax

    m = jnp.asarray(ctx.mod_limbs)
    diff = jnp.moveaxis(x - m, -1, 0)  # [NLIMBS, ...]

    def step(borrow, col):
        d = col - borrow
        b = (d < 0).astype(jnp.int32)
        return b, d + (b << LIMB_BITS)

    # init derived from x: see _carry_exact on shard_map varying axes
    borrow, cols = jax.lax.scan(step, x[..., 0] * 0, diff)
    diff_prop = jnp.moveaxis(cols, 0, -1)
    return select(borrow == 0, diff_prop, x)


def canon(ctx: ModContext, x: jnp.ndarray) -> jnp.ndarray:
    """Full canonical reduction of working form to [0, M), strict limbs."""
    x = normalize(ctx, x)  # strict limbs, value < 2^260
    # split: x = lo + hi * 2^SB with hi < 2^(260-SB) held in one int32
    sb_limb, sb_off = divmod(ctx.split_bit, LIMB_BITS)
    hi = x[..., sb_limb] >> sb_off
    for j in range(sb_limb + 1, NLIMBS):
        hi = hi + (x[..., j] << (LIMB_BITS * (j - sb_limb) - sb_off))
    lo = jnp.concatenate(
        [
            x[..., :sb_limb],
            x[..., sb_limb : sb_limb + 1] & ((1 << sb_off) - 1),
            jnp.zeros((*x.shape[:-1], NLIMBS - sb_limb - 1), dtype=jnp.int32),
        ],
        axis=-1,
    )
    res = jnp.asarray(ctx.canon_residue)
    term = hi[..., None] * res  # limbs < 2^(261-SB) * 2^13 <= 2^22
    if ctx.canon_neg:
        y = lo + (jnp.asarray(ctx.canon_adjust) - term)
    else:
        y = lo + term
    y = _carry_exact(y)[..., :NLIMBS]  # value < 2^SB + M < 2^13 limbs * 20
    for _ in range(3):
        y = _cond_sub_modulus(ctx, y)
    return y


def eq_mod(ctx: ModContext, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise modular equality of two working-form values."""
    return jnp.all(canon(ctx, a) == canon(ctx, b), axis=-1)


def is_zero(ctx: ModContext, a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(canon(ctx, a) == 0, axis=-1)


# ---------------------------------------------------------------------------
# Jitted entry points.
#
# Op-by-op dispatch is pathological in this environment (each primitive is
# compiled as its own executable through a remote-compile service, seconds
# per op); every public op therefore has a jitted variant with the ModContext
# as a static argument.  Higher layers build whole jitted phase programs and
# call the raw functions inside their own traces.
# ---------------------------------------------------------------------------

import jax as _jax

jadd = _jax.jit(add, static_argnums=0)
jsub = _jax.jit(sub, static_argnums=0)
jmul = _jax.jit(mul, static_argnums=0)
jsqr = _jax.jit(sqr, static_argnums=0)
jneg = _jax.jit(neg, static_argnums=0)
jcanon = _jax.jit(canon, static_argnums=0)
jnormalize = _jax.jit(normalize, static_argnums=0)
jadd_many = _jax.jit(add_many, static_argnums=(0, 2))
jeq_mod = _jax.jit(eq_mod, static_argnums=0)
jis_zero = _jax.jit(is_zero, static_argnums=0)


# ---------------------------------------------------------------------------
# Byte / integer conversions for device IO
# ---------------------------------------------------------------------------


def limbs_from_bytes_le(data: np.ndarray) -> np.ndarray:
    """[..., 32] uint8 -> [..., NLIMBS] int32 (values < 2^256; the top limb
    carries bits 247..255)."""
    data = np.asarray(data, dtype=np.uint8)
    bits = np.unpackbits(data, axis=-1, bitorder="little")  # [..., 256]
    pad = NLIMBS * LIMB_BITS - 256
    bits = np.pad(bits, [(0, 0)] * (bits.ndim - 1) + [(0, pad)])
    bits = bits.reshape(*bits.shape[:-1], NLIMBS, LIMB_BITS)
    weights = 1 << np.arange(LIMB_BITS, dtype=np.int32)
    return (bits.astype(np.int32) * weights).sum(axis=-1, dtype=np.int32)


def ints_to_limbs_fast(vals, out_shape=None) -> np.ndarray:
    """Vectorized python-ints (< 2^256) -> limb rows via byte packing.

    ~30x faster than ints_to_limbs for large lists (used for witness upload).
    """
    buf = b"".join(int(v).to_bytes(32, "little") for v in vals)
    arr = np.frombuffer(buf, dtype=np.uint8).reshape(len(vals), 32)
    out = limbs_from_bytes_le(arr)
    if out_shape is not None:
        out = out.reshape(*out_shape, NLIMBS)
    return out


def limbs_to_bytes_le(limbs: np.ndarray) -> np.ndarray:
    """[..., NLIMBS] canonical limbs -> [..., 32] uint8 little-endian."""
    limbs = np.asarray(limbs)
    bits = ((limbs[..., None] >> np.arange(LIMB_BITS)) & 1).astype(np.uint8)
    bits = bits.reshape(*limbs.shape[:-1], NLIMBS * LIMB_BITS)[..., :256]
    return np.packbits(bits, axis=-1, bitorder="little")
