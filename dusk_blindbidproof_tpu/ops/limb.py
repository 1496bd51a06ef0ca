"""Batched modular bignum arithmetic for TPU: 13-bit limbs in int32 lanes.

TPU-native replacement for `curve25519-dalek`'s field/scalar backends
(SURVEY.md §2.2 rows 1-2; the reference pins dalek 1.2.3 with 5x51-bit u64 /
AVX2 limbs, /root/reference/Cargo.toml:13).  A TPU has no fast 64-bit integer
path, so the radix is re-chosen for the int32 VPU:

    element = sum_i limb[i] * 2^(13*i),  limb[i] small nonneg,  21 limbs.

Why 13 bits: schoolbook partial products are ~26-bit and a full product
column sums 21 of them (< 2^31) — every intermediate fits an int32 lane with
no carry handling inside the inner loop.  Elements vectorize along leading
batch axes: one TPU vector register row holds 128 independent elements.

v2 engine — trace-time bound tracking.  The round-1 engine normalized every
op with ~12 carry passes plus two 21-step sequential `lax.scan`s; the scans
made every field op latency-bound, blew up compile times, and broke under
shard_map.  Here every intermediate carries static metadata: a per-limb
magnitude bound vector and an exact value upper bound (python ints).  The
reducer chooses, AT TRACE TIME, exactly the *parallel* carry passes and
residue folds a call site needs, and every intermediate is machine-checked
against int32 overflow while tracing.  No sequential scans anywhere; the only
exact carry (`canon` path) is a log-depth carry-lookahead via
`lax.associative_scan`.

Working form ("std"): 21 limbs; limbs 0..19 <= 2^13, limb 20 (slack) <= 1;
value < 2^261.  All public ops accept any nonneg array with limbs <= 2^13
(strict byte decodes qualify) and return std.  Canonical reduction to [0, M)
happens only at byte boundaries (`canon`).

One engine serves both moduli:
    * F_p, p = 2^255-19 (point coordinates) — residue folds are near-one-hot
      multiply-adds (2^260 = 608 mod p), which the bound tracker exploits
      automatically.
    * F_l, l = 2^252 + 27742317777372353535851937790883648493 (scalars).

Pure jnp over int32, Pallas-compatible.  Property tests in tests/test_limb.py
check every op against Python-int ground truth including adversarial
max-bound inputs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

LIMB_BITS = 13
NLIMBS = 21
LIMB_MASK = (1 << LIMB_BITS) - 1
PROD_LIMBS = 2 * NLIMBS - 1  # limbs of a full product before reduction

INT32_SAFE = (1 << 31) - 1
# std working form: limbs 0..19 <= STD_LO, limb 20 <= STD_TOP, value < 2^261
STD_LO = 1 << LIMB_BITS
STD_TOP = 1
# max limb magnitude for the exact carry-lookahead (carries stay in {0,1})
EXACT_MAX = 2 * LIMB_MASK


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


def _redigit_at_least(value: int, minimums, ndigits: int) -> np.ndarray:
    """Decompose `value` into base-2^13 digits with digit[j] >= minimums[j].

    Greedy from the bottom: after fixing digit j, the remaining mass is kept
    in the higher digits.  Raises if the value has insufficient mass.
    """
    digits = []
    rem = value
    for j in range(ndigits):
        d = rem & LIMB_MASK
        need = int(minimums[j]) if j < len(minimums) else 0
        while d < need:
            d += 1 << LIMB_BITS
        digits.append(d)
        rem = (rem - d) >> LIMB_BITS
        assert rem >= 0, "insufficient mass for re-digiting"
    assert rem == 0
    assert sum(d << (LIMB_BITS * j) for j, d in enumerate(digits)) == value
    assert max(digits) <= INT32_SAFE
    return np.array(digits, dtype=np.int32)


_FOLD_KMAX = 2 * NLIMBS + 6  # widest width the reducer can ever see


@dataclass(frozen=True, eq=False)  # identity hash: usable as a jit static arg
class ModContext:
    """Precomputed reduction tables for one modulus (built once, on host)."""

    modulus: int
    name: str
    # fold_rows[k] = limbs of (2^(13*(NLIMBS+k)) mod modulus): the residue of
    # the weight of "overflow limb" NLIMBS+k.   [_FOLD_KMAX, NLIMBS]
    fold_rows: np.ndarray = field(repr=False)
    fold_ints: tuple = field(repr=False)  # their integer values
    # Residue of the slack limb's weight, 2^260 mod modulus.   [NLIMBS]
    top_row: np.ndarray = field(repr=False)
    top_int: int = 0
    # Canonicalization split: value = lo + hi * 2^split_bit with hi < hi_max.
    #   canon_neg False: value ≡ lo + hi * R          (p: R = 19)
    #   canon_neg True:  value ≡ lo - hi * D, computed borrow-free as
    #                    lo + (A - hi * D) where A = k*M redigited so every
    #                    digit dominates hi_max * D's digits (l: D = l - 2^252)
    split_bit: int = 0
    hi_max: int = 0
    canon_neg: bool = False
    canon_row: np.ndarray = field(repr=False, default=None)  # [NLIMBS] R or D
    canon_adjust: np.ndarray = field(repr=False, default=None)  # [NLIMBS]
    canon_adjust_int: int = 0
    canon_vmax: int = 0  # value bound right after the split-fold
    mod_limbs: np.ndarray = field(repr=False, default=None)  # [NLIMBS]
    # Digits of (2^(13*(NLIMBS+1)) - modulus): x + comp carries into bit
    # 13*(NLIMBS+1) iff x >= modulus.   [NLIMBS + 1]
    cond_sub_comp: np.ndarray = field(repr=False, default=None)
    cond_sub_int: int = 0

    @staticmethod
    def create(modulus: int, name: str, split_bit: int) -> "ModContext":
        fold_ints = tuple(
            pow(2, LIMB_BITS * (NLIMBS + k), modulus) for k in range(_FOLD_KMAX)
        )
        fold_rows = np.stack([int_to_limbs(r) for r in fold_ints])
        top_int = pow(2, 13 * (NLIMBS - 1), modulus)  # 2^260 mod M
        top_row = int_to_limbs(top_int)

        # canonicalization tables: inputs are strict with value < 2^261
        hi_max = 1 << (13 * NLIMBS - 13 + 1 - split_bit)  # value>>split < hi_max
        rpos = pow(2, split_bit, modulus)
        rneg = modulus - rpos
        if rpos <= rneg:
            canon_neg = False
            row = int_to_limbs(rpos)
            adjust = np.zeros(NLIMBS, dtype=np.int32)
            adjust_int = 0
            canon_vmax = (1 << split_bit) + (hi_max - 1) * rpos
        else:
            canon_neg = True
            row = int_to_limbs(rneg)
            mins = [int(v) * (hi_max - 1) for v in row]
            assert max(mins) <= INT32_SAFE
            need = sum(mn << (LIMB_BITS * j) for j, mn in enumerate(mins))
            k = need // modulus + 1
            adjust = _redigit_at_least(k * modulus, mins, NLIMBS)
            adjust_int = k * modulus
            canon_vmax = (1 << split_bit) + adjust_int

        comp = (1 << (LIMB_BITS * (NLIMBS + 1))) - modulus
        cond_sub_comp = int_to_limbs(comp, NLIMBS + 1)
        return ModContext(
            modulus=modulus,
            name=name,
            fold_rows=fold_rows,
            fold_ints=fold_ints,
            top_row=top_row,
            top_int=top_int,
            split_bit=split_bit,
            hi_max=hi_max,
            canon_neg=canon_neg,
            canon_row=row,
            canon_adjust=adjust,
            canon_adjust_int=adjust_int,
            canon_vmax=canon_vmax,
            mod_limbs=int_to_limbs(modulus),
            cond_sub_comp=cond_sub_comp,
            cond_sub_int=comp,
        )


# ---------------------------------------------------------------------------
# Constant routing for Pallas kernels.
#
# Limb ops embed small host constant tables (fold rows, redigit vectors,
# curve constants).  Outside a kernel these become ordinary jnp constants;
# inside a Pallas kernel captured constants are disallowed, so ops.fused
# installs a resolver that records each table during a dry trace and serves
# it from a packed VMEM ref inside the kernel.  All limb/edwards code must
# materialize host constants through `kconst`, never jnp.asarray directly.
# ---------------------------------------------------------------------------

_KCONST_RESOLVER = None


def kconst(arr) -> jnp.ndarray:
    a = np.ascontiguousarray(np.asarray(arr, dtype=np.int32))
    if _KCONST_RESOLVER is None:
        return jnp.asarray(a)
    return _KCONST_RESOLVER(a)


def set_kconst_resolver(fn) -> None:
    global _KCONST_RESOLVER
    _KCONST_RESOLVER = fn


# ---------------------------------------------------------------------------
# Transposed ("T") mode.
#
# The natural [..., NLIMBS] layout puts the 21-limb axis on the TPU lane
# dimension: every (8, 128) vector tile carries 21 useful lanes (16%), and
# the add/mul op chains are HBM-bound on padded intermediates.  In T-mode
# every array carries a trailing ITEM axis — [..., w, T] — so limbs sit on
# sublanes and thousands of independent elements fill the lanes.  The fused
# Pallas kernels (ops.fused) trace the very same engine code under
# `t_mode()`; array-structure helpers below dispatch on the flag, the
# bound-tracking logic is layout-blind.
# ---------------------------------------------------------------------------

_T_MODE = False


class t_mode:
    def __enter__(self):
        global _T_MODE
        self._prev = _T_MODE
        _T_MODE = True

    def __exit__(self, *exc):
        global _T_MODE
        _T_MODE = self._prev
        return False


def _limb_width(x: jnp.ndarray) -> int:
    return x.shape[-2] if _T_MODE else x.shape[-1]


def _pad_limb(x: jnp.ndarray, lo: int, hi: int) -> jnp.ndarray:
    cfg = [(0, 0)] * x.ndim
    cfg[x.ndim - 2 if _T_MODE else x.ndim - 1] = (lo, hi)
    return jnp.pad(x, cfg)


def _limb_slice(x: jnp.ndarray, i, j) -> jnp.ndarray:
    """x[..., i:j] on the limb axis."""
    if _T_MODE:
        return x[..., i:j, :]
    return x[..., i:j]


def _limb_iota(shape, ndim_of) -> jnp.ndarray:
    dim = ndim_of - 2 if _T_MODE else ndim_of - 1
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _krow(row: np.ndarray) -> jnp.ndarray:
    """Host [w] constant row, broadcastable against working arrays."""
    r = kconst(row)
    if _T_MODE and r.ndim == 1:
        return r[:, None]
    return r


P = 2**255 - 19
L = 2**252 + 27742317777372353535851937790883648493

FP = ModContext.create(P, "fp", split_bit=255)
FL = ModContext.create(L, "fl", split_bit=252)


# ---------------------------------------------------------------------------
# Bound-tracked limb vectors.
#
# An `LB` pairs an int32 limb array with static python-int metadata: a tuple
# of per-limb magnitude upper bounds and an exact value upper bound.  All
# structural decisions (how many carry passes, when to fold) are made from
# this metadata AT TRACE TIME, so each call site compiles to exactly the
# stages it needs and every intermediate is PROVEN < 2^31.
# ---------------------------------------------------------------------------


class LB(NamedTuple):
    x: jnp.ndarray  # [..., w] int32, 0 <= limb[j] <= b[j]
    b: tuple  # static per-limb bounds (python ints)
    v: int  # static exact value upper bound (python int)

    @property
    def width(self) -> int:
        return len(self.b)

    # NOTE: b/v metadata is layout-blind; x is [..., w] or [..., w, T]


def _implied(b) -> int:
    return sum(int(bj) << (LIMB_BITS * j) for j, bj in enumerate(b))


def wrap(x: jnp.ndarray, bound=None, v=None) -> LB:
    """Wrap a raw array.  Default bound 2^13 per limb (covers both strict
    decodes and std-form op outputs)."""
    w = _limb_width(x)
    if bound is None:
        b = (1 << LIMB_BITS,) * w
    elif np.isscalar(bound):
        b = (int(bound),) * w
    else:
        b = tuple(int(t) for t in np.asarray(bound).reshape(-1))
    assert len(b) == w, (len(b), w)
    assert max(b) <= INT32_SAFE
    if w < NLIMBS:
        x = _pad_limbs(x, NLIMBS - w)
        b = b + (0,) * (NLIMBS - w)
    vi = _implied(b)
    return LB(x, b, min(vi, v) if v is not None else vi)


def _pad_limbs(x: jnp.ndarray, k: int) -> jnp.ndarray:
    return _pad_limb(x, 0, k)


def _refine(a: LB) -> LB:
    """Tighten per-limb bounds by the value bound and drop zero-bound tops."""
    v = min(a.v, _implied(a.b))
    b = tuple(min(int(bj), v >> (LIMB_BITS * j)) for j, bj in enumerate(a.b))
    x = a.x
    while len(b) > NLIMBS and b[-1] == 0:
        b = b[:-1]
        x = _limb_slice(x, 0, len(b))
    return LB(x, b, v)


def lb_raw_add(a: LB, c: LB) -> LB:
    """Plain limb-wise sum (no reduction), trace-time overflow check."""
    wa, wc = a.width, c.width
    if wa < wc:
        a = LB(_pad_limbs(a.x, wc - wa), a.b + (0,) * (wc - wa), a.v)
    elif wc < wa:
        c = LB(_pad_limbs(c.x, wa - wc), c.b + (0,) * (wa - wc), c.v)
    nb = tuple(x + y for x, y in zip(a.b, c.b))
    assert max(nb) <= INT32_SAFE, "limb add would overflow int32"
    return LB(a.x + c.x, nb, a.v + c.v)


def lb_carry_pass(a: LB) -> LB:
    """One parallel carry pass: out_j = (x_j & mask) + (x_{j-1} >> 13).

    The top limb is split (appending a new limb) only when the value bound
    allows a carry past the current width; otherwise it is kept whole so no
    mass is lost.  Value-invariant.
    """
    w = a.width
    c = a.x >> LIMB_BITS
    lo = a.x & LIMB_MASK
    cb = [bj >> LIMB_BITS for bj in a.b]
    lob = [min(bj, LIMB_MASK) for bj in a.b]
    top_escape = min(cb[-1], a.v >> (LIMB_BITS * w))
    c_in = _limb_slice(_pad_limb(c, 1, 0), 0, w)
    # NOTE: widened/edited outputs are built from pads and limb-iota masks,
    # never lane-axis concatenates — Mosaic (the Pallas TPU compiler) cannot
    # lower offset-mismatched lane concats, and this code also runs inside
    # the fused kernels (ops.fused)
    if top_escape > 0:
        out = _pad_limb(lo + c_in, 0, 1) + _pad_limb(
            _limb_slice(c, w - 1, w), w, 0
        )
        nb = [lob[j] + (cb[j - 1] if j else 0) for j in range(w)]
        nb.append(cb[-1])
    elif cb[-1] > 0:
        # carry out of the top limb is impossible by value: keep it unsplit
        lane = _limb_iota(a.x.shape, a.x.ndim)
        out = jnp.where(lane < w - 1, lo, a.x) + c_in
        nb = [lob[j] + (cb[j - 1] if j else 0) for j in range(w - 1)]
        nb.append(a.b[-1] + (cb[-2] if w > 1 else 0))
    else:
        out = lo + c_in
        nb = [lob[j] + (cb[j - 1] if j else 0) for j in range(w)]
    return LB(out, tuple(nb), a.v)


def lb_carry_multi(a: LB) -> LB:
    """Multi-split carry: decompose every limb into its base-2^13 digits and
    re-add them shifted.  One pass takes any int32-safe bound down to
    ~depth*2^13, replacing chains of single carry passes (each single pass
    only advances carries one limb, so a 2^30 bound needed ~8 of them).
    Value-invariant; width grows by depth-1 (folds contract it after)."""
    maxb = max(int(bj) for bj in a.b)
    depth = max(2, -(-maxb.bit_length() // LIMB_BITS))
    w = a.width
    out = None
    nb = [0] * (w + depth - 1)
    for d in range(depth):
        p = a.x >> (LIMB_BITS * d)
        if d < depth - 1:
            p = p & LIMB_MASK
        pad = _pad_limb(p, d, depth - 1 - d)
        out = pad if out is None else out + pad
        for j in range(w):
            bd = int(a.b[j]) >> (LIMB_BITS * d)
            if d < depth - 1:
                bd = min(bd, LIMB_MASK)
            nb[j + d] += bd
    assert max(nb) <= INT32_SAFE
    return LB(out, tuple(nb), a.v)


def _fold_contrib(ctx: ModContext, b) -> tuple:
    """Per-limb bound after folding limbs >= NLIMBS (python ints)."""
    k = len(b) - NLIMBS
    out = list(b[:NLIMBS])
    for i in range(k):
        row = ctx.fold_rows[i]
        for j in range(NLIMBS):
            out[j] += int(b[NLIMBS + i]) * int(row[j])
    return tuple(out)


def lb_fold(ctx: ModContext, a: LB) -> LB:
    """Fold limbs >= NLIMBS back via residue rows (value preserved mod M)."""
    k = a.width - NLIMBS
    assert 0 < k <= _FOLD_KMAX
    nb = _fold_contrib(ctx, a.b)
    assert max(nb) <= INT32_SAFE, f"fold overflow for {ctx.name}"
    lo = _limb_slice(a.x, 0, NLIMBS)
    hi = _limb_slice(a.x, NLIMBS, a.width)
    # explicit int32 multiply-add (k is tiny) rather than a dot_general: an
    # integer dot may be lowered through the f32 MXU on TPU, which silently
    # truncates products past 24 bits — exactness is non-negotiable here
    if _T_MODE:
        folded = None
        for i in range(k):
            term = _limb_slice(hi, i, i + 1) * _krow(ctx.fold_rows[i])
            folded = term if folded is None else folded + term
    else:
        rows = kconst(ctx.fold_rows[:k])  # [k, NLIMBS]
        folded = jnp.sum(hi[..., :, None] * rows, axis=-2, dtype=jnp.int32)
    nv = _implied(a.b[:NLIMBS]) + sum(
        min(int(a.b[NLIMBS + i]), a.v >> (LIMB_BITS * (NLIMBS + i)))
        * ctx.fold_ints[i]
        for i in range(k)
    )
    return LB(lo + folded, nb, min(nv, _implied(nb)))


def lb_fold_top(ctx: ModContext, a: LB) -> LB:
    """Fold the slack limb (index 20) via 2^260 mod M (value kept mod M)."""
    assert a.width == NLIMBS
    t = _limb_slice(a.x, NLIMBS - 1, NLIMBS)
    bt = int(a.b[NLIMBS - 1])
    nb = list(a.b[: NLIMBS - 1]) + [0]
    for j in range(NLIMBS):
        nb[j] += bt * int(ctx.top_row[j])
    assert max(nb) <= INT32_SAFE, f"fold_top overflow for {ctx.name}"
    lane = _limb_iota(a.x.shape, a.x.ndim)
    base = jnp.where(lane < NLIMBS - 1, a.x, 0)  # lane-concat-free (Mosaic)
    out = base + t * _krow(ctx.top_row)
    nv = _implied(a.b[: NLIMBS - 1]) + (
        min(bt, a.v >> (LIMB_BITS * (NLIMBS - 1))) * ctx.top_int
    )
    return LB(out, tuple(nb), min(nv, _implied(nb)))


def reduce_std(ctx: ModContext, a: LB) -> LB:
    """Reduce to std form (21 limbs: <= 2^13, slack limb <= 1, value < 2^261),
    preserving value mod M.  Structure chosen from static bounds; guaranteed
    int32-safe; terminates (folds contract the value geometrically)."""
    for _ in range(200):
        a = _refine(a)
        w = a.width
        if (
            w == NLIMBS
            and max(a.b[: NLIMBS - 1]) <= STD_LO
            and a.b[NLIMBS - 1] <= STD_TOP
        ):
            return a
        if w > NLIMBS:
            if max(_fold_contrib(ctx, a.b)) <= INT32_SAFE:
                a = lb_fold(ctx, a)
            else:
                a = _carry_stage(a)
            continue
        # Fold the slack limb FIRST: it carries the 2^260-scale mass that
        # keeps the value bound (and hence the refine cap on itself) large;
        # carrying first can cycle via escape->fold(row 0) re-injection.
        bt = a.b[NLIMBS - 1]
        if (
            bt > STD_TOP
            and bt * int(ctx.top_row.max()) + max(a.b[: NLIMBS - 1])
            <= INT32_SAFE
        ):
            a = lb_fold_top(ctx, a)
        else:
            a = _carry_stage(a)
    raise AssertionError(f"reduce_std did not converge: bounds {a.b}")


def _carry_stage(a: LB) -> LB:
    """Pick the carry form from the static bound: multi-split when a single
    pass would need >=2 successors, else the cheap single pass."""
    if max(int(bj) for bj in a.b) >= (1 << (2 * LIMB_BITS)):
        return lb_carry_multi(a)
    return lb_carry_pass(a)


def lb_mul(ctx: ModContext, a: LB, c: LB) -> LB:
    """Schoolbook product: 21 shifted broadcast multiply-adds (tree-summed),
    then bound-driven reduction.

    The shifts are static pads, deliberately: an anti-diagonal gather
    (take_along_axis on the minor axis) is ~40x slower on TPU — minor-dim
    gathers scalarize (measured 1.38 s vs 36 ms per 82k-row mul on v5e).
    441 int32 MACs/element, all lane-parallel on the VPU."""
    a = reduce_std(ctx, a)
    c = reduce_std(ctx, c)
    colb = np.convolve(
        np.array(a.b, dtype=object), np.array(c.b, dtype=object)
    )
    assert max(int(t) for t in colb) <= INT32_SAFE
    terms = []
    for i in range(NLIMBS):
        t = _limb_slice(a.x, i, i + 1) * c.x  # [..., NLIMBS] broadcast
        terms.append(_pad_limb(t, i, NLIMBS - 1 - i))
    # balanced tree sum keeps the graph log-depth
    while len(terms) > 1:
        terms = [
            terms[i] + terms[i + 1] if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
    z = LB(terms[0], tuple(int(t) for t in colb), a.v * c.v)
    return reduce_std(ctx, z)


def lb_sub(ctx: ModContext, a: LB, c: LB) -> LB:
    """a - c mod M, borrow-free: a + (S - c) with S = k*M redigited so every
    digit dominates c's bound."""
    c = reduce_std(ctx, c)
    need = _implied(c.b)
    k = need // ctx.modulus + 1
    digits = _redigit_at_least(k * ctx.modulus, c.b, NLIMBS)
    dneg = LB(
        _krow(digits) - c.x,
        tuple(int(d) for d in digits),
        k * ctx.modulus,
    )
    return lb_raw_add(a, dneg)


# ---------------------------------------------------------------------------
# Public working-form ops (raw arrays; outputs in std form)
# ---------------------------------------------------------------------------


def add(ctx: ModContext, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return reduce_std(ctx, lb_raw_add(wrap(a), wrap(b))).x


def add_many(ctx: ModContext, terms: jnp.ndarray, axis: int = -2) -> jnp.ndarray:
    """Sum up to ~260k std elements along `axis` in one int32 reduction."""
    n = terms.shape[axis]
    assert n * (1 << LIMB_BITS) <= INT32_SAFE, "too many terms for one int32 sum"
    s = jnp.sum(terms, axis=axis)
    return reduce_std(ctx, wrap(s, bound=n * (1 << LIMB_BITS))).x


def sub(ctx: ModContext, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return reduce_std(ctx, lb_sub(ctx, wrap(a), wrap(b))).x


def neg(ctx: ModContext, b: jnp.ndarray) -> jnp.ndarray:
    return sub(ctx, jnp.zeros_like(b), b)


def mul(ctx: ModContext, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    # big row batches route through the fused plane-layout Pallas kernel
    # (ops.fused.mul_rows, bit-exact: it traces THIS function in t_mode);
    # never from inside a kernel trace (_T_MODE) — no nested pallas_call
    if not _T_MODE:
        from . import fused

        if (
            fused.enabled()
            and a.shape[-1] == NLIMBS
            and b.shape[-1] == NLIMBS
        ):
            shape = jnp.broadcast_shapes(a.shape, b.shape)
            rows = int(np.prod(shape[:-1], dtype=np.int64))
            if rows >= fused.MIN_ROWS:
                return fused.mul_rows(ctx, a, b)
    return lb_mul(ctx, wrap(a), wrap(b)).x


def sqr(ctx: ModContext, a: jnp.ndarray) -> jnp.ndarray:
    return mul(ctx, a, a)


def mul_small(ctx: ModContext, a: jnp.ndarray, k: int) -> jnp.ndarray:
    assert 0 <= k <= LIMB_MASK
    aw = wrap(a)
    return reduce_std(
        ctx, LB(aw.x * jnp.int32(k), tuple(t * k for t in aw.b), aw.v * k)
    ).x


def normalize(ctx: ModContext, x: jnp.ndarray, bound: int = INT32_SAFE) -> jnp.ndarray:
    """Reduce nonneg limbs (each <= `bound`, any width) to std form."""
    return reduce_std(ctx, wrap(x, bound=bound)).x


def select(cond: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """cond ? a : b with cond shaped [...] against [..., NLIMBS] operands."""
    return jnp.where(cond[..., None], a, b)


# ---------------------------------------------------------------------------
# Exact strict form and canonical reduction
# ---------------------------------------------------------------------------


def _exact_carry(a: LB) -> LB:
    """Limbs (each <= 2*2^13-2) -> strict limbs < 2^13 via carry-lookahead
    over (generate, propagate) pairs with lax.associative_scan; appends a top
    limb only when both the limb bounds and the value bound allow a carry
    out.  ~log2(width) parallel steps, no sequential scan."""
    assert not _T_MODE, "canon/exact paths are host-boundary only (no T-mode)"
    assert max(a.b) <= EXACT_MAX, a.b
    g = (a.x >> LIMB_BITS).astype(jnp.int32)  # in {0, 1}
    r = a.x & LIMB_MASK
    p = (r == LIMB_MASK).astype(jnp.int32)

    def combine(lo, hi):
        gl, pl = lo
        gh, ph = hi
        return gh | (ph & gl), ph & pl

    G, _ = jax.lax.associative_scan(combine, (g, p), axis=-1)
    cin = jnp.pad(G, [(0, 0)] * (a.x.ndim - 1) + [(1, 0)])[..., :-1]
    out = (r + cin) & LIMB_MASK
    w = a.width
    nb = [min(int(bj), LIMB_MASK) for bj in a.b]
    can_escape = (a.b[-1] + 1) >> LIMB_BITS > 0 or a.b[-1] == LIMB_MASK
    if can_escape and (a.v >> (LIMB_BITS * w)) > 0:
        out = jnp.concatenate([out, G[..., -1:]], axis=-1)
        nb.append(1)
    return LB(out, tuple(nb), a.v)


def _to_strict(ctx: ModContext, a: LB) -> LB:
    """Any bounds -> width-NLIMBS strict limbs (< 2^13), value mod M kept."""
    a = reduce_std(ctx, a)
    a = _exact_carry(a)  # std bounds <= 2^13 <= EXACT_MAX; no escape (v<2^261)
    assert a.width == NLIMBS
    return a


def _cond_sub_modulus(ctx: ModContext, a: LB) -> LB:
    """One step of x >= M ? x - M : x on strict limbs (all parallel).

    x + (2^(13*22) - M) has the 2^(13*22) bit set iff x >= M; the low limbs
    of that sum are then exactly x - M."""
    assert a.width == NLIMBS and max(a.b) <= LIMB_MASK
    comp = ctx.cond_sub_comp  # [NLIMBS+1] digits, each <= LIMB_MASK
    x22 = _pad_limbs(a.x, 1)
    s = LB(
        x22 + kconst(comp),
        tuple(
            int(bj) + int(comp[j]) for j, bj in enumerate(list(a.b) + [0])
        ),
        a.v + ctx.cond_sub_int,
    )
    s = _exact_carry(s)
    if s.width > NLIMBS + 1:
        ge = s.x[..., NLIMBS + 1]
    else:
        ge = jnp.zeros(s.x.shape[:-1], dtype=jnp.int32)  # can't be >= M
    out = jnp.where((ge == 1)[..., None], s.x[..., :NLIMBS], a.x)
    nv = max(ctx.modulus - 1, a.v - ctx.modulus)
    return LB(out, (LIMB_MASK,) * NLIMBS, min(nv, a.v))


def canon(ctx: ModContext, x: jnp.ndarray, bound: int = INT32_SAFE) -> jnp.ndarray:
    """Full canonical reduction to [0, M): strict limbs, width NLIMBS."""
    a = _to_strict(ctx, wrap(jnp.asarray(x), bound=min(int(bound), INT32_SAFE)))
    # split: value = lo + hi * 2^split_bit, hi < hi_max (value < 2^261)
    sb_limb, sb_off = divmod(ctx.split_bit, LIMB_BITS)
    assert sb_limb == NLIMBS - 2
    hi = (a.x[..., sb_limb] >> sb_off) + (
        a.x[..., NLIMBS - 1] << (LIMB_BITS - sb_off)
    )
    hi_b = (LIMB_MASK >> sb_off) + (
        min(int(a.b[NLIMBS - 1]), a.v >> (LIMB_BITS * (NLIMBS - 1)))
        << (LIMB_BITS - sb_off)
    )
    assert hi_b < ctx.hi_max, (hi_b, ctx.hi_max)
    lo = jnp.concatenate(
        [
            a.x[..., :sb_limb],
            a.x[..., sb_limb : sb_limb + 1] & ((1 << sb_off) - 1),
            jnp.zeros((*a.x.shape[:-1], NLIMBS - sb_limb - 1), dtype=jnp.int32),
        ],
        axis=-1,
    )
    lo_b = (LIMB_MASK,) * sb_limb + ((1 << sb_off) - 1,) + (0,) * (
        NLIMBS - sb_limb - 1
    )
    row = kconst(ctx.canon_row)
    if ctx.canon_neg:
        adj = ctx.canon_adjust.astype(np.int64)
        term = kconst(ctx.canon_adjust) - hi[..., None] * row
        tb = tuple(int(t) for t in adj)  # term in [0, adjust] per digit
        tv = ctx.canon_adjust_int
    else:
        term = hi[..., None] * row
        tb = tuple(hi_b * int(t) for t in ctx.canon_row)
        tv = hi_b * limbs_to_int(ctx.canon_row)
    y = lb_raw_add(LB(lo, lo_b, _implied(lo_b)), LB(term, tb, tv))
    y = LB(y.x, y.b, min(y.v, ctx.canon_vmax))
    y = _to_strict(ctx, y)
    for _ in range(8):
        if y.v < ctx.modulus:
            break
        y = _cond_sub_modulus(ctx, y)
    assert y.v < ctx.modulus, "canon cond-sub did not converge"
    return y.x


def digits_lazy(ctx: ModContext, x: jnp.ndarray) -> tuple[jnp.ndarray, int]:
    """Lazy bucket digits: [..., w] working-form input -> ([..., NLIMBS]
    digits, static max-digit bound).

    The bucket MSM only needs Σ digit_w·2^{13w} ≡ value (mod ctx.modulus)
    with every digit below the histogram size — NOT the canonical
    representative (table points lie in the prime-order subgroup, so any
    congruent integer scales them identically).  Std working form already
    IS that: limbs <= 2^13 with the slack limb <= 1.  So this is just
    reduce_std — a trace-time no-op for values that are already std (every
    limb-op output) — where the old path ran the full `canon` (exact
    carry-lookahead + conditional subtractions, ~10 device passes).  The
    MSM tables carry all NLIMBS windows so the slack limb is covered.
    """
    a = _refine(reduce_std(ctx, wrap(jnp.asarray(x))))
    bound = max(int(b) for b in a.b)
    return a.x, bound


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

jadd = jax.jit(add, static_argnums=0)
jsub = jax.jit(sub, static_argnums=0)
jmul = jax.jit(mul, static_argnums=0)
jsqr = jax.jit(sqr, static_argnums=0)
jneg = jax.jit(neg, static_argnums=0)
jcanon = jax.jit(canon, static_argnums=(0, 2))
jnormalize = jax.jit(normalize, static_argnums=(0, 2))
jadd_many = jax.jit(add_many, static_argnums=(0, 2))
jeq_mod = jax.jit(eq_mod, static_argnums=0)
jis_zero = jax.jit(is_zero, static_argnums=0)


# ---------------------------------------------------------------------------
# Byte / integer conversions for device IO
# ---------------------------------------------------------------------------


def limbs_from_bytes_le(data: np.ndarray) -> np.ndarray:
    """[..., 32] uint8 -> [..., NLIMBS] int32 (values < 2^256; strict limbs)."""
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
