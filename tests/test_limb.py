"""Property tests: limb engine vs Python-int ground truth (SURVEY.md §7
'Bignum-on-TPU ... property tests vs python-int ground truth at every
kernel')."""

import random

import numpy as np
import jax.numpy as jnp

from dusk_blindbidproof_tpu.ops import limb
from dusk_blindbidproof_tpu.ops.limb import (
    FL,
    FP,
    L,
    LIMB_BITS,
    LIMB_MASK,
    NLIMBS,
    P,
    int_to_limbs,
    ints_to_limbs,
    jadd as add,
    jadd_many as add_many,
    jcanon as canon,
    jeq_mod as eq_mod,
    jmul as mul,
    jneg as neg,
    jnormalize as normalize,
    jsub as sub,
    limbs_from_bytes_le,
    limbs_to_bytes_le,
    limbs_to_int,
    limbs_to_ints,
)

rng = random.Random(1234)


def rand_vals(n, bits=260):
    """Random working-form values < 2^260 incl. adversarial edge patterns."""
    special = [
        0,
        1,
        P - 1,
        P,
        P + 1,
        L - 1,
        L,
        L + 1,
        2**255 - 19,
        2**255 - 20,
        (1 << 260) - 1,
        (1 << 255) - 1,
        (1 << 252) + 1,
        sum(LIMB_MASK << (LIMB_BITS * i) for i in range(NLIMBS)),  # all-max limbs
    ]
    vals = special[:n]
    while len(vals) < n:
        vals.append(rng.getrandbits(bits))
    return vals[:n]


def test_limb_int_roundtrip():
    for v in rand_vals(32):
        assert limbs_to_int(int_to_limbs(v)) == v


def test_bytes_roundtrip():
    data = np.frombuffer(
        bytes(rng.getrandbits(8) for _ in range(32 * 8)), dtype=np.uint8
    ).reshape(8, 32)
    limbs = limbs_from_bytes_le(data)
    back = limbs_to_bytes_le(limbs)
    assert (back == data).all()
    assert limbs_to_ints(limbs) == [
        int.from_bytes(row.tobytes(), "little") for row in data
    ]


def _check_op(ctx, op_name, py_op, n=64):
    M = ctx.modulus
    avals = rand_vals(n)
    bvals = list(reversed(rand_vals(n)))
    a = jnp.asarray(ints_to_limbs(avals))
    b = jnp.asarray(ints_to_limbs(bvals))
    if op_name == "mul":
        out = mul(ctx, a, b)
    elif op_name == "add":
        out = add(ctx, a, b)
    elif op_name == "sub":
        out = sub(ctx, a, b)
    got = [v % M for v in limbs_to_ints(canon(ctx, out))]
    want = [py_op(x, y) % M for x, y in zip(avals, bvals)]
    assert got == want, f"{ctx.name} {op_name} mismatch"
    # working form invariants: limbs <= 2^13, value < 2^261
    arr = np.asarray(out)
    assert arr.min() >= 0 and arr.max() <= (1 << LIMB_BITS)
    assert all(v < 1 << 261 for v in limbs_to_ints(out))


def test_mul_add_sub_fp():
    _check_op(FP, "mul", lambda x, y: x * y)
    _check_op(FP, "add", lambda x, y: x + y)
    _check_op(FP, "sub", lambda x, y: x - y)


def test_mul_add_sub_fl():
    _check_op(FL, "mul", lambda x, y: x * y)
    _check_op(FL, "add", lambda x, y: x + y)
    _check_op(FL, "sub", lambda x, y: x - y)


def test_canon_strict():
    for ctx in (FP, FL):
        vals = rand_vals(64)
        x = jnp.asarray(ints_to_limbs(vals))
        c = canon(ctx, x)
        got = limbs_to_ints(c)
        assert got == [v % ctx.modulus for v in vals], ctx.name
        arr = np.asarray(c)
        assert arr.min() >= 0 and arr.max() <= LIMB_MASK


def test_normalize_idempotent_and_congruent():
    for ctx in (FP, FL):
        vals = rand_vals(32)
        x = jnp.asarray(ints_to_limbs(vals))
        n1 = normalize(ctx, x)
        n2 = normalize(ctx, n1)
        assert [v % ctx.modulus for v in limbs_to_ints(n1)] == [
            v % ctx.modulus for v in vals
        ]
        assert (np.asarray(canon(ctx, n1)) == np.asarray(canon(ctx, n2))).all()


def test_normalize_wide_product_input():
    """Feed raw 39-limb schoolbook columns (max magnitude) directly."""
    for ctx in (FP, FL):
        # worst-case columns: 20 * (2^13)^2 close to int32 limit
        wide = np.full((4, 2 * NLIMBS - 1), 20 * LIMB_MASK * LIMB_MASK // 20, dtype=np.int64)
        wide = (wide * np.int64(20)).clip(max=2**31 - 1).astype(np.int32)
        vals = [
            sum(int(v) << (LIMB_BITS * i) for i, v in enumerate(row)) for row in wide
        ]
        out = normalize(ctx, jnp.asarray(wide))
        got = [v % ctx.modulus for v in limbs_to_ints(canon(ctx, out))]
        assert got == [v % ctx.modulus for v in vals]


def test_neg_and_add_many():
    for ctx in (FP, FL):
        vals = rand_vals(16)
        x = jnp.asarray(ints_to_limbs(vals))
        n = neg(ctx, x)
        s = add(ctx, x, n)
        assert all(np.asarray(canon(ctx, s)).sum(axis=-1) == 0)

        stacked = jnp.asarray(ints_to_limbs(vals))  # [16, NLIMBS]
        total = add_many(ctx, stacked, axis=0)
        assert limbs_to_ints(canon(ctx, total))[0] == sum(vals) % ctx.modulus


def test_eq_mod():
    for ctx in (FP, FL):
        a = jnp.asarray(ints_to_limbs([5, ctx.modulus + 5, 7]))
        b = jnp.asarray(ints_to_limbs([5, 5, 8]))
        assert list(np.asarray(eq_mod(ctx, a, b))) == [True, True, False]


def test_batch_shapes():
    ctx = FP
    a = jnp.asarray(ints_to_limbs(rand_vals(12))).reshape(3, 4, NLIMBS)
    b = jnp.asarray(ints_to_limbs(list(reversed(rand_vals(12))))).reshape(3, 4, NLIMBS)
    out = mul(ctx, a, b)
    assert out.shape == (3, 4, NLIMBS)
    flat = mul(ctx, a.reshape(12, NLIMBS), b.reshape(12, NLIMBS))
    assert (np.asarray(out).reshape(12, NLIMBS) == np.asarray(flat)).all()


def test_fuzz_mul_chain():
    """Longer randomized chains keep values in working range (overflow hunt)."""
    for ctx in (FP, FL):
        vals = rand_vals(8)
        x = jnp.asarray(ints_to_limbs(vals))
        acc_int = [v % ctx.modulus for v in vals]
        acc = x
        for i in range(10):
            acc = mul(ctx, acc, x)
            acc = add(ctx, acc, x)
            acc = sub(ctx, acc, jnp.asarray(int_to_limbs(i + 1)))
            acc_int = [
                (a * v + v - (i + 1)) % ctx.modulus for a, v in zip(acc_int, vals)
            ]
        assert [v % ctx.modulus for v in limbs_to_ints(canon(ctx, acc))] == acc_int
