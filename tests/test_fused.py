"""Fused plane-layout Pallas kernels: bit-exactness vs the jnp op chain.

The kernels re-trace the limb engine under `limb.t_mode()` (limbs on
sublanes, items on lanes — ops/fused.py); on CPU they execute through the
Pallas interpreter, so this suite pins the kernels byte-for-byte against
edwards.add_impl/double_impl/add_niels on every backend.
"""

import numpy as np
import jax
import jax.numpy as jnp

from dusk_blindbidproof_tpu.ops import edwards, fused, limb

rng = np.random.default_rng(7)
M = 300  # deliberately not a multiple of the lane tile (exercises padding)


def _rand_rows(shape):
    return jnp.asarray(
        rng.integers(0, 8192, size=(*shape, 4, limb.NLIMBS), dtype=np.int32)
    )


def test_add_planes_bit_exact():
    p, q = _rand_rows((M,)), _rand_rows((M,))
    want = np.asarray(jax.jit(edwards.add_impl)(p, q))
    got = np.asarray(jax.jit(lambda a, b: fused.add_rows(a, b))(p, q))
    assert (want == got).all()


def test_madd_planes_bit_exact():
    p, q = _rand_rows((M,)), _rand_rows((M,))
    want = np.asarray(jax.jit(lambda a, b: edwards.add_niels(a, b))(p, q))
    got = np.asarray(
        jax.jit(lambda a, b: fused.add_rows(a, b, niels=True))(p, q)
    )
    assert (want == got).all()


def test_double_planes_bit_exact():
    p = _rand_rows((M,))
    want = np.asarray(jax.jit(edwards.double_impl)(p))
    got = np.asarray(jax.jit(fused.double_rows)(p))
    assert (want == got).all()


def test_scalar_mul_rows_bit_exact():
    a = jnp.asarray(
        rng.integers(0, 8193, size=(M, limb.NLIMBS), dtype=np.int32)
    )
    b = jnp.asarray(
        rng.integers(0, 8193, size=(M, limb.NLIMBS), dtype=np.int32)
    )
    for ctx in (limb.FP, limb.FL):
        want = np.asarray(
            jax.jit(
                lambda x, y, c=ctx: limb.lb_mul(c, limb.wrap(x), limb.wrap(y)).x
            )(a, b)
        )
        got = np.asarray(
            jax.jit(lambda x, y, c=ctx: fused.mul_rows(c, x, y))(a, b)
        )
        assert (want == got).all(), ctx.name


def test_batched_shapes_and_identity():
    # multi-dim batch + identity rows (the MSM's padding values)
    p = _rand_rows((3, 40))
    q = jnp.broadcast_to(edwards.identity(), p.shape)
    want = np.asarray(jax.jit(edwards.add_impl)(p, q))
    got = np.asarray(jax.jit(lambda a, b: fused.add_rows(a, b))(p, q))
    assert (want == got).all()
