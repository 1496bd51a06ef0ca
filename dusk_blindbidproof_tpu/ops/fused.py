"""Fused Pallas TPU kernels for the hot Edwards group ops (v2: plane layout).

The MSM inner loops are chains of unified Edwards adds over large row
batches (SURVEY.md §7 step 4).  Expressed as plain jnp, each add is ~9
modmuls whose padded partial products / carry stages materialize in HBM —
measured ~6.6 M adds/s on v5e, ~25x off the fused roofline, and XLA's
fusion does not rescue it (hand-tuned op-chain variants all land at the
same ~50 M modmul/s).

v1 of these kernels kept the [row, 4, NLIMBS] layout and LOST to the op
chain by 1.7x: a (4, 21) minor block occupies ~8% of each (8, 128) VMEM
tile.  v2 runs the formulas in a TRANSPOSED plane layout — arrays are
[4, NLIMBS, T]: limbs on sublanes (21 -> pads to 24), independent items on
lanes — the limbs-on-sublanes layout v1's notes prescribed.  The limb
engine itself traces the kernels under `limb.t_mode()`, so the exact same
bound-tracked arithmetic (and its trace-time int32-overflow proofs) runs
inside the kernel.

Host constant tables (fold rows, redigit vectors, curve constants) are
routed through `limb.kconst`: a dry trace records every 1-D table the
formula needs, the tables are packed column-major into one
[NLIMBS, n_tables] int32 matrix passed as a kernel input, and inside the
kernel the resolver serves each as a [w, 1] column slice (broadcastable
against [w, T] planes with no in-kernel transpose).

CPU (tests, driver dryrun) runs the same kernels through the Pallas
interpreter — `tests/test_fused.py` pins bit-exactness vs the jnp path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import limb
from .limb import FP, NLIMBS

_TILE = 512  # lanes (items) per kernel instance; multiple of 128

# Default ON for TPU backends (the v2 plane kernels win; see
# BENCHMARKS.md for the measured before/after).  BLINDBID_FUSED=0 disables.
_ENABLED = os.environ.get("BLINDBID_FUSED", "1") != "0"


def enabled() -> bool:
    return _ENABLED and jax.default_backend() != "cpu"


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# Formulas, in plane form: p/q are [4, NLIMBS, T] coordinate planes.
# Same math as edwards.add_impl / double_impl (add-2008-hwcd-3 family).
# ---------------------------------------------------------------------------


def _d2_row():
    from . import edwards

    return limb._krow(edwards._D2_LIMBS)


def _add_planes_formula(p, q):
    x1, y1, z1, t1 = p[0], p[1], p[2], p[3]
    x2, y2, z2, t2 = q[0], q[1], q[2], q[3]
    d2 = _d2_row()
    a = limb.mul(FP, limb.sub(FP, y1, x1), limb.sub(FP, y2, x2))
    b = limb.mul(FP, limb.add(FP, y1, x1), limb.add(FP, y2, x2))
    c = limb.mul(FP, limb.mul(FP, t1, d2), t2)
    dd = limb.mul(FP, limb.add(FP, z1, z1), z2)
    e = limb.sub(FP, b, a)
    f = limb.sub(FP, dd, c)
    g = limb.add(FP, dd, c)
    h = limb.add(FP, b, a)
    return (
        limb.mul(FP, e, f),
        limb.mul(FP, g, h),
        limb.mul(FP, f, g),
        limb.mul(FP, e, h),
    )


def _madd_planes_formula(p, q):
    """p extended + q affine-Niels planes (y-x, y+x, 2d*xy, unused): 7M."""
    x1, y1, z1, t1 = p[0], p[1], p[2], p[3]
    a2, b2, c2 = q[0], q[1], q[2]
    a = limb.mul(FP, limb.sub(FP, y1, x1), a2)
    b = limb.mul(FP, limb.add(FP, y1, x1), b2)
    c = limb.mul(FP, t1, c2)
    dd = limb.add(FP, z1, z1)
    e = limb.sub(FP, b, a)
    f = limb.sub(FP, dd, c)
    g = limb.add(FP, dd, c)
    h = limb.add(FP, b, a)
    return (
        limb.mul(FP, e, f),
        limb.mul(FP, g, h),
        limb.mul(FP, f, g),
        limb.mul(FP, e, h),
    )


def _double_planes_formula(p):
    x1, y1, z1 = p[0], p[1], p[2]
    a = limb.sqr(FP, x1)
    b = limb.sqr(FP, y1)
    zz = limb.sqr(FP, z1)
    c = limb.add(FP, zz, zz)
    h = limb.add(FP, a, b)
    xy = limb.add(FP, x1, y1)
    e = limb.sub(FP, h, limb.sqr(FP, xy))
    g = limb.sub(FP, a, b)
    f = limb.add(FP, c, g)
    return (
        limb.mul(FP, e, f),
        limb.mul(FP, g, h),
        limb.mul(FP, f, g),
        limb.mul(FP, e, h),
    )


_FORMULAS = {
    "add": (_add_planes_formula, 2),
    "madd": (_madd_planes_formula, 2),
    "double": (_double_planes_formula, 1),
}


class _ConstPackT:
    """Records 1-D host constant tables, packs them column-major into one
    [NLIMBS, n] matrix, and resolves each to a [w, 1] column slice inside
    the kernel (broadcastable against [w, T] planes, no transpose)."""

    def __init__(self):
        self.index: dict[bytes, tuple] = {}  # key -> (col, width)
        self.order: list[bytes] = []
        self.cols = 0

    @staticmethod
    def _key(a: np.ndarray) -> bytes:
        return repr(a.shape).encode() + a.tobytes()

    def record(self, a: np.ndarray) -> jnp.ndarray:
        assert a.ndim == 1 and a.shape[0] <= NLIMBS, a.shape
        key = self._key(a)
        if key not in self.index:
            self.index[key] = (self.cols, a.shape[0])
            self.order.append(key)
            self.cols += 1
        return jnp.asarray(a)

    def pack(self, recorded: dict[bytes, np.ndarray]) -> np.ndarray:
        mat = np.zeros((NLIMBS, max(self.cols, 1)), dtype=np.int32)
        for key in self.order:
            col, w = self.index[key]
            mat[:w, col] = recorded[key]
        return mat

    def resolver(self, cref):
        def resolve(a: np.ndarray) -> jnp.ndarray:
            col, w = self.index[self._key(a)]
            return cref[:w, col : col + 1]

        return resolve


@functools.lru_cache(maxsize=16)
def _build_planes(name: str, tile: int, interpret: bool):
    """Compile [1, 4, NLIMBS, tile]^n -> same-shape plane formula into a
    grid-tiled pallas_call over (batch, lanes/tile)."""
    formula, n_in = _FORMULAS[name]

    pack = _ConstPackT()
    recorded: dict[bytes, np.ndarray] = {}

    def record(a: np.ndarray) -> jnp.ndarray:
        recorded[pack._key(a)] = a
        return pack.record(a)

    ex = jax.ShapeDtypeStruct((4, NLIMBS, tile), jnp.int32)
    limb.set_kconst_resolver(record)
    try:
        with limb.t_mode():
            jax.eval_shape(formula, *([ex] * n_in))
    finally:
        limb.set_kconst_resolver(None)
    cmat = pack.pack(recorded)

    def kernel(*refs):
        ins, cref, oref = refs[:n_in], refs[n_in], refs[n_in + 1]
        limb.set_kconst_resolver(pack.resolver(cref))
        try:
            with limb.t_mode():
                planes = formula(*[r[0] for r in ins])
        finally:
            limb.set_kconst_resolver(None)
        for i in range(4):
            oref[0, i] = planes[i]

    def run(*arrays):
        """arrays: [B, 4, NLIMBS, T] with T a multiple of tile."""
        B, _, _, T = arrays[0].shape
        nt = T // tile
        spec = pl.BlockSpec(
            (1, 4, NLIMBS, tile),
            lambda b, i: (b, 0, 0, i),
            memory_space=pltpu.VMEM,
        )
        const_spec = pl.BlockSpec(
            cmat.shape, lambda b, i: (0, 0), memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            kernel,
            grid=(B, nt),
            in_specs=[spec] * n_in + [const_spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B, 4, NLIMBS, T), jnp.int32),
            interpret=interpret,
        )(*arrays, jnp.asarray(cmat))

    return run


def _planes_op(name: str, *arrays):
    """arrays: [..., 4, NLIMBS, T] broadcast-compatible planes."""
    shape = jnp.broadcast_shapes(*[a.shape for a in arrays])
    assert shape[-3:-1] == (4, NLIMBS), shape
    T = shape[-1]
    tile = min(_TILE, max(128, T))
    Tp = -(-T // tile) * tile
    flat = []
    for a in arrays:
        a = jnp.broadcast_to(a, shape).reshape(-1, 4, NLIMBS, T)
        if Tp != T:
            a = jnp.pad(a, ((0, 0), (0, 0), (0, 0), (0, Tp - T)))
        flat.append(a)
    run = _build_planes(name, tile, _interpret())
    out = run(*flat)
    if Tp != T:
        out = out[..., :T]
    return out.reshape(shape)


def add_planes(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Unified extended add on [..., 4, NLIMBS, T] planes."""
    return _planes_op("add", p, q)


def madd_planes(p: jnp.ndarray, q_niels: jnp.ndarray) -> jnp.ndarray:
    """Mixed add: p extended planes + q affine-Niels planes (7M)."""
    return _planes_op("madd", p, q_niels)


def double_planes(p: jnp.ndarray) -> jnp.ndarray:
    return _planes_op("double", p)


# ---------------------------------------------------------------------------
# Row-layout adapters: [..., 4, NLIMBS] points -> plane kernel -> back.
# Costs two relayout transposes per call; worth it above ~2k rows where the
# kernel's fused arithmetic dominates.  The MSM hot path avoids even these
# by keeping its whole scan in plane layout (ops.msm._bucket_msm_fused).
# ---------------------------------------------------------------------------


def points_to_planes(pts: jnp.ndarray) -> jnp.ndarray:
    """[..., m, 4, NLIMBS] -> [..., 4, NLIMBS, m]."""
    return jnp.moveaxis(pts, -3, -1)


def planes_to_points(planes: jnp.ndarray) -> jnp.ndarray:
    """[..., 4, NLIMBS, m] -> [..., m, 4, NLIMBS]."""
    return jnp.moveaxis(planes, -1, -3)


# ---------------------------------------------------------------------------
# Scalar-field modmul kernel: the same plane trick for [..., NLIMBS] limb
# vectors (phase_t inner products, IPA fold/digit muls — several million FL
# muls per proof batch at ~50 M/s through the XLA op chain).
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _build_scalar_mul(ctx_name: str, tile: int, interpret: bool):
    ctx = {"fp": limb.FP, "fl": limb.FL}[ctx_name]

    pack = _ConstPackT()
    recorded: dict[bytes, np.ndarray] = {}

    def record(a: np.ndarray) -> jnp.ndarray:
        recorded[pack._key(a)] = a
        return pack.record(a)

    ex = jax.ShapeDtypeStruct((NLIMBS, tile), jnp.int32)
    limb.set_kconst_resolver(record)
    try:
        with limb.t_mode():
            jax.eval_shape(lambda a, b: limb.mul(ctx, a, b), ex, ex)
    finally:
        limb.set_kconst_resolver(None)
    cmat = pack.pack(recorded)

    def kernel(aref, bref, cref, oref):
        limb.set_kconst_resolver(pack.resolver(cref))
        try:
            with limb.t_mode():
                oref[0] = limb.mul(ctx, aref[0], bref[0])
        finally:
            limb.set_kconst_resolver(None)

    def run(a, b):
        """a, b: [B, NLIMBS, T] with T a multiple of tile."""
        B, _, T = a.shape
        spec = pl.BlockSpec(
            (1, NLIMBS, tile), lambda g, i: (g, 0, i), memory_space=pltpu.VMEM
        )
        const_spec = pl.BlockSpec(
            cmat.shape, lambda g, i: (0, 0), memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            kernel,
            grid=(B, T // tile),
            in_specs=[spec, spec, const_spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B, NLIMBS, T), jnp.int32),
            interpret=interpret,
        )(a, b, jnp.asarray(cmat))

    return run


def mul_rows(ctx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Fused modmul on [..., NLIMBS] limb vectors (bit-exact vs limb.mul)."""
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    T = int(np.prod(shape[:-1], dtype=np.int64))
    tile = min(_TILE, max(128, T))
    Tp = -(-T // tile) * tile

    def planes(x):
        x = jnp.broadcast_to(x, shape).reshape(T, NLIMBS)
        x = jnp.moveaxis(x, -1, 0)  # [NLIMBS, T]
        if Tp != T:
            x = jnp.pad(x, ((0, 0), (0, Tp - T)))
        return x[None]

    run = _build_scalar_mul(ctx.name, tile, _interpret())
    out = run(planes(a), planes(b))[0]
    if Tp != T:
        out = out[:, :T]
    return jnp.moveaxis(out, 0, -1).reshape(shape)


# row threshold below which kernel launch + relayout overhead loses to the
# plain op chain (a 524k-row fused add costs ~15 ms, the op chain ~79 ms;
# at a few hundred rows both are launch-bound and the op chain is simpler)
MIN_ROWS = 1024


def _n_rows(shape) -> int:
    return int(np.prod(shape[:-2], dtype=np.int64))


def use_fused(*shapes) -> bool:
    if not enabled():
        return False
    shape = jnp.broadcast_shapes(*shapes)
    return len(shape) >= 3 and shape[-2:] == (4, NLIMBS) and _n_rows(shape) >= MIN_ROWS


def add_rows(p: jnp.ndarray, q: jnp.ndarray, niels: bool = False) -> jnp.ndarray:
    """Fused add on [..., m, 4, NLIMBS] rows (transposes at the edges)."""
    shape = jnp.broadcast_shapes(p.shape, q.shape)
    p = jnp.broadcast_to(p, shape)
    q = jnp.broadcast_to(q, shape)
    op = madd_planes if niels else add_planes
    return planes_to_points(op(points_to_planes(p), points_to_planes(q)))


def double_rows(p: jnp.ndarray) -> jnp.ndarray:
    return planes_to_points(double_planes(points_to_planes(p)))
