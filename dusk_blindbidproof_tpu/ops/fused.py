"""Fused Pallas TPU kernels for the hot Edwards group ops.

The MSM inner loops are chains of unified Edwards adds over large row
batches (SURVEY.md §7 step 4).  Expressed as plain jnp, each add is ~9
modmuls whose pads/tree-sums/carry stages materialize ~0.5 GB of HBM
intermediates per 82k-row call — the op chain is bandwidth-bound ~25x off
roofline.  These kernels run the whole formula per row tile inside VMEM:
HBM traffic drops to the operands themselves.

Mechanics: the kernels re-trace the exact `edwards.add_impl`/`double_impl`
formula code (same limb engine, same trace-time bound tracking) inside a
`pallas_call`.  Pallas forbids captured constant arrays, so the limb
engine's host tables (fold rows, redigit vectors, curve constants) are
routed through `limb.kconst`: a dry trace records every table this formula
needs, the tables are packed into one [R, NLIMBS] int32 matrix passed as a
kernel input, and inside the kernel the resolver serves each table as a
static row-slice of that ref.

CPU (tests, driver dryrun) keeps the plain jnp path — `use_fused` is False
there, and for small row counts where kernel launch padding would dominate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import limb
from .limb import NLIMBS

_TILE = 256  # rows per kernel instance (VMEM-sized)
_MIN_ROWS = 128  # below this the jnp path wins (padding + launch overhead)

# Default OFF: measured on v5e, the [row, 4, NLIMBS] block layout pads 12x in
# VMEM and the kernel ran ~1.7x slower than the (concat-free) XLA op chain
# (51 ms vs 30 ms per 82k-row add incl. dispatch).  The kernels are kept —
# bit-exact vs the jnp path (tests/test_fused.py) — as the starting point
# for a limbs-on-sublanes transposed layout, which is where a Pallas win
# lives.  Flip with BLINDBID_FUSED=1.
import os

_ENABLED = os.environ.get("BLINDBID_FUSED", "0") == "1"


def use_fused(*args) -> bool:
    """Fused path: TPU-like backend, large batch, and all operands already
    batch-shaped [..., 4, NLIMBS] with a common broadcastable shape."""
    if not _ENABLED or jax.default_backend() == "cpu":
        return False
    try:
        shape = jnp.broadcast_shapes(*[a.shape for a in args])
    except ValueError:
        return False
    if len(shape) < 3 or shape[-2:] != (4, NLIMBS):
        return False
    rows = int(np.prod(shape[:-2], dtype=np.int64))
    return rows >= _MIN_ROWS


class _ConstPack:
    """Records the host constant tables a formula uses, packs them into one
    [R, NLIMBS] matrix, and resolves them to row slices inside the kernel."""

    def __init__(self):
        self.order: list[tuple[bytes, tuple, int]] = []  # (key, shape, row0)
        self.index: dict[bytes, tuple] = {}
        self.rows = 0

    @staticmethod
    def _key(a: np.ndarray) -> bytes:
        return a.shape.__repr__().encode() + a.tobytes()

    def record(self, a: np.ndarray) -> jnp.ndarray:
        key = self._key(a)
        if key not in self.index:
            nrows = int(np.prod(a.shape[:-1])) if a.ndim > 1 else 1
            assert a.shape[-1] <= NLIMBS, a.shape
            self.index[key] = (self.rows, a.shape)
            self.order.append((key, a.shape, self.rows))
            self.rows += nrows
        return jnp.asarray(a)

    def pack(self, recorded: dict[bytes, np.ndarray]) -> np.ndarray:
        mat = np.zeros((max(self.rows, 1), NLIMBS), dtype=np.int32)
        for key, shape, row0 in self.order:
            a = recorded[key].reshape(-1, shape[-1])
            mat[row0 : row0 + a.shape[0], : shape[-1]] = a
        return mat

    def resolver(self, cref):
        def resolve(a: np.ndarray) -> jnp.ndarray:
            row0, shape = self.index[self._key(a)]
            nrows = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
            block = cref[row0 : row0 + nrows, : shape[-1]]
            # 1-D tables stay [1, w]: jnp broadcasting against [rows, w]
            # operands is identical, and Mosaic prefers >= 2-D values
            return block if len(shape) > 1 else block
        return resolve


@functools.lru_cache(maxsize=8)
def _build_rowwise(formula_name: str, n_in: int, tile: int):
    """Compile a [tile, 4, NLIMBS]^n_in -> [tile, 4, NLIMBS] formula into a
    grid-tiled pallas_call."""
    from . import edwards

    formula = {"add": edwards.add_impl, "double": edwards.double_impl}[
        formula_name
    ]

    pack = _ConstPack()
    recorded: dict[bytes, np.ndarray] = {}

    def record(a: np.ndarray) -> jnp.ndarray:
        recorded[pack._key(a)] = a
        return pack.record(a)

    ex = jax.ShapeDtypeStruct((tile, 4, NLIMBS), jnp.int32)
    limb.set_kconst_resolver(record)
    try:
        jax.eval_shape(formula, *([ex] * n_in))
    finally:
        limb.set_kconst_resolver(None)
    cmat = pack.pack(recorded)

    def kernel(*refs):
        ins, cref, oref = refs[:n_in], refs[n_in], refs[n_in + 1]
        limb.set_kconst_resolver(pack.resolver(cref))
        try:
            oref[:] = formula(*[r[:] for r in ins])
        finally:
            limb.set_kconst_resolver(None)

    def run(*arrays):
        n = arrays[0].shape[0]
        nt = -(-n // tile)
        npad = nt * tile
        padded = [
            jnp.pad(a, ((0, npad - n), (0, 0), (0, 0))) if npad != n else a
            for a in arrays
        ]
        row_spec = pl.BlockSpec(
            (tile, 4, NLIMBS), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        const_spec = pl.BlockSpec(
            cmat.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        out = pl.pallas_call(
            kernel,
            grid=(nt,),
            in_specs=[row_spec] * n_in + [const_spec],
            out_specs=row_spec,
            out_shape=jax.ShapeDtypeStruct((npad, 4, NLIMBS), jnp.int32),
        )(*padded, jnp.asarray(cmat))
        return out[:n]

    return run


def _rowwise(formula_name: str, *args):
    shape = jnp.broadcast_shapes(*[a.shape for a in args])
    flat = [
        jnp.broadcast_to(a, shape).reshape(-1, 4, NLIMBS) for a in args
    ]
    run = _build_rowwise(formula_name, len(args), _TILE)
    out = run(*flat)
    return out.reshape(shape)


def edwards_add(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    return _rowwise("add", p, q)


def edwards_double(p: jnp.ndarray) -> jnp.ndarray:
    return _rowwise("double", p)
