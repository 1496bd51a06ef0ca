"""BASELINE.md config 2: standalone fixed-base MSM kernel benchmark.

Times the scatter-free bucket MSM (ops.msm) against the device-resident
Pedersen window tables at n points (default 2^16 items after window
expansion is n*20), reporting Mpoint-ops/s — the north-star kernel metric
(SURVEY.md §2.2 MSM row).

Run on the real TPU:   python benchmarks/msm_bench.py --n 4096 --batch 4
Run on CPU (debug):    JAX_PLATFORMS=cpu python benchmarks/msm_bench.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2048,
                    help="number of (point, scalar) pairs per MSM")
    ap.add_argument("--batch", type=int, default=1,
                    help="independent MSMs per device pass")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from dusk_blindbidproof_tpu.ops import limb, msm

    cap = args.n // 2
    msm.pedersen_tables(cap)
    table, _ = msm.pedersen_tables_niels(cap)  # n_total = 2*cap + 2 points
    n_total = table.shape[0]
    table_c = jnp.asarray(table)

    @jax.jit
    def run(digits):
        # the production fixed-base path: affine-Niels tables, fused plane
        # kernels, variadic-sort bucket accumulation (compression happens on
        # host in production and is excluded here — kernel metric only)
        b = jnp.broadcast_to(table_c, (*digits.shape[:-2], *table_c.shape))
        return limb.canon(limb.FP, msm.msm_prescaled(b, digits, niels=True))

    def run_synced(digits):
        # np.asarray forces a device->host sync; on the tunneled axon
        # backend block_until_ready can return before execution finishes
        return np.asarray(run(digits))

    rng = np.random.default_rng(11)
    digits = jnp.asarray(rng.integers(
        0, 1 << limb.LIMB_BITS,
        size=(args.batch, n_total, limb.NLIMBS)).astype(np.int32))
    # top limb is slack: msm_prescaled truncates digits to WINDOWS=20 limbs,
    # so zeroing it just documents the canonical-scalar digit layout
    digits = digits.at[..., limb.NLIMBS - 1].set(0)

    run_synced(digits)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = run_synced(digits)
    dt = (time.perf_counter() - t0) / args.iters

    point_ops = args.batch * n_total  # logical point-scalar products per pass
    print(json.dumps({
        "metric": "msm_fixed_base",
        "n_points": n_total,
        "batch": args.batch,
        "s_per_msm": round(dt / args.batch, 5),
        "Mpoint_ops_per_s": round(point_ops / dt / 1e6, 4),
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
