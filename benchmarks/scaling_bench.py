"""BASELINE.md config 5: multi-device scaling efficiency (weak scaling).

Runs the bids-sharded prover phase program (phase_a — the vector-commitment
MSMs, the prover's dominant single phase) on a virtual CPU mesh at 1, 2, 4,
8 devices with a CONSTANT per-device batch, and reports weak-scaling
efficiency  t(1) / t(N)  (1.0 = perfect).  On the virtual mesh all
"devices" share the host's cores, so wall-clock stays ~flat only if GSPMD
partitions the program without replicating work or inserting spurious
collectives — this measures correct *scaling shape*, not chip speed
(BASELINE.md config 5; real multi-chip hardware is unavailable here).

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python benchmarks/scaling_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"


def main() -> None:
    import jax
    import numpy as np

    jax.config.update("jax_platforms", "cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache_cpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from dusk_blindbidproof_tpu.models.bulletproofs import _shard_bids, phase_a
    from dusk_blindbidproof_tpu.ops import limb, msm
    from dusk_blindbidproof_tpu.parallel import mesh as pmesh

    cap, n_pad, n1 = 32, 8, 8
    per_dev = 2  # bids per device (constant: weak scaling)
    msm.pedersen_tables(cap)
    msm.pedersen_tables_niels(cap)
    rng = np.random.default_rng(5)

    def rand_scalars(shape):
        return limb.ints_to_limbs_fast(
            [int(x) for x in rng.integers(1, 1 << 60, size=int(np.prod(shape)))],
            shape,
        )

    results = []
    t1 = None
    for ndev in (1, 2, 4, 8):
        mesh = pmesh.make_mesh(ndev, bids=ndev, points=1)
        B = per_dev * ndev
        args = [rand_scalars((B, n_pad)) for _ in range(5)]
        blinds = rand_scalars((B, 3))
        with mesh:
            sharded = [_shard_bids(mesh, a) for a in args]
            sb = _shard_bids(mesh, blinds)
            out = phase_a(cap, n1, *sharded, sb)
            np.asarray(out)  # compile + sync
            t0 = time.perf_counter()
            for _ in range(3):
                out = phase_a(cap, n1, *sharded, sb)
            np.asarray(out)
            dt = (time.perf_counter() - t0) / 3
        if t1 is None:
            t1 = dt
        results.append(
            {
                "devices": ndev,
                "batch": B,
                "s_per_pass": round(dt, 4),
                "weak_scaling_efficiency": round(t1 / dt, 3),
            }
        )
        print(json.dumps(results[-1]))

    print(json.dumps({"metric": "scaling_efficiency", "sweep": results}))


if __name__ == "__main__":
    main()
