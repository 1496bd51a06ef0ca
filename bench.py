"""Headline benchmark: BlindBid prove+verify seconds per op (n = 2048 gates).

Reference baseline (BASELINE.md): 0.245 s/op — one Go BenchmarkProveVerify
round trip (prove + verify, list length 4) on an i7-8559U with the
multithreaded bulletproofs fork; the best bar in
/root/reference/docs/benchmarks.png.

This harness proves and verifies a BATCH of independent bids in one device
pass (the TPU throughput axis, SURVEY.md §2.3) and reports amortized seconds
per proof.  vs_baseline is the speedup factor (baseline_s / ours_s; > 1 beats
the reference).

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

BASELINE_S_PER_OP = 0.245
LIST_LEN = 4


def main() -> None:
    # default batch 16: best measured amortized s/op on v5e (BENCHMARKS.md
    # sweep; batch 32 phase graphs crash the remote TPU compiler)
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import numpy as np

    from dusk_blindbidproof_tpu.models.blindbid import (
        VerifyRequest,
        make_prove_request,
        prove_batch,
        verify_batch,
    )

    rng = np.random.default_rng(2024)

    def mk_reqs(n):
        return [
            make_prove_request(
                d=int(rng.integers(1, 1 << 62)),
                k=int(rng.integers(1, 1 << 62)),
                seed=int(rng.integers(1, 1 << 62)),
                pub_list_extra=[int(rng.integers(1, 1 << 62))
                                for _ in range(LIST_LEN - 1)],
                toggle_pos=int(rng.integers(0, LIST_LEN)),
            )
            for _ in range(n)
        ]

    def round_trip(reqs):
        proofs = prove_batch(reqs, rng=np.random.default_rng(7))
        vreqs = [
            VerifyRequest(proof=p, score=r.q, z_img=r.z_img, seed=r.seed,
                          pub_list=r.pub_list)
            for p, r in zip(proofs, reqs)
        ]
        oks = verify_batch(vreqs)
        assert all(oks), "benchmark proof failed verification"

    # warmup: compiles every phase program at this batch shape
    round_trip(mk_reqs(batch))

    from dusk_blindbidproof_tpu.utils import profiling

    profiling.reset()
    t0 = time.perf_counter()
    round_trip(mk_reqs(batch))
    dt = time.perf_counter() - t0
    if os.environ.get("BLINDBID_PROFILE") == "1":
        print(profiling.report(), file=sys.stderr)

    s_per_op = dt / batch
    print(
        json.dumps(
            {
                "metric": "blindbid_prove_verify",
                "value": round(s_per_op, 4),
                "unit": "s/op",
                "vs_baseline": round(BASELINE_S_PER_OP / s_per_op, 3),
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except Exception as exc:  # noqa: BLE001 - report failure as JSON
        print(json.dumps({"metric": "blindbid_prove_verify", "value": None,
                          "unit": "s/op", "vs_baseline": 0.0,
                          "error": str(exc)[:200]}))
        sys.exit(1)
