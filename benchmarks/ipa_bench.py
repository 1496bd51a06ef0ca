"""BASELINE.md config 3: inner-product-argument prove/verify scaling.

Times full Bulletproofs R1CS prove + verify at padded circuit sizes
n = 2^10 .. 2^16 using a synthetic x*y=z chain circuit, isolating how the
phase programs (vector commitments, t-polynomial, log2(n) IPA folds,
verification mega-MSM) scale with constraint count.

    python benchmarks/ipa_bench.py --sizes 1024,2048 --batch 2
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
    ap.add_argument("--sizes", default="1024,2048",
                    help="comma-separated padded gate counts (powers of two)")
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    import jax
    import numpy as np

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from dusk_blindbidproof_tpu.models.bulletproofs import (
        CompiledCircuit, Prover, ProverWitness, Verifier,
    )
    from dusk_blindbidproof_tpu.models.r1cs import LC, VerifierCS
    from dusk_blindbidproof_tpu.ops import limb
    from dusk_blindbidproof_tpu.utils.curve_host import L
    from dusk_blindbidproof_tpu.utils.merlin import Transcript

    B = args.batch
    results = []
    for n_pad in (int(s) for s in args.sizes.split(",")):
        # chain circuit: w_{i+1} = w_i * w_i with one committed input
        cs = VerifierCS()
        v0 = cs.commit_var()
        cur = LC.of(v0)
        n_gates = n_pad - 1  # leave room for padding to the power of two
        outs = []
        for _ in range(n_gates):
            _, _, o = cs.multiply(cur, cur)
            cur = LC.of(o)
            outs.append(o)
        circuit = CompiledCircuit.compile(cs.artifact())
        assert circuit.n_pad == n_pad, (circuit.n_pad, n_pad)

        # witness
        w0 = 3
        aL, aR, aO = [], [], []
        x = w0
        for _ in range(n_gates):
            aL.append(x)
            aR.append(x)
            x = x * x % L
            aO.append(x)

        def one_round():
            ts = [Transcript(b"ipa-bench") for _ in range(B)]
            prover = Prover(ts, cap=n_pad)
            values = [[w0]] * B
            blinds = [[7]] * B
            comms = prover.commit_batch(values, blinds)
            zeros = np.zeros((B, n_pad, limb.NLIMBS), dtype=np.int32)
            wit = ProverWitness(
                a_L=_fill(zeros.copy(), aL), a_R=_fill(zeros.copy(), aR),
                a_O=_fill(zeros.copy(), aO),
                v=np.broadcast_to(
                    limb.ints_to_limbs_fast([w0]), (B, 1, limb.NLIMBS)).copy(),
                v_blinding=np.broadcast_to(
                    limb.ints_to_limbs_fast([7]), (B, 1, limb.NLIMBS)).copy(),
                publics=np.zeros((B, 0, limb.NLIMBS), dtype=np.int32),
            )
            proofs = prover.prove(circuit, wit)
            vts = [Transcript(b"ipa-bench") for _ in range(B)]
            verifier = Verifier(vts, cap=n_pad)
            verifier.commit_batch(comms)
            oks = verifier.verify(
                circuit, proofs, comms,
                np.zeros((B, 0, limb.NLIMBS), dtype=np.int32))
            assert all(oks), f"ipa bench proof rejected at n={n_pad}"

        def _fill(arr, vals):
            arr[:, : len(vals)] = limb.ints_to_limbs_fast(vals)
            return arr

        one_round()  # compile
        t0 = time.perf_counter()
        one_round()
        dt = time.perf_counter() - t0
        results.append({"n": n_pad, "s_per_prove_verify": round(dt / B, 4)})

    print(json.dumps({
        "metric": "ipa_prove_verify_scaling",
        "batch": B,
        "results": results,
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
