"""Differential debugging: device prover/verifier vs the host oracle.

Proves the tiny cube circuit (tests/test_bulletproofs.py) both ways on the
same inputs and reports the FIRST intermediate that diverges.  Run on CPU
(default) or against the real TPU (ORACLE_CPU=0 under axon) to localize
device-only failures phase by phase.

Usage: [ORACLE_CPU=0] python scripts/oracle_compare.py [cap]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("ORACLE_CPU", "1") == "1":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main() -> int:
    import jax

    if os.environ.get("ORACLE_CPU", "1") == "1":
        jax.config.update("jax_platforms", "cpu")
    else:
        # real-chip smoke run: persistent cache (remote compiles are minutes)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    print("jax devices:", jax.devices())

    from dusk_blindbidproof_tpu.models.bulletproofs import (
        CompiledCircuit, Prover, ProverWitness, Verifier,
    )
    from dusk_blindbidproof_tpu.models.r1cs import LC, VerifierCS
    from dusk_blindbidproof_tpu.ops import limb
    from dusk_blindbidproof_tpu.utils import host_oracle as oracle
    from dusk_blindbidproof_tpu.utils.curve_host import L
    from dusk_blindbidproof_tpu.utils.merlin import Transcript

    cap = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    label = b"tiny-cube-proof"

    cs = VerifierCS()
    cs.commit_var()
    pub = cs.public_var()
    _, _, o = cs.multiply(LC.of(cs_var(cs, 0)), LC.of(cs_var(cs, 0)))
    _, _, o2 = cs.multiply(LC.of(o), LC.of(cs_var(cs, 0)))
    cs.constrain(LC.of(o2) - pub)
    circuit = CompiledCircuit.compile(cs.artifact())

    a_val = 12345
    blind = 111
    a2 = a_val * a_val % L
    a3 = a2 * a_val % L
    a_L = [a_val, a2]
    a_R = [a_val, a_val]
    a_O = [a2, a3]
    publics = [a3]

    # ---- host proof -------------------------------------------------------
    h_proof, htr = oracle.host_prove(
        circuit, Transcript(label), [a_val], [blind], a_L, a_R, a_O,
        publics, cap,
    )
    h_ok = oracle.host_verify(
        circuit, Transcript(label), h_proof, htr.commitments, publics, cap
    )
    print("host proof verifies on host:", h_ok)

    # ---- device proof -----------------------------------------------------
    n_pad = circuit.n_pad
    aL = np.zeros((1, n_pad, limb.NLIMBS), dtype=np.int32)
    aR = np.zeros_like(aL)
    aO = np.zeros_like(aL)
    aL[0] = limb.ints_to_limbs_fast(a_L)
    aR[0] = limb.ints_to_limbs_fast(a_R)
    aO[0] = limb.ints_to_limbs_fast(a_O)
    witness = ProverWitness(
        a_L=aL, a_R=aR, a_O=aO,
        v=limb.ints_to_limbs_fast([a_val], (1, 1)),
        v_blinding=limb.ints_to_limbs_fast([blind], (1, 1)),
        publics=limb.ints_to_limbs_fast(publics, (1, 1)),
    )
    ts = [Transcript(label)]
    prover = Prover(ts, cap=cap)
    commitments = prover.commit_batch([[a_val]], [[blind]])
    d_proofs = prover.prove(circuit, witness)
    d_proof = d_proofs[0]

    # ---- compare intermediates -------------------------------------------
    diverged = False

    def cmp(name, dev, hostv):
        nonlocal diverged
        if dev != hostv and not diverged:
            print(f"FIRST DIVERGENCE at {name}:")
            print("  device:", dev.hex() if isinstance(dev, bytes) else dev)
            print("  host:  ", hostv.hex() if isinstance(hostv, bytes) else hostv)
            diverged = True
        elif dev != hostv:
            print(f"  (also differs: {name})")

    cmp("V commitment", commitments[0][0], htr.commitments[0])
    cmp("A_I1", d_proof.A_I1, htr.A_I1)
    cmp("A_O1", d_proof.A_O1, htr.A_O1)
    cmp("S1", d_proof.S1, htr.S1)
    cmp("T_1", d_proof.T_1, htr.T_bytes[0])
    cmp("T_3", d_proof.T_3, htr.T_bytes[1])
    cmp("T_4", d_proof.T_4, htr.T_bytes[2])
    cmp("T_5", d_proof.T_5, htr.T_bytes[3])
    cmp("T_6", d_proof.T_6, htr.T_bytes[4])
    cmp("t_x", d_proof.t_x, htr.t_x)
    cmp("t_x_blinding", d_proof.t_x_blinding, htr.t_x_blinding)
    cmp("e_blinding", d_proof.e_blinding, htr.e_blinding)
    for j, (lb, rb) in enumerate(zip(d_proof.ipp_L, d_proof.ipp_R)):
        cmp(f"L[{j}]", lb, htr.L_bytes[j])
        cmp(f"R[{j}]", rb, htr.R_bytes[j])
    cmp("ipp_a", d_proof.ipp_a, htr.a)
    cmp("ipp_b", d_proof.ipp_b, htr.b)
    if not diverged:
        print("prover intermediates: all equal (device == host oracle)")

    # cross-verification matrix
    hv_dev = oracle.host_verify(
        circuit, Transcript(label), d_proof, commitments[0], publics, cap
    )
    print("device proof verifies on host:", hv_dev)

    def device_verify(proof, comms):
        vts = [Transcript(label)]
        verifier = Verifier(vts, cap=cap)
        verifier.commit_batch([comms])
        return verifier.verify(
            circuit, [proof], [comms], limb.ints_to_limbs_fast(publics, (1, 1))
        )[0]

    dv_dev = device_verify(d_proof, commitments[0])
    print("device proof verifies on device:", dv_dev)
    dv_host = device_verify(h_proof, htr.commitments)
    print("host proof verifies on device:", dv_host)

    ok = h_ok and hv_dev and dv_dev and dv_host and not diverged
    print("RESULT:", "ALL OK" if ok else "MISMATCH")
    return 0 if ok else 1


def cs_var(cs, idx):
    from dusk_blindbidproof_tpu.models.r1cs import Variable, VarKind

    return Variable(VarKind.COMMITTED, idx)


if __name__ == "__main__":
    raise SystemExit(main())
