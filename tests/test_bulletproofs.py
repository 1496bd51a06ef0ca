"""End-to-end Bulletproofs R1CS engine tests on a tiny circuit.

The blindbid-size (n=2048) end-to-end gate lives in test_blindbid.py; this
file exercises the identical engine code on a 2-gate circuit where compiles
are cheap: completeness, soundness-on-mutation, batch independence.
"""

import numpy as np
import pytest

from dusk_blindbidproof_tpu.models.bulletproofs import (
    CompiledCircuit,
    Prover,
    ProverWitness,
    Verifier,
)
from dusk_blindbidproof_tpu.models.proof_struct import R1CSProof
from dusk_blindbidproof_tpu.models.r1cs import LC, VerifierCS
from dusk_blindbidproof_tpu.models.transcript_protocol import ProofError
from dusk_blindbidproof_tpu.ops import limb
from dusk_blindbidproof_tpu.utils.curve_host import L
from dusk_blindbidproof_tpu.utils.merlin import Transcript

import pytest

# Full-engine device graphs: multi-minute XLA-CPU compiles.  The fast
# suite (`make test`, -m "not slow") gates with host-side golden vectors,
# property tests, and the interpret-mode Pallas kernels; these run in
# `make inttest`.
pytestmark = pytest.mark.slow

CAP = 8
LABEL = b"tiny-cube-proof"


def cube_circuit() -> CompiledCircuit:
    """Prove knowledge of a with a^3 = public."""
    cs = VerifierCS()
    a = cs.commit_var()
    pub = cs.public_var()
    _, _, o = cs.multiply(LC.of(a), LC.of(a))
    _, _, o2 = cs.multiply(LC.of(o), LC.of(a))
    cs.constrain(LC.of(o2) - pub)
    return CompiledCircuit.compile(cs.artifact())


def make_witness(circuit, a_vals, blinds):
    B = len(a_vals)
    n_pad = circuit.n_pad
    aL = np.zeros((B, n_pad, limb.NLIMBS), dtype=np.int32)
    aR = np.zeros_like(aL)
    aO = np.zeros_like(aL)
    pubs = []
    for i, a in enumerate(a_vals):
        a2 = a * a % L
        a3 = a2 * a % L
        aL[i] = limb.ints_to_limbs_fast([a, a2])
        aR[i] = limb.ints_to_limbs_fast([a, a])
        aO[i] = limb.ints_to_limbs_fast([a2, a3])
        pubs.append(a3)
    return (
        ProverWitness(
            a_L=aL,
            a_R=aR,
            a_O=aO,
            v=limb.ints_to_limbs_fast(a_vals, (B, 1)),
            v_blinding=limb.ints_to_limbs_fast(blinds, (B, 1)),
            publics=limb.ints_to_limbs_fast(pubs, (B, 1)),
        ),
        pubs,
    )


def prove_cube(a_vals, blinds):
    circuit = cube_circuit()
    B = len(a_vals)
    ts = [Transcript(LABEL) for _ in range(B)]
    prover = Prover(ts, cap=CAP)
    commitments = prover.commit_batch(
        [[a] for a in a_vals], [[b] for b in blinds]
    )
    witness, pubs = make_witness(circuit, a_vals, blinds)
    proofs = prover.prove(circuit, witness)
    return circuit, proofs, commitments, pubs


def run_verify(circuit, proofs, commitments, pubs):
    B = len(proofs)
    ts = [Transcript(LABEL) for _ in range(B)]
    verifier = Verifier(ts, cap=CAP)
    verifier.commit_batch(commitments)
    publics = limb.ints_to_limbs_fast(pubs, (B, 1))
    return verifier.verify(circuit, proofs, commitments, publics)


def test_prove_verify_roundtrip_batch():
    a_vals = [12345, 6789, L - 3]
    blinds = [111, 222, 333]
    circuit, proofs, commitments, pubs = prove_cube(a_vals, blinds)
    assert run_verify(circuit, proofs, commitments, pubs) == [True, True, True]

    # proof serialization roundtrip preserves verification
    redecoded = [R1CSProof.from_bytes(p.to_bytes()) for p in proofs]
    assert run_verify(circuit, redecoded, commitments, pubs) == [True] * 3


def test_reject_wrong_public():
    circuit, proofs, commitments, pubs = prove_cube([55], [77])
    bad = [(pubs[0] + 1) % L]
    assert run_verify(circuit, proofs, commitments, bad) == [False]


def test_reject_mutated_scalars_and_points():
    circuit, proofs, commitments, pubs = prove_cube([987654321], [13])
    p = proofs[0]

    mut = R1CSProof.from_bytes(p.to_bytes())
    mut.t_x = (mut.t_x + 1) % L
    assert run_verify(circuit, [mut], commitments, pubs) == [False]

    mut = R1CSProof.from_bytes(p.to_bytes())
    mut.ipp_a = (mut.ipp_a + 1) % L
    assert run_verify(circuit, [mut], commitments, pubs) == [False]

    mut = R1CSProof.from_bytes(p.to_bytes())
    mut.e_blinding = (mut.e_blinding + 1) % L
    assert run_verify(circuit, [mut], commitments, pubs) == [False]

    # swap T_3 with T_4 (both valid points, wrong slots)
    mut = R1CSProof.from_bytes(p.to_bytes())
    mut.T_3, mut.T_4 = mut.T_4, mut.T_3
    assert run_verify(circuit, [mut], commitments, pubs) == [False]

    # identity A_I1 must be rejected outright
    mut = R1CSProof.from_bytes(p.to_bytes())
    mut.A_I1 = b"\x00" * 32
    with pytest.raises(ProofError):
        run_verify(circuit, [mut], commitments, pubs)

    # garbage (non-canonical) point encoding
    mut = R1CSProof.from_bytes(p.to_bytes())
    mut.T_1 = b"\xff" * 32
    with pytest.raises(ProofError):
        run_verify(circuit, [mut], commitments, pubs)


def test_reject_wrong_commitment():
    circuit, proofs, commitments, pubs = prove_cube([31337, 42], [1, 2])
    # swap the two proofs' commitments
    swapped = [commitments[1], commitments[0]]
    assert run_verify(circuit, proofs, swapped, pubs) == [False, False]


def test_proofs_deterministic_given_seed():
    _, p1, c1, _ = prove_cube([999], [123])
    _, p2, c2, _ = prove_cube([999], [123])
    assert p1[0].to_bytes() == p2[0].to_bytes()
    assert c1 == c2
