"""Frozen golden vectors for the Fiat-Shamir transcript schedule.

SURVEY.md §8.3: the append/challenge schedule is the bit-exactness contract
of the whole proof system (protocol label /root/reference/src/blindbid/mod.rs:37,
schedule from the pinned bulletproofs crate).  These vectors were generated
once from the host oracle (utils/host_oracle.py) at a pinned seed and are
FROZEN here:

  * any change to the transcript schedule (labels, order, domain
    separators, encodings) breaks `test_schedule_replay_matches_frozen`
    loudly — it replays the schedule over the frozen proof bytes with no
    prover involved;
  * any change to prover math breaks `test_host_oracle_reproduces_frozen`;
  * any device/host divergence breaks `test_device_prover_matches_frozen`
    (the device prover must emit byte-identical proofs).
"""

import numpy as np

from dusk_blindbidproof_tpu.models.bulletproofs import CompiledCircuit
from dusk_blindbidproof_tpu.models.proof_struct import R1CSProof
from dusk_blindbidproof_tpu.models.r1cs import LC, VerifierCS
from dusk_blindbidproof_tpu.models.transcript_protocol import (
    append_point,
    append_scalar,
    challenge_scalar,
    innerproduct_domain_sep,
    r1cs_1phase_domain_sep,
    r1cs_domain_sep,
)
from dusk_blindbidproof_tpu.utils import host_oracle as oracle
from dusk_blindbidproof_tpu.utils.curve_host import L
from dusk_blindbidproof_tpu.utils.merlin import Transcript

CAP = 8
LABEL = b"tiny-cube-proof"
A_VAL, BLIND = 12345, 111

# ---- frozen vectors (host oracle, 2026-08-21; regenerate ONLY on a
# deliberate protocol change, never to "fix" a failing test) ---------------
FROZEN_V = "3ae11e63deaa22c68a3f5bd1888ac75c333b7f91cf5040eacf074d7c688e493a"
FROZEN_PROOF = (
    "00105584d069fdf0452f22145994a613a7debbeb520f640e8546eef788133d176d"
    "e4f52da34e444189bef60a3f211c0c7824a1ad6c6f39f675d01ee5d23ba51026c4"
    "5c1ddc6e8576df37310a51113c31990c2e6436892794164ea9996da9f4c15d7c35"
    "1ef8c3565aa58cba9d3ebe93c054c03ead311d220ba802c50f8e8eadf23ec061cf"
    "d1063193785badd6c977576296f76f684869732bc31dc712910bf4b81960cdb6d5"
    "143203e045218ff92457c7afdd6906de29495fb7c8939f1fa6ed8d4e465f55789c"
    "7ccc72ef1becfa0800540faf50b8170d6303fb230caa38666abf0702461b9d1234"
    "4b66c08561db870d3f8c458c7776008d87afbba132c90e13740caeb7279c542029"
    "c2db9c39b4c6e922f05ed055b1af7880cf18b4f4d2e0b49e013e90705ea69a39be"
    "9f996de1faf16d411af82a67109eaa3e15e27a47bff1c801235eb9f19615efb340"
    "ea6a85d89962230ab2d757f289b8bdb945efa09a98a307a2b2df3de1e33061a77b"
    "603fc17ef6655f2c14d22eb8e51bb72b23c859e251072a5081fd331b7931b5bdc9"
    "6165f6a60b1b9379c498822095439c55f0b22c5e27ff864e175dfd60eb0934f4a8"
    "4a7a9fd3fe1848d504cfc1a55047797c5dc6d20727ffcfef228993c090940fce3f"
    "7d98d42fb9ff24adb4e3e797b75b9e140dd302"
)
FROZEN_CHALLENGES = {
    "y": "05370f011db79981893e465e25d9d1d8c246605ae48bf7ce88e1e3df75f9daa8",
    "z": "0d09e8bd310516b3a15f99aac1969a9b6e5084c0f5f600681406d3378b477363",
    "u": "01a34b2497609c2ddf85267a1060f52f60880a0dd07d2c0f4b8e1afedfb9c3f7",
    "x": "0849cbc64bf350456b9ca156ed5709e9d498bc084e5131230c00ba820ccbda8e",
    "w": "06aa940eadd4a03becb4eda037df5c29a2563cd06b9a3516c315c5b872ac86df",
    "u_0": "09d1358a2923cd6765b72934438e8838009d155a3572f55bf54162f079178c44",
}


def cube_circuit():
    cs = VerifierCS()
    a = cs.commit_var()
    pub = cs.public_var()
    _, _, o = cs.multiply(LC.of(a), LC.of(a))
    _, _, o2 = cs.multiply(LC.of(o), LC.of(a))
    cs.constrain(LC.of(o2) - pub)
    return CompiledCircuit.compile(cs.artifact())


def cube_inputs():
    a2 = A_VAL * A_VAL % L
    a3 = a2 * A_VAL % L
    return a2, a3


def test_host_oracle_reproduces_frozen():
    circuit = cube_circuit()
    a2, a3 = cube_inputs()
    t = Transcript(LABEL)
    proof, tr = oracle.host_prove(
        circuit, t, [A_VAL], [BLIND], [A_VAL, a2], [A_VAL, A_VAL],
        [a2, a3], [a3], CAP,
    )
    assert tr.commitments[0].hex() == FROZEN_V
    assert proof.to_bytes().hex() == FROZEN_PROOF
    assert format(tr.y, "064x") == FROZEN_CHALLENGES["y"]
    assert format(tr.z, "064x") == FROZEN_CHALLENGES["z"]
    assert format(tr.u, "064x") == FROZEN_CHALLENGES["u"]
    assert format(tr.x, "064x") == FROZEN_CHALLENGES["x"]
    assert format(tr.w, "064x") == FROZEN_CHALLENGES["w"]
    assert format(tr.u_js[0], "064x") == FROZEN_CHALLENGES["u_0"]

    tv = Transcript(LABEL)
    assert oracle.host_verify(circuit, tv, proof, tr.commitments, [a3], CAP)


def test_schedule_replay_matches_frozen():
    """Replays the FROZEN schedule over the frozen proof bytes with a bare
    Transcript — no prover or verifier code — and pins every challenge.
    This is the test that fails if the schedule itself drifts."""
    proof = R1CSProof.from_bytes(bytes.fromhex(FROZEN_PROOF))
    t = Transcript(LABEL)
    r1cs_domain_sep(t)
    append_point(t, b"V", bytes.fromhex(FROZEN_V))
    t.append_u64(b"m", 1)
    append_point(t, b"A_I1", proof.A_I1)
    append_point(t, b"A_O1", proof.A_O1)
    append_point(t, b"S1", proof.S1)
    r1cs_1phase_domain_sep(t)
    append_point(t, b"A_I2", proof.A_I2)
    append_point(t, b"A_O2", proof.A_O2)
    append_point(t, b"S2", proof.S2)
    assert format(challenge_scalar(t, b"y"), "064x") == FROZEN_CHALLENGES["y"]
    assert format(challenge_scalar(t, b"z"), "064x") == FROZEN_CHALLENGES["z"]
    for label, c in zip(
        [b"T_1", b"T_3", b"T_4", b"T_5", b"T_6"],
        [proof.T_1, proof.T_3, proof.T_4, proof.T_5, proof.T_6],
    ):
        append_point(t, label, c)
    assert format(challenge_scalar(t, b"u"), "064x") == FROZEN_CHALLENGES["u"]
    assert format(challenge_scalar(t, b"x"), "064x") == FROZEN_CHALLENGES["x"]
    append_scalar(t, b"t_x", proof.t_x)
    append_scalar(t, b"t_x_blinding", proof.t_x_blinding)
    append_scalar(t, b"e_blinding", proof.e_blinding)
    assert format(challenge_scalar(t, b"w"), "064x") == FROZEN_CHALLENGES["w"]
    innerproduct_domain_sep(t, 2)
    append_point(t, b"L", proof.ipp_L[0])
    append_point(t, b"R", proof.ipp_R[0])
    assert (
        format(challenge_scalar(t, b"u"), "064x") == FROZEN_CHALLENGES["u_0"]
    )


import pytest


@pytest.mark.slow
def test_device_prover_matches_frozen():
    """The device prover must emit byte-identical output to the frozen
    oracle vectors — transcript lockstep is what makes device and host
    proofs interchangeable."""
    from dusk_blindbidproof_tpu.models.bulletproofs import (
        Prover,
        ProverWitness,
    )
    from dusk_blindbidproof_tpu.ops import limb

    circuit = cube_circuit()
    a2, a3 = cube_inputs()
    ts = [Transcript(LABEL)]
    prover = Prover(ts, cap=CAP)
    commitments = prover.commit_batch([[A_VAL]], [[BLIND]])
    witness = ProverWitness(
        a_L=limb.ints_to_limbs_fast([A_VAL, a2], (1, 2)),
        a_R=limb.ints_to_limbs_fast([A_VAL, A_VAL], (1, 2)),
        a_O=limb.ints_to_limbs_fast([a2, a3], (1, 2)),
        v=limb.ints_to_limbs_fast([A_VAL], (1, 1)),
        v_blinding=limb.ints_to_limbs_fast([BLIND], (1, 1)),
        publics=limb.ints_to_limbs_fast([a3], (1, 1)),
    )
    proofs = prover.prove(circuit, witness)
    assert commitments[0][0].hex() == FROZEN_V
    assert proofs[0].to_bytes().hex() == FROZEN_PROOF
