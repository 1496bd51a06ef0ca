"""BlindBid end-to-end: witness cross-check (host) and full prove+verify.

The full-circuit test is the SURVEY.md §7 step-7 milestone gate ("one model
running end-to-end"): n = 2048 gates, so it is the slowest test in the suite
(one big compile + real MSM work on CPU).
"""

import numpy as np
import pytest

from dusk_blindbidproof_tpu.models import blindbid
from dusk_blindbidproof_tpu.models.blindbid import (
    ProveRequest,
    VerifyRequest,
    blindbid_circuit,
    blindbid_witness,
    make_prove_request,
    prove_batch,
    verify_batch,
)
from dusk_blindbidproof_tpu.models.constants import mimc_constants
from dusk_blindbidproof_tpu.models.gadgets import proof_gadget
from dusk_blindbidproof_tpu.models.r1cs import LC, ProverCS, Variable, VarKind
from dusk_blindbidproof_tpu.utils.curve_host import L


def _req(list_len=4, toggle=2):
    return make_prove_request(
        d=123456789,
        k=987654321,
        seed=55555,
        pub_list_extra=[1000 + i for i in range(list_len - 1)],
        toggle_pos=toggle,
    )


def test_witness_matches_generic_cs():
    """Dedicated witness generator == generic ProverCS evaluation."""
    req = _req()
    list_len = len(req.pub_list)
    committed = [req.d, req.k, req.y, req.y_inv] + [
        1 if i == req.toggle else 0 for i in range(list_len)
    ]
    publics = [req.q, req.z_img, req.seed] + [v % L for v in req.pub_list]
    cs = ProverCS(committed, publics)
    v = [Variable(VarKind.COMMITTED, i) for i in range(4)]
    toggles = [Variable(VarKind.COMMITTED, 4 + i) for i in range(list_len)]
    pub_vars = [Variable(VarKind.PUBLIC, i) for i in range(len(publics))]
    proof_gadget(
        cs,
        v[0],
        v[1],
        v[3],
        pub_vars[0],
        pub_vars[1],
        pub_vars[2],
        mimc_constants(),
        toggles,
        [LC.of(pv) for pv in pub_vars[3:]],
    )
    assert cs.check_satisfied()
    aL, aR, aO = blindbid_witness(req)
    assert aL == cs.a_L
    assert aR == cs.a_R
    assert aO == cs.a_O


def test_witness_unsatisfied_on_bad_score():
    req = _req()
    req.q = (req.q + 1) % L  # corrupt the public score
    # witness generation still succeeds, but the constraint system must fail
    list_len = len(req.pub_list)
    committed = [req.d, req.k, req.y, req.y_inv] + [
        1 if i == req.toggle else 0 for i in range(list_len)
    ]
    publics = [req.q, req.z_img, req.seed] + [v % L for v in req.pub_list]
    cs = ProverCS(committed, publics)
    v = [Variable(VarKind.COMMITTED, i) for i in range(4)]
    toggles = [Variable(VarKind.COMMITTED, 4 + i) for i in range(list_len)]
    pub_vars = [Variable(VarKind.PUBLIC, i) for i in range(len(publics))]
    proof_gadget(
        cs, v[0], v[1], v[3], pub_vars[0], pub_vars[1], pub_vars[2],
        mimc_constants(), toggles, [LC.of(pv) for pv in pub_vars[3:]],
    )
    assert not cs.check_satisfied()


def test_circuit_shape_cached():
    c1 = blindbid_circuit(4)
    c2 = blindbid_circuit(4)
    assert c1 is c2
    assert c1.n1 == 1442 + 3 * 4
    assert c1.n_pad == 2048
    assert c1.m == 8
    assert c1.n_pub == 7


@pytest.mark.slow
def test_blindbid_prove_verify_end_to_end():
    """The full n=2048 circuit: prove, verify-accept, verify-reject."""
    req = _req()
    rng = np.random.default_rng(42)
    proofs = prove_batch([req], rng=rng)
    assert len(proofs) == 1
    proof = proofs[0]
    assert len(proof.commitments) == 4
    assert len(proof.t_c) == len(req.pub_list)
    assert len(proof.r1cs.ipp_L) == 11  # log2(2048)

    vreq = VerifyRequest(
        proof=proof, score=req.q, z_img=req.z_img, seed=req.seed,
        pub_list=req.pub_list,
    )
    assert verify_batch([vreq]) == [True]

    # wrong seed -> reject
    bad = VerifyRequest(
        proof=proof, score=req.q, z_img=req.z_img, seed=req.seed + 1,
        pub_list=req.pub_list,
    )
    assert verify_batch([bad]) == [False]

    # wrong list -> reject
    bad_list = list(req.pub_list)
    bad_list[0] = (bad_list[0] + 1) % L
    bad = VerifyRequest(
        proof=proof, score=req.q, z_img=req.z_img, seed=req.seed,
        pub_list=bad_list,
    )
    assert verify_batch([bad]) == [False]
