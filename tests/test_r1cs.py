"""R1CS builder + gadget library: constraint budget and witness checks."""

from dusk_blindbidproof_tpu.models import gadgets
from dusk_blindbidproof_tpu.models.constants import mimc_constants
from dusk_blindbidproof_tpu.models.gadgets import mimc_hash, proof_gadget
from dusk_blindbidproof_tpu.models.r1cs import (
    LC,
    ProverCS,
    VarKind,
    VerifierCS,
)
from dusk_blindbidproof_tpu.utils.curve_host import L, scalar_invert


def test_mimc_constants_pinned():
    """First-party derivation (mod.rs:7-24) — deterministic chain."""
    c = mimc_constants()
    assert len(c) == 90
    assert len(set(c)) == 90
    # regression pin: recompute independently
    import hashlib

    h = hashlib.sha512(b"blind bid").digest()
    first = int.from_bytes(h, "little") % L
    assert c[0] == first


def _build(cs, inputs, list_len=4, toggle_idx=2):
    """Synthesize the full blindbid circuit on `cs`."""
    consts = mimc_constants()
    d, k, seed = inputs["d"], inputs["k"], inputs["seed"]
    m = mimc_hash(k, 0, consts)
    x = mimc_hash(d, m, consts)
    y = mimc_hash(seed, x, consts)
    z = mimc_hash(seed, m, consts)
    y_inv = scalar_invert(y)
    q = d * y_inv % L
    items = [(x if i == toggle_idx else 1000 + i) for i in range(list_len)]
    toggles = [1 if i == toggle_idx else 0 for i in range(list_len)]

    if isinstance(cs, ProverCS):
        raise RuntimeError("use _build_prover")
    t_vars = [cs.commit_var() for _ in range(4)]  # d, k, y, y_inv
    tog_vars = [cs.commit_var() for _ in range(list_len)]
    proof_gadget(
        cs,
        t_vars[0],
        t_vars[1],
        t_vars[3],
        LC.of(q),
        LC.of(z),
        LC.of(seed),
        consts,
        tog_vars,
        [LC.of(v) for v in items],
    )
    return cs


def _build_prover(inputs, list_len=4, toggle_idx=2, corrupt=False):
    consts = mimc_constants()
    d, k, seed = inputs["d"], inputs["k"], inputs["seed"]
    m = mimc_hash(k, 0, consts)
    x = mimc_hash(d, m, consts)
    y = mimc_hash(seed, x, consts)
    z = mimc_hash(seed, m, consts)
    y_inv = scalar_invert(y)
    q = d * y_inv % L
    if corrupt:
        q = (q + 1) % L
    items = [(x if i == toggle_idx else 1000 + i) for i in range(list_len)]
    toggles = [1 if i == toggle_idx else 0 for i in range(list_len)]

    committed = [d, k, y, y_inv] + toggles
    cs = ProverCS(committed)
    from dusk_blindbidproof_tpu.models.r1cs import Variable

    vars_ = [Variable(VarKind.COMMITTED, i) for i in range(4)]
    tog_vars = [Variable(VarKind.COMMITTED, 4 + i) for i in range(list_len)]
    proof_gadget(
        cs,
        vars_[0],
        vars_[1],
        vars_[3],
        LC.of(q),
        LC.of(z),
        LC.of(seed),
        consts,
        tog_vars,
        [LC.of(v) for v in items],
    )
    return cs


def test_constraint_budget_matches_survey():
    """SURVEY.md §8.2: 1442 + 3L multiplication gates."""
    for list_len in (1, 4, 7):
        cs = _build(VerifierCS(), {"d": 5, "k": 7, "seed": 9}, list_len=list_len,
                    toggle_idx=0)
        assert cs.num_gates == 1442 + 3 * list_len, list_len
        # constraints: 2 wire bindings per gate + L booleanity + (L-1) prefix
        # + 1 sum + L membership + 1 z_img + 2 score  (SURVEY.md §8.2)
        expected_extra = 3 * list_len + 3
        assert len(cs.constraints) == 2 * cs.num_gates + expected_extra


def test_prover_witness_satisfies():
    cs = _build_prover({"d": 123456, "k": 789, "seed": 4242})
    assert cs.check_satisfied()
    assert len(cs.a_L) == cs.num_gates
    # all gates multiply correctly
    assert all(
        (l * r - o) % L == 0 for l, r, o in zip(cs.a_L, cs.a_R, cs.a_O)
    )


def test_prover_witness_detects_corruption():
    cs = _build_prover({"d": 123456, "k": 789, "seed": 4242}, corrupt=True)
    assert not cs.check_satisfied()


def test_prover_verifier_same_shape():
    inputs = {"d": 11, "k": 22, "seed": 33}
    p = _build_prover(inputs)
    v = _build(VerifierCS(), inputs)
    assert p.num_gates == v.num_gates
    assert len(p.constraints) == len(v.constraints)
    pa, va = p.artifact(), v.artifact()
    for kind in pa.entries:
        pq, pi, pc = pa.entries[kind]
        vq, vi, vc = va.entries[kind]
        assert (pq == vq).all() and (pi == vi).all() and pc == vc


def test_artifact_flattening_identity():
    """For a satisfied witness, <wL,aL>+<wR,aR>+<wO,aO> == <wV,v> + wc for
    random z (the flattening sign conventions)."""
    import random

    rng = random.Random(7)
    cs = _build_prover({"d": 3, "k": 4, "seed": 5})
    art = cs.artifact()
    z = rng.randrange(1, L)
    zq = [pow(z, q + 1, L) for q in range(art.n_constraints)]

    wL = [0] * art.n_gates
    wR = [0] * art.n_gates
    wO = [0] * art.n_gates
    wV = [0] * art.n_committed
    wc = 0
    for kind, (qs, idxs, coeffs) in art.entries.items():
        for q, i, c in zip(qs, idxs, coeffs):
            term = zq[q] * c % L
            if kind == VarKind.MUL_LEFT:
                wL[i] = (wL[i] + term) % L
            elif kind == VarKind.MUL_RIGHT:
                wR[i] = (wR[i] + term) % L
            elif kind == VarKind.MUL_OUT:
                wO[i] = (wO[i] + term) % L
            elif kind == VarKind.COMMITTED:
                wV[i] = (wV[i] - term) % L
            else:
                wc = (wc - term) % L

    lhs = (
        sum(w * a for w, a in zip(wL, cs.a_L))
        + sum(w * a for w, a in zip(wR, cs.a_R))
        + sum(w * a for w, a in zip(wO, cs.a_O))
    ) % L
    rhs = (sum(w * v for w, v in zip(wV, cs.v)) + wc) % L
    assert lhs == rhs
