"""Recursion layer tests (reference: src/plonk_recursion.rs,
plonk_challenger.rs:230-277).

The key assets:
* RecursiveChallenger produces bit-identical challenges to the host
  Challenger (the reference's consistency-test pattern) -- this is what lets
  a recursion circuit replay an inner proof's transcript.
* The full recursion circuit, populated from a REAL inner proof, yields a
  witness satisfying every gate constraint (checked row by row on host).
  The reference can't do this (its recursive e2e test is #[ignore]d); here
  satisfaction means a recursive proof can actually be generated.
* verify_assumptions -- the NEXT level's native re-checks of everything the
  recursion circuit deferred -- is satisfied by the level-1 circuit's real
  exported public inputs, closing the deferral loop.
"""

import numpy as np
import pytest

import plonky_tpu.circuit.builder as builder_mod
import plonky_tpu.protocol.halo as halo_mod
from plonky_tpu.circuit import CircuitBuilder, PartialWitness
from plonky_tpu.curves import TWEEDLEDEE, TWEEDLEDUM
from plonky_tpu.hashing.challenger import Challenger, RecursiveChallenger
from plonky_tpu.protocol import generate_proof, verify_proof
from plonky_tpu.protocol.checks import (
    check_circuit_constraints,
    check_copy_constraints,
)
from plonky_tpu.protocol.recursion import (
    recursive_verification_circuit,
    verify_assumptions,
    verify_assumptions_native,
)
from plonky_tpu.protocol.verifier import VerificationError

SECURITY_BITS = 128


@pytest.fixture(scope="module")
def pinned_randomness():
    rng = np.random.default_rng(271828)

    def fake_random(p):
        return int.from_bytes(rng.bytes(40), "little") % p

    old_b, old_h = builder_mod.RANDOM_SOURCE, halo_mod.RANDOM_SOURCE
    builder_mod.RANDOM_SOURCE = fake_random
    halo_mod.RANDOM_SOURCE = fake_random
    yield
    builder_mod.RANDOM_SOURCE, halo_mod.RANDOM_SOURCE = old_b, old_h


def test_recursive_challenger_matches_native():
    """reference: plonk_challenger.rs:230-277 (challenger consistency)."""
    spec = TWEEDLEDEE.scalar
    inputs = [5, 7, 11, 13, 17, 19, 23]

    native = Challenger(spec, SECURITY_BITS)
    native.observe_elements(inputs[:2])
    expected = [native.get_challenge()]
    native.observe_elements(inputs[2:])
    expected += native.get_n_challenges(4)

    b = CircuitBuilder(TWEEDLEDEE, SECURITY_BITS)
    rc = RecursiveChallenger(b)
    in_targets = [b.constant_wire(v) for v in inputs]
    rc.observe_elements(in_targets[:2])
    got_targets = [rc.get_challenge()]
    rc.observe_elements(in_targets[2:])
    got_targets += rc.get_n_challenges(4)
    circuit = b.build(light=True)
    pw = circuit.generate_partial_witness(PartialWitness())
    got = [pw.get_target(t) for t in got_targets]
    assert got == expected


@pytest.fixture(scope="module")
def level1(pinned_randomness):
    """A real inner proof and the level-1 recursion circuit's witness."""
    ib = CircuitBuilder(TWEEDLEDUM, SECURITY_BITS)
    t = ib.constant_wire(42)
    ib.assert_zero(ib.sub(t, ib.constant_wire(42)))
    inner_circuit = ib.build(inner_curve=TWEEDLEDEE)
    inner_witness = inner_circuit.generate_witness(PartialWitness())
    inner_proof = generate_proof(inner_circuit, inner_witness,
                                 old_proofs=[], blinding=True)
    inner_vk = inner_circuit.to_vk()
    # sanity: the inner proof verifies natively
    verify_proof([], inner_proof, [], inner_vk, TWEEDLEDEE, verify_g=True)

    rc = recursive_verification_circuit(
        TWEEDLEDEE, TWEEDLEDUM, inner_circuit.degree_pow(), SECURITY_BITS,
        num_public_inputs=0, num_old_proofs=0, inner_vk=inner_vk,
        light=True)
    inputs = PartialWitness()
    rc.proof.populate_witness(inputs, inner_proof, [])
    witness = rc.circuit.generate_witness(inputs)
    return inner_circuit, inner_proof, rc, witness


def test_recursion_circuit_satisfiable(level1):
    """Every gate constraint of the recursion circuit holds on the witness
    populated from a real inner proof, and the exported deferred data
    matches the native verifier's values."""
    inner_circuit, inner_proof, rc, witness = level1
    check_circuit_constraints(rc.circuit, witness)
    check_copy_constraints(rc.circuit, witness)

    challs = inner_proof.get_challenges(TWEEDLEDUM, [], [])
    pis = rc.circuit.get_public_inputs(witness)
    p = rc.public_inputs
    assert pis[p.beta.index] == challs.beta
    assert pis[p.gamma.index] == challs.gamma
    assert pis[p.alpha.index] == challs.alpha
    assert pis[p.zeta.index] == challs.zeta
    assert pis[p.v.index] == challs.v
    assert pis[p.u.index] == challs.u
    assert pis[p.u_scaling.index] == challs.u_scaling
    assert [pis[x.index] for x in p.halo_us] == challs.halo_us
    assert [pis[x.index] for x in p.o_constants] == \
        inner_proof.o_local.o_constants
    assert [pis[x.index] for x in p.o_plonk_t] == inner_proof.o_local.o_plonk_t


def test_verify_assumptions_on_real_exports(level1):
    """Level 2 of the chain: a circuit over Tweedledum containing ONLY
    verify_assumptions, fed the level-1 circuit's real exported public
    inputs, is satisfied -- i.e. the next proof in the cycle can natively
    re-check everything level 1 deferred (quotient identity, u-power chain,
    opening reductions, IPA square roots/inverses, halo_b)."""
    inner_circuit, _inner_proof, rc, witness = level1
    pis = rc.circuit.get_public_inputs(witness)

    b2 = CircuitBuilder(TWEEDLEDUM, SECURITY_BITS)
    pi_targets = b2.add_virtual_targets(len(pis))
    verify_assumptions(b2, TWEEDLEDEE, inner_circuit.degree_pow(),
                       pi_targets, num_old_proofs=0, num_inner_pis=0)
    c2 = b2.build(inner_curve=TWEEDLEDEE, light=True)
    inputs = PartialWitness()
    inputs.set_targets(pi_targets, pis)
    w2 = c2.generate_witness(inputs)
    check_circuit_constraints(c2, w2)
    check_copy_constraints(c2, w2)


def test_verify_assumptions_native_matches_circuit(level1):
    """Host-native chain termination: verify_assumptions_native accepts
    exactly the exports the in-circuit verify_assumptions accepts (same
    seven checks, plain modular arithmetic -- the terminal API the
    reference lacks), and rejects a corrupted export."""
    inner_circuit, _inner_proof, rc, witness = level1
    pis = rc.circuit.get_public_inputs(witness)

    # accepts the real exports (the circuit version accepts them too,
    # test_verify_assumptions_on_real_exports above)
    verify_assumptions_native(pis, TWEEDLEDUM, TWEEDLEDEE,
                              inner_circuit.degree_pow())

    # rejects any single corrupted value (spot-check a few positions that
    # exercise different checks: alpha -> quotient identity, an opening ->
    # reduction, a halo_u -> IPA sqrt)
    for idx in (2, 20, len(pis) - 1):
        bad = list(pis)
        bad[idx] = (bad[idx] + 1) % TWEEDLEDUM.scalar.p
        with pytest.raises(VerificationError):
            verify_assumptions_native(bad, TWEEDLEDUM, TWEEDLEDEE,
                                      inner_circuit.degree_pow())
