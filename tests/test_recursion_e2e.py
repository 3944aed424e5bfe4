"""End-to-end RECURSIVE proof: generate and verify a level-1 recursion
proof -- a proof (over Tweedledee) of a circuit that verifies an inner
proof (over Tweedledum).

The reference ships this only as an #[ignore]d test
(tests/prove_and_verify_recursive.rs, "Fails for the moment") and a demo
binary with dummy vk constants (plonk_recursion.rs:235-239); here the real
inner vk is wired and the recursive proof verifies.  Marked slow: the
recursion circuit has degree 2^15."""

import numpy as np
import pytest

import plonky_tpu.circuit.builder as builder_mod
import plonky_tpu.protocol.halo as halo_mod
from plonky_tpu.circuit import CircuitBuilder, PartialWitness
from plonky_tpu.circuit.gates import BufferGate
from plonky_tpu.curves import TWEEDLEDEE, TWEEDLEDUM
from plonky_tpu.protocol import generate_proof, verify_proof
from plonky_tpu.protocol.recursion import recursive_verification_circuit

INNER_DEGREE_POW = 8


@pytest.fixture(autouse=True)
def pinned_randomness(monkeypatch):
    rng = np.random.default_rng(161803)

    def fake_random(p):
        return int.from_bytes(rng.bytes(40), "little") % p

    monkeypatch.setattr(builder_mod, "RANDOM_SOURCE", fake_random)
    monkeypatch.setattr(halo_mod, "RANDOM_SOURCE", fake_random)
    yield


@pytest.mark.slow
def test_level1_recursion_proof_end_to_end():
    # inner: trivial circuit over Tweedledum, padded to 2^8 gates
    builder = CircuitBuilder(TWEEDLEDUM, security_bits=128)
    while builder.num_gates() < (1 << INNER_DEGREE_POW) - 3:
        builder.add_gate_no_constants(BufferGate(builder.num_gates()))
    inner_circuit = builder.build(inner_curve=TWEEDLEDEE)
    inner_witness = inner_circuit.generate_witness(PartialWitness())
    inner_proof = generate_proof(inner_circuit, inner_witness,
                                 old_proofs=[], blinding=True)
    inner_vk = inner_circuit.to_vk()
    assert verify_proof([], inner_proof, [], inner_vk, TWEEDLEDEE,
                        verify_g=True) is None

    # level 1: circuit over Tweedledee verifying the inner proof
    rc = recursive_verification_circuit(
        TWEEDLEDEE, TWEEDLEDUM, inner_circuit.degree_pow(),
        security_bits=128, num_public_inputs=0, num_old_proofs=0,
        inner_vk=inner_vk)
    inputs = PartialWitness()
    rc.proof.populate_witness(inputs, inner_proof, [])
    recursion_witness = rc.circuit.generate_witness(inputs)
    pis1 = rc.circuit.get_public_inputs(recursion_witness)

    recursion_proof = generate_proof(rc.circuit, recursion_witness,
                                     old_proofs=[], blinding=True)
    vk1 = rc.circuit.to_vk()
    assert verify_proof(pis1, recursion_proof, [], vk1, TWEEDLEDUM,
                        verify_g=True) is None
