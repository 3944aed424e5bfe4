"""End-to-end prove -> verify of circuits using the gadget families
(reference: tests/prove_and_verify.rs:286-470 -- Rescue hash in-circuit vs
native, curve add / double / MSM gadgets vs native ops, Base4Sum range
checks).  These go through the REAL device proving pipeline, not just
light-mode constraint checks."""

import numpy as np
import pytest

import plonky_tpu.circuit.builder as builder_mod
import plonky_tpu.protocol.halo as halo_mod
from plonky_tpu.circuit import CircuitBuilder, PartialWitness
from plonky_tpu.circuit.gadgets.curve import (
    CurveMulOp,
    constant_affine_point,
    curve_add,
    curve_double,
    curve_msm,
)
from plonky_tpu.curves import TWEEDLEDEE, TWEEDLEDUM
from plonky_tpu.curves import host as chost
from plonky_tpu.hashing.rescue import rescue_hash_n_to_1_host
from plonky_tpu.protocol import generate_proof, verify_proof


@pytest.fixture(autouse=True)
def deterministic_randomness(monkeypatch):
    rng = np.random.default_rng(271828)

    def fake_random(p):
        return int.from_bytes(rng.bytes(40), "little") % p

    monkeypatch.setattr(builder_mod, "RANDOM_SOURCE", fake_random)
    monkeypatch.setattr(halo_mod, "RANDOM_SOURCE", fake_random)
    yield


def _prove_verify(builder, witness_inputs, expected_pis):
    circuit = builder.build()
    witness = circuit.generate_witness(witness_inputs)
    pis = circuit.get_public_inputs(witness)
    assert pis == expected_pis
    proof = generate_proof(circuit, witness, old_proofs=[], blinding=True)
    assert verify_proof(pis, proof, [], circuit.to_vk(), TWEEDLEDUM,
                        verify_g=True) is None
    return circuit


def test_proof_rescue_gadget():
    """In-circuit Rescue sponge equals the native hash
    (reference: prove_and_verify.rs:286-307)."""
    spec = TWEEDLEDEE.scalar
    ins = [12345, 67890]
    want = rescue_hash_n_to_1_host(spec, ins, 128)

    b = CircuitBuilder(TWEEDLEDEE, security_bits=128)
    t_ins = [b.constant_wire(v) for v in ins]
    out = b.rescue_hash_n_to_1(t_ins)
    pi = b.add_public_input()
    b.copy(out, pi)
    _prove_verify(b, PartialWitness(), [want])


def test_proof_curve_add_gadget():
    """In-circuit curve add equals the native add
    (reference: prove_and_verify.rs:310-...)."""
    g = chost.generator(TWEEDLEDUM)
    p1 = chost.mul(g, 7)
    p2 = chost.mul(g, 11)
    want = chost.add(p1, p2)

    b = CircuitBuilder(TWEEDLEDEE, security_bits=128)
    t1 = constant_affine_point(b, p1)
    t2 = constant_affine_point(b, p2)
    s = curve_add(b, t1, t2)
    pix, piy = b.add_public_input(), b.add_public_input()
    b.copy(s.x, pix)
    b.copy(s.y, piy)
    _prove_verify(b, PartialWitness(), [want.x, want.y])


def test_proof_curve_double_gadget():
    g = chost.generator(TWEEDLEDUM)
    p1 = chost.mul(g, 5)
    want = chost.add(p1, p1)

    b = CircuitBuilder(TWEEDLEDEE, security_bits=128)
    t1 = constant_affine_point(b, p1)
    d = curve_double(b, t1)
    pix, piy = b.add_public_input(), b.add_public_input()
    b.copy(d.x, pix)
    b.copy(d.y, piy)
    _prove_verify(b, PartialWitness(), [want.x, want.y])


def test_proof_base4sum_range_check():
    """assert_dibit_length (Base4SumGate range check) through the real
    pipeline (reference: prove_and_verify.rs:387 uses Base4Sum)."""
    b = CircuitBuilder(TWEEDLEDEE, security_bits=128)
    x = b.add_virtual_target()
    b.assert_dibit_length(x, 8)   # x < 4^8
    pi = b.add_public_input()
    b.copy(x, pi)
    w = PartialWitness()
    w.set_target(x, 54321)
    _prove_verify(b, w, [54321])


@pytest.mark.slow
def test_proof_curve_msm_gadget():
    """In-circuit bit-serial MSM (CurveAdd/CurveDbl gates over full-width
    scalars) equals the native MSM (reference: prove_and_verify.rs:310-470).
    Degree ~2^11: the heaviest e2e gadget proof."""
    g = chost.generator(TWEEDLEDUM)
    p1 = chost.mul(g, 3)
    p2 = chost.mul(g, 19)
    s1, s2 = 123456789, 987654321
    want = chost.add(chost.mul(p1, s1), chost.mul(p2, s2))

    b = CircuitBuilder(TWEEDLEDEE, security_bits=128)
    t1 = constant_affine_point(b, p1)
    t2 = constant_affine_point(b, p2)
    ts1 = b.constant_wire(s1)
    ts2 = b.constant_wire(s2)
    r = curve_msm(b, TWEEDLEDUM,
                  [CurveMulOp(ts1, t1), CurveMulOp(ts2, t2)])
    pix, piy = b.add_public_input(), b.add_public_input()
    b.copy(r.x, pix)
    b.copy(r.y, piy)
    _prove_verify(b, PartialWitness(), [want.x, want.y])
