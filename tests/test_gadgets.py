"""Gadget-library tests: build circuits and check witness generation only
(the reference tests these the same way: generate_partial_witness and compare
values, e.g. circuit_bigint.rs:502-560, circuit_foreign_field.rs:75-117).
Witness generation is host-side, so these are fast (no proving)."""

import numpy as np
import pytest

import plonky_tpu.circuit.builder as builder_mod
from plonky_tpu.circuit import CircuitBuilder, PartialWitness
from plonky_tpu.circuit.gadgets import (
    bigint_add,
    bigint_div_rem,
    bigint_mul,
    constant_bigint,
    constant_foreign_field,
    foreign_field_add,
    foreign_field_mul,
    get_bigint_target,
    get_foreign_field_target,
)
from plonky_tpu.curves import TWEEDLEDEE, TWEEDLEDUM


@pytest.fixture(autouse=True)
def deterministic_randomness(monkeypatch):
    rng = np.random.default_rng(2718)
    monkeypatch.setattr(builder_mod, "RANDOM_SOURCE",
                        lambda p: int.from_bytes(rng.bytes(40), "little") % p)
    yield


def build_and_witness(build_fn):
    builder = CircuitBuilder(TWEEDLEDUM, security_bits=128)
    out = build_fn(builder)
    circuit = builder.build(light=True)
    pw = circuit.generate_partial_witness(PartialWitness())
    return pw, out


def test_bigint_add():
    x = 22222222222222222222222222222222222222
    y = 33333333333333333333333333333333333333

    def build(b):
        return bigint_add(b, constant_bigint(b, x), constant_bigint(b, y))

    pw, z = build_and_witness(build)
    assert get_bigint_target(pw, z) == x + y


def test_bigint_mul():
    x = 123123123123123123123123123123123123
    y = 456456456456456456456456456456456456

    def build(b):
        return bigint_mul(b, constant_bigint(b, x), constant_bigint(b, y))

    pw, z = build_and_witness(build)
    assert get_bigint_target(pw, z) == x * y


def test_bigint_div_rem():
    x = 456456456456456456456456456456456456
    y = 123123123123123123123123123123123123

    def build(b):
        return bigint_div_rem(b, constant_bigint(b, x), constant_bigint(b, y))

    pw, (d, r) = build_and_witness(build)
    assert get_bigint_target(pw, d) == x // y
    assert get_bigint_target(pw, r) == x % y


def test_foreign_field_ops():
    ff = TWEEDLEDUM.scalar  # foreign to TWEEDLEDUM's own scalar field
    rng = np.random.default_rng(5)
    x = int.from_bytes(rng.bytes(40), "little") % ff.p
    y = int.from_bytes(rng.bytes(40), "little") % ff.p

    def build(b):
        xt = constant_foreign_field(b, ff, x)
        yt = constant_foreign_field(b, ff, y)
        return (foreign_field_add(b, xt, yt), foreign_field_mul(b, xt, yt))

    pw, (s, m) = build_and_witness(build)
    assert get_foreign_field_target(pw, s) == (x + y) % ff.p
    assert get_foreign_field_target(pw, m) == x * y % ff.p


def test_builder_logic_gadgets():
    def build(b):
        t = b.add_virtual_target()
        z = b.is_zero(t)
        nz = b.is_nonzero(t)
        sel = b.select(z, b.constant_wire(10), b.constant_wire(20))
        inv = b.inv(b.constant_wire(7))
        sqrt = b.deterministic_square_root(b.constant_wire(16))
        return t, z, nz, sel, inv, sqrt

    builder = CircuitBuilder(TWEEDLEDUM, security_bits=128)
    t, z, nz, sel, inv, sqrt = build(builder)
    circuit = builder.build(light=True)
    inputs = PartialWitness()
    inputs.set_target(t, 0)
    pw = circuit.generate_partial_witness(inputs)
    p = TWEEDLEDUM.scalar.p
    assert pw.get_target(z) == 1
    assert pw.get_target(nz) == 0
    assert pw.get_target(sel) == 10
    assert pw.get_target(inv) * 7 % p == 1
    s = pw.get_target(sqrt)
    assert s * s % p == 16 and s % 2 == 0
