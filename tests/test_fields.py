"""Field kernel tests vs python-int oracle.

Port of the reference's oracle-test pattern (src/field/field.rs:486-780
`field_tests` + `test_arithmetic!`): adversarial carry-heavy inputs near word
boundaries, checked against exact big-int arithmetic.
"""

import jax
import numpy as np
import pytest

from plonky_tpu.fields import (
    ALL_FIELDS,
    BLS12_377_BASE,
    TWEEDLEDEE_BASE,
    host,
    ops,
)


def adversarial_inputs(p: int, n: int = 48):
    """Inputs that generate lots of carries, especially at digit/word
    boundaries (mirrors field_tests::test_inputs)."""
    vals = [0, 1, 2, 3, p - 1, p - 2, p // 2, (p - 1) // 2]
    for word in (8, 32, 64, 128, 256):
        for k in range(1, p.bit_length() // word + 1):
            b = 1 << (word * k)
            vals += [b % p, (b - 1) % p, (b + 1) % p, (p - b) % p]
    rng = np.random.default_rng(1234)
    for _ in range(n):
        vals.append(int.from_bytes(rng.bytes(40), "little") % p)
    return vals


@pytest.mark.parametrize("spec", ALL_FIELDS, ids=lambda s: s.name)
def test_add_sub_mul(spec):
    p = spec.p
    vals = adversarial_inputs(p, n=16)
    a_ints = vals
    b_ints = list(reversed(vals))
    a = ops.from_ints(spec, a_ints)
    b = ops.from_ints(spec, b_ints)

    got_add = ops.to_ints(spec, ops.jitted('add', spec)(a, b))
    got_sub = ops.to_ints(spec, ops.jitted('sub', spec)(a, b))
    got_mul = ops.to_ints(spec, ops.jitted('mul', spec)(a, b))
    got_neg = ops.to_ints(spec, ops.jitted('neg', spec)(b))

    for i, (x, y) in enumerate(zip(a_ints, b_ints)):
        assert got_add[i] == (x + y) % p, f"add {i}"
        assert got_sub[i] == (x - y) % p, f"sub {i}"
        assert got_mul[i] == (x * y) % p, f"mul {i}"
        assert got_neg[i] == (-y) % p, f"neg {i}"


@pytest.mark.parametrize("spec", ALL_FIELDS, ids=lambda s: s.name)
def test_canonicalize_and_eq(spec):
    p = spec.p
    vals = [0, 1, p - 1, p // 3]
    a = ops.from_ints(spec, vals)
    z = ops.jitted('sub', spec)(a, a)
    assert bool(np.all(np.asarray(ops.jitted('is_zero', spec)(z))))
    assert bool(np.all(np.asarray(ops.jitted('eq', spec)(a, a))))


@pytest.mark.parametrize("spec", [TWEEDLEDEE_BASE, BLS12_377_BASE], ids=lambda s: s.name)
def test_inverse_exp(spec):
    p = spec.p
    vals = [1, 2, 5, p - 1, p // 2, 123456789123456789 % p]
    a = ops.from_ints(spec, vals)
    inv = ops.to_ints(spec, ops.jitted('inverse', spec)(a))
    for i, x in enumerate(vals):
        assert inv[i] == pow(x, -1, p), f"inverse {i}"

    e = 0xDEADBEEF12345
    got = ops.to_ints(spec, jax.jit(lambda t: ops.exp_const(spec, t, e))(a))
    for i, x in enumerate(vals):
        assert got[i] == pow(x, e, p)


def test_kth_root_matches_host():
    spec = TWEEDLEDEE_BASE
    p = spec.p
    vals = [2, 7, p - 3]
    a = ops.from_ints(spec, vals)
    got = ops.to_ints(spec, jax.jit(lambda t: ops.kth_root(spec, t, spec.alpha))(a))
    for i, x in enumerate(vals):
        r = host.kth_root(spec, x, spec.alpha)
        assert got[i] == r
        assert pow(r, spec.alpha, p) == x


def test_host_sqrt_and_roots():
    spec = TWEEDLEDEE_BASE
    p = spec.p
    for x in [4, 9, 2, 12345]:
        s = host.square_root(spec, (x * x) % p)
        assert s is not None and (s * s) % p == (x * x) % p
    assert host.square_root(spec, 0) == 0
    for k in (1, 2, 10, spec.two_adicity):
        w = host.primitive_root_of_unity(spec, k)
        assert pow(w, 1 << k, p) == 1
        if k > 0:
            assert pow(w, 1 << (k - 1), p) != 1


def test_to_bits():
    spec = TWEEDLEDEE_BASE
    vals = [0, 1, 0b101101, spec.p - 1]
    a = ops.from_ints(spec, vals)
    bits = np.asarray(jax.jit(lambda t: ops.to_bits(spec, t, 255))(a))
    for i, v in enumerate(vals):
        got = sum(int(bits[j, i]) << j for j in range(255))
        assert got == v


def test_batch_inverse_host():
    spec = TWEEDLEDEE_BASE
    xs = [3, 19, spec.p - 5, 1]
    out = host.batch_inverse(spec, xs)
    for x, y in zip(xs, out):
        assert x * y % spec.p == 1
