"""FFT / polynomial tests vs naive host evaluation
(the reference's pattern: src/fft.rs:164-232, src/polynomial.rs:405-529)."""

import jax
import numpy as np
import pytest

from plonky_tpu.fields import TWEEDLEDEE_BASE as SPEC, host as fhost, ops as fops
from plonky_tpu.poly import (
    FftPrecomputation,
    divide_by_z_h,
    eval_at,
    eval_host,
    fft,
    ifft,
    mul_polys,
    powers_device,
)


def naive_eval_all(coeffs, points, p):
    return [eval_host(SPEC, coeffs, x) for x in points]


@pytest.mark.parametrize("lg_n", [1, 3, 5])
def test_fft_vs_naive(lg_n):
    n = 1 << lg_n
    p = SPEC.p
    rng = np.random.default_rng(7)
    coeffs = [int.from_bytes(rng.bytes(40), "little") % p for _ in range(n)]
    pre = FftPrecomputation(SPEC, n)
    dev = fops.from_ints(SPEC, coeffs)
    vals = fops.to_ints(SPEC, jax.jit(lambda c: fft(pre, c))(dev))
    expected = naive_eval_all(coeffs, pre.subgroup, p)
    assert list(vals) == expected

    # round trip
    back = fops.to_ints(SPEC, jax.jit(lambda v: ifft(pre, v))(
        fops.from_ints(SPEC, expected)))
    assert list(back) == coeffs


def test_fft_batched():
    n = 8
    p = SPEC.p
    pre = FftPrecomputation(SPEC, n)
    rng = np.random.default_rng(8)
    polys = [[int.from_bytes(rng.bytes(40), "little") % p for _ in range(n)]
             for _ in range(3)]
    dev = jax.numpy.stack([fops.from_ints(SPEC, c) for c in polys], axis=1)
    vals = jax.jit(lambda c: fft(pre, c))(dev)
    for i, c in enumerate(polys):
        got = fops.to_ints(SPEC, vals[:, i])
        assert list(got) == naive_eval_all(c, pre.subgroup, p)


def test_powers_device():
    base = 12345
    pw = fops.to_ints(SPEC, jax.jit(lambda: powers_device(SPEC, base, 11))())
    cur = 1
    for i in range(11):
        assert pw[i] == cur
        cur = cur * base % SPEC.p


def test_eval_at():
    p = SPEC.p
    coeffs = [5, 0, 3, p - 2]
    z = 987654321
    got = fops.to_ints(SPEC, jax.jit(
        lambda c: eval_at(SPEC, c, z))(fops.from_ints(SPEC, coeffs)))
    assert got == eval_host(SPEC, coeffs, z)


def test_mul_polys():
    p = SPEC.p
    a = [1, 2, 3]
    b = [5, 7]
    prod = fops.to_ints(SPEC, jax.jit(lambda x, y: mul_polys(SPEC, x, y))(
        fops.from_ints(SPEC, a), fops.from_ints(SPEC, b)))
    # (1+2x+3x^2)(5+7x) = 5 + 17x + 29x^2 + 21x^3
    assert list(prod)[:4] == [5, 17, 29, 21]
    assert all(v == 0 for v in list(prod)[4:])


def test_divide_by_z_h():
    # build t(X) = q(X) * (X^n - 1) and recover q
    p = SPEC.p
    n = 4
    rng = np.random.default_rng(9)
    q = [int.from_bytes(rng.bytes(40), "little") % p for _ in range(3 * n)]
    # t = q*(X^n - 1): coefficients t_i = q_{i-n} - q_i
    N = 4 * n
    t = [0] * N
    for i, qi in enumerate(q):
        t[i] = (t[i] - qi) % p
        t[i + n] = (t[i + n] + qi) % p
    got = fops.to_ints(SPEC, jax.jit(
        lambda c: divide_by_z_h(SPEC, c, n))(fops.from_ints(SPEC, t)))
    assert list(got)[:len(q)] == q
    assert all(v == 0 for v in list(got)[len(q):])


def test_powers_dyn_and_eval_at_dyn():
    from plonky_tpu.poly import eval_at_dyn, powers_dyn
    p = SPEC.p
    base = 31415926535
    pw = fops.to_ints(SPEC, jax.jit(
        lambda b: powers_dyn(SPEC, b, 9))(fops.from_ints(SPEC, [base])))
    cur = 1
    for i in range(9):
        assert pw[i] == cur
        cur = cur * base % p
    coeffs = [7, 11, p - 1, 0, 123456789]
    z = 271828182845
    got = fops.to_ints(SPEC, jax.jit(
        lambda c, zz: eval_at_dyn(SPEC, c, zz))(
            fops.from_ints(SPEC, coeffs), fops.from_ints(SPEC, [z])))
    assert got == eval_host(SPEC, coeffs, z)


def test_inv_mod_xn():
    from plonky_tpu.poly import inv_mod_xn
    p = SPEC.p
    rng = np.random.default_rng(10)
    f = [int.from_bytes(rng.bytes(40), "little") % p for _ in range(6)]
    f[0] |= 1  # ensure nonzero constant term
    n = 11
    g = fops.to_ints(SPEC, jax.jit(
        lambda x: inv_mod_xn(SPEC, x, n))(fops.from_ints(SPEC, f)))
    # host power-series product check: (f*g) mod x^n == 1
    prod = [0] * n
    for i, fi in enumerate(f):
        for j, gj in enumerate(g):
            if i + j < n:
                prod[i + j] = (prod[i + j] + fi * gj) % p
    assert prod == [1] + [0] * (n - 1)


def test_polynomial_division():
    from plonky_tpu.poly import polynomial_division
    p = SPEC.p
    rng = np.random.default_rng(11)
    deg_a, deg_b = 12, 5
    a = [int.from_bytes(rng.bytes(40), "little") % p for _ in range(deg_a + 1)]
    b = [int.from_bytes(rng.bytes(40), "little") % p for _ in range(deg_b + 1)]
    a[-1] |= 1
    b[-1] |= 1
    q, r = polynomial_division(SPEC, fops.from_ints(SPEC, a),
                               fops.from_ints(SPEC, b), deg_a, deg_b)
    qi, ri = list(fops.to_ints(SPEC, q)), list(fops.to_ints(SPEC, r))
    # property test vs random evaluation points
    # (reference: src/polynomial.rs:405-529)
    for z in [3, 987654321, p - 5]:
        lhs = eval_host(SPEC, a, z)
        rhs = (eval_host(SPEC, qi, z) * eval_host(SPEC, b, z)
               + eval_host(SPEC, ri, z)) % p
        assert lhs == rhs
    assert len(ri) < deg_b + 1 or all(v == 0 for v in ri[deg_b:])


@pytest.mark.parametrize("lg_n,lg_n1", [(6, 3), (8, 3), (10, 5)])
def test_fft_four_step_vs_flat(lg_n, lg_n1):
    """The single-chip transpose factorization must match the flat FFT
    exactly, forward and inverse (it backs the large-n bench path)."""
    from plonky_tpu.poly.fft import fft_four_step, four_step_twiddles

    n = 1 << lg_n
    p = SPEC.p
    rng = np.random.default_rng(11)
    coeffs = [int.from_bytes(rng.bytes(40), "little") % p for _ in range(n)]
    pre = FftPrecomputation(SPEC, n)
    dev = fops.from_ints(SPEC, coeffs)

    tw = four_step_twiddles(SPEC, n, lg_n1)
    got = fops.to_ints(SPEC, jax.jit(
        lambda c, t: fft_four_step(SPEC, c, t, lg_n1))(dev, tw))
    ref = fops.to_ints(SPEC, jax.jit(lambda c: fft(pre, c))(dev))
    assert list(got) == list(ref)

    twi = four_step_twiddles(SPEC, n, lg_n1, inverse=True)
    vals = fops.from_ints(SPEC, [int(v) for v in ref])
    back = fops.to_ints(SPEC, jax.jit(
        lambda v, t: fft_four_step(SPEC, v, t, lg_n1, inverse=True))(
            vals, twi))
    assert list(back) == coeffs
